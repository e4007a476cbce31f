"""STAGED registry queries for the distributed BPE tokenizer family.

DORMANT in r14: this module is deliberately NOT imported by
``plans/__init__.py`` yet, so the driver's registry and first-50 window do
not see these queries. The driver-window budget (NOTES_r15.md) reserves
r14–r15 slots for draining the lit_double taint backlog; when the backlog
clears (r16/r17), registration is the one-line, taint-exempt
``from . import queries_bpe`` in ``plans/__init__.py``.

Until then the queries are fully exercised by pytest (tests/test_bpe.py,
tests/test_bpe_query.py run the Spark plan AND the mirror oracle and
compare with the driver-gate comparator at sf0.001), so the code lands
green and the later registration is evidence-only, not new code.

Oracle model: python-mirror (the neural precedent, queries_neural.py:1-20)
— BPE training is iterative arg-max, not expressible in one DuckDB SQL, so
the oracle re-derives the expected output single-node from the parquet via
an independent Counter-based replay and emits a VALUES golden. Counts are
integers throughout; the one float column is a single IEEE division of two
exact BIGINTs on both engines, so no lit_double is needed (exact-operand
doctrine, NOTES_r14.md).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bpe
from ..sources.readers import load_table
from .registry import register

# Modest by design: the synthetic documents vocabulary is small, so the
# trainer's min_count stop usually fires before the cap — the cap exists to
# bound the round count. The registry query runs the BATCHED spec
# (operators/bpe.py train_bpe_batched): it is the production 32k-vocab
# path (rounds compress ~batch_size-fold; SCALING.md measured ×4 wall at
# ×10 vocab) and, like exact greedy, a pure function of the word multiset
# — exact mode stays pinned by the unit suite (tests/test_bpe.py).
NUM_MERGES = 32
BATCH_SIZE = 8
MIN_COUNT = 2

_MERGES_MEMO: Dict[str, List[Tuple[int, int, str, str, int]]] = {}


def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def ensure_merges(
    spark: SparkSession, sf_dir: str
) -> List[Tuple[int, int, str, str, int]]:
    """Train — or restore from the session memo / keyed artifact store —
    the merge table for sf_dir. Batched-spec merges:
    ``(rank, round, a, b, pair_count)``.

    Same doctrine as the neural weight checkpoints (ml/artifacts.py): the
    fit is deterministic in (input bytes, derivation source,
    hyperparameters), so the artifact key is exactly those three — a data
    or math change rotates the key and forces an honest retrain, and the
    independent mirror oracle (which always retrains) would catch a stale
    restore as a hash mismatch. A resident engine trains its tokenizer
    once, not per session.
    """
    got = _MERGES_MEMO.get(sf_dir)
    if got is None:
        from ..ml import artifacts as AR

        fp = AR.source_fingerprint(
            bpe.__name__,
            __name__,
            extra=f"merges={NUM_MERGES},batch={BATCH_SIZE},min={MIN_COUNT}",
        )
        key = AR.input_data_fingerprint(
            [os.path.join(sf_dir, "documents.parquet")], fp
        )
        path = os.path.join(AR.weights_cache_dir(), f"bpe-merges-{key}.json")
        if os.path.exists(path):
            got = [tuple(m) for m in bpe.load_merges(path)]
        else:
            wf = bpe.word_frequencies(load_table(spark, sf_dir, "documents"))
            got, _ = bpe.train_bpe_batched(
                wf,
                num_merges=NUM_MERGES,
                batch_size=BATCH_SIZE,
                min_count=MIN_COUNT,
            )
            bpe.save_merges(path, got, meta={"sf_dir": sf_dir, "spec": "batched"})
        _MERGES_MEMO[sf_dir] = got
    return got


# ---------------------------------------------------------------- mirror
def _mirror_word_freqs() -> Dict[str, int]:
    import duckdb
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        "SELECT text FROM read_parquet("
        f"'{_oracle_sf_dir()}/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    splitter = re.compile(bpe.WORD_SPLIT_PATTERN)
    c: Counter = Counter()
    for (t,) in texts:
        for w in splitter.split(t.lower()):
            if w:
                c[w] += 1
    return dict(c)


def _mirror_merge_pass(
    syms: Tuple[str, ...], picked: set
) -> Tuple[str, ...]:
    """One left-to-right non-chaining pass applying a disjoint pair set."""
    out: List[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) in picked:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _mirror_train(
    word_freqs: Dict[str, int], num_merges: int, batch_size: int, min_count: int
) -> Tuple[List[Tuple[int, int, str, str, int]], Dict[Tuple[str, ...], int]]:
    """Counter-based single-node replay of the batched BPE spec.

    Independent of the Spark path: dict/Counter candidate ranking per round
    vs the engine's explode + partial-agg + TakeOrdered. Shared spec only:
    every adjacent position counts; candidates order by (count desc, lex);
    greedy pairwise-symbol-disjoint filter takes up to ``batch_size`` from
    the top ``4 × batch_size``; one left-to-right non-chaining pass applies
    the picked set.
    """
    from collections import Counter

    vocab: Dict[Tuple[str, ...], int] = {
        tuple(w) + (bpe.END_OF_WORD,): c for w, c in word_freqs.items()
    }
    merges: List[Tuple[int, int, str, str, int]] = []
    rnd = 0
    while len(merges) < num_merges:
        want = min(batch_size, num_merges - len(merges))
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        cands = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * want]
        used: set = set()
        picked: set = set()
        for (a, b), n in cands:
            if len(picked) == want:
                break
            if n < min_count:
                break
            if a in used or b in used:
                continue
            picked.add((a, b))
            used.update((a, b))
            merges.append((len(merges), rnd, a, b, int(n)))
        if not picked:
            break
        nxt: Dict[Tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            k = _mirror_merge_pass(syms, picked)
            nxt[k] = nxt.get(k, 0) + cnt
        vocab = nxt
        rnd += 1
    return merges, vocab


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_merges_mirror_sql() -> str:
    merges, _ = _mirror_train(
        _mirror_word_freqs(), NUM_MERGES, BATCH_SIZE, MIN_COUNT
    )
    assert merges, "mirror learned no merges — corpus degenerate?"
    rows = ",".join(
        f"({r},{rnd},{_sql_str(a)},{_sql_str(b)},{n})"
        for r, rnd, a, b, n in merges
    )
    return (
        "SELECT CAST(rank AS INTEGER) AS rank,"
        " CAST(round AS INTEGER) AS round, a, b,"
        " CAST(pair_count AS BIGINT) AS pair_count"
        f" FROM (VALUES {rows}) AS m(rank, round, a, b, pair_count)"
    )


@register(
    "t_bpe_merges",
    oracle=lambda: _bpe_merges_mirror_sql(),
    tags=("X-text",),
    doc="Distributed BPE tokenizer training over the documents corpus, "
    "batched spec (the 32k-vocab scale path): one combinable corpus-sized "
    "shuffle compacts text into the Heaps-law word-frequency table, then "
    "each round merges the top batch pairwise-symbol-disjoint pairs via a "
    "skinny pair-count shuffle + bounded candidate collect + one JVM "
    "F.aggregate fold pass (operators/bpe.py). Deterministic "
    "count-then-lexicographic candidate order makes the merge sequence a "
    "pure function of the word multiset. Oracle = independent "
    "Counter-based single-node replay (VALUES golden).",
)
def t_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = ensure_merges(spark, sf_dir)
    return spark.createDataFrame(
        [list(m) for m in merges],
        schema="rank int, round int, a string, b string, pair_count bigint",
    )


def _bpe_compression_mirror_sql() -> str:
    """Per-source tokenizer-efficiency profile via rank-order merge replay.

    Encoding in the mirror applies the learned merges sequentially in rank
    order per distinct word (provably equivalent to the engine's greedy
    lowest-rank-first encoder, and implemented in the structurally opposite
    direction), then weights by per-source word occurrences.
    """
    import duckdb
    from collections import Counter

    wf = _mirror_word_freqs()
    merges, _ = _mirror_train(wf, NUM_MERGES, BATCH_SIZE, MIN_COUNT)

    tok_count: Dict[str, int] = {}
    for w in wf:
        syms: List[str] = list(w) + [bpe.END_OF_WORD]
        for _, _rnd, a, b, _n in merges:
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        tok_count[w] = len(syms)

    con = duckdb.connect()
    docs = con.execute(
        "SELECT source, text, n_chars FROM read_parquet("
        f"'{_oracle_sf_dir()}/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    splitter = re.compile(bpe.WORD_SPLIT_PATTERN)
    agg: Dict[str, List[int]] = {}
    for source, text, n_chars in docs:
        got = agg.setdefault(source, [0, 0, 0])
        got[0] += 1
        got[1] += sum(
            tok_count[w] for w in splitter.split(text.lower()) if w
        )
        got[2] += int(n_chars)
    rows = ",".join(
        f"({_sql_str(s)},{v[0]},{v[1]},{v[2]})" for s, v in sorted(agg.items())
    )
    return (
        "SELECT source, CAST(n_docs AS BIGINT) AS n_docs,"
        " CAST(total_tokens AS BIGINT) AS total_tokens,"
        " CAST(total_chars AS BIGINT) AS total_chars,"
        " CAST(total_tokens AS DOUBLE) / CAST(total_chars AS DOUBLE)"
        " AS tokens_per_char"
        f" FROM (VALUES {rows}) AS t(source, n_docs, total_tokens, total_chars)"
    )


@register(
    "t_bpe_compression",
    oracle=lambda: _bpe_compression_mirror_sql(),
    tags=("X-text",),
    doc="Tokenizer-efficiency profile: encode the corpus with the learned "
    "BPE merges (Arrow-batched greedy-by-rank pandas UDF with a per-batch "
    "word memo — Zipf makes repeats the common case) and report per-source "
    "document count, total token count, and tokens-per-char. The float "
    "column is one IEEE division of two exact BIGINTs on both engines. "
    "Oracle = rank-order merge replay (equivalent to greedy-by-rank), "
    "weighted by per-source word occurrences.",
)
def t_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = ensure_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    enc = bpe.encode_with_merges(docs, merges)
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("bpe_tokens")).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            (
                F.col("total_tokens").cast("double")
                / F.col("total_chars").cast("double")
            ).alias("tokens_per_char"),
        )
    )
