"""STAGED registry query for the unigram-LM tokenizer (operators/unigram.py).

DORMANT like plans/queries_bpe.py (same window-budget reasoning,
NOTES_r15.md): not imported by ``plans/__init__.py`` until a driver-window
slot is free; until then pytest runs the driver-gate comparison
(tests/test_unigram_query.py) and ``SPARK_GRAFT_STAGED=queries_unigram
tools/check.py`` checks it on demand.

Oracle model: python-mirror VALUES golden. The mirror re-derives word
frequencies from the parquet via DuckDB and replays seeding + the EM loop
with dict/Counter code, sharing only the two SPEC functions
(``_eft_counts``, the quantized per-word forward–backward, and the final
keep rule) — the neural-mirror precedent (queries_neural.py:1-20): shared
deterministic kernel, independent data path and aggregation. All compared
values are exact integers (fixed-point expected counts), so the driver
hash-compares with no float band.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe, unigram
from ..sources.readers import load_table
from .registry import register

VOCAB_SIZE = 160
SEED_SIZE = 400
EM_ROUNDS = 4
MIN_COUNT = 2

_VOCAB_MEMO: Dict[str, List[Tuple[int, str, int]]] = {}


def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def ensure_vocab(spark: SparkSession, sf_dir: str) -> List[Tuple[int, str, int]]:
    """Train — or restore from the session memo / keyed artifact store —
    the unigram vocabulary for sf_dir (same doctrine as the BPE merge
    artifact: key = input bytes + derivation source + hyperparameters)."""
    got = _VOCAB_MEMO.get(sf_dir)
    if got is None:
        import json

        from ..ml import artifacts as AR

        fp = AR.source_fingerprint(
            unigram.__name__,
            bpe.__name__,
            __name__,
            extra=f"vocab={VOCAB_SIZE},seed={SEED_SIZE},em={EM_ROUNDS},min={MIN_COUNT}",
        )
        key = AR.input_data_fingerprint(
            [os.path.join(sf_dir, "documents.parquet")], fp
        )
        path = os.path.join(AR.weights_cache_dir(), f"unigram-vocab-{key}.json")
        if os.path.exists(path):
            with open(path) as f:
                got = [tuple(v) for v in json.load(f)["vocab"]]
        else:
            wf = bpe.word_frequencies(load_table(spark, sf_dir, "documents"))
            got = unigram.train_unigram(
                wf,
                vocab_size=VOCAB_SIZE,
                seed_size=SEED_SIZE,
                em_rounds=EM_ROUNDS,
                min_count=MIN_COUNT,
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"vocab": [list(v) for v in got]}, f)
            os.replace(tmp, path)
        _VOCAB_MEMO[sf_dir] = got
    return got


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _unigram_mirror_sql() -> str:
    import duckdb
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        "SELECT text FROM read_parquet("
        f"'{_oracle_sf_dir()}/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    splitter = re.compile(bpe.WORD_SPLIT_PATTERN)
    wf: Counter = Counter()
    for (t,) in texts:
        for w in splitter.split(t.lower()):
            if w:
                wf[w] += 1

    # seed: substring counts, top SEED_SIZE by (count desc, piece), chars kept
    subs: Counter = Counter()
    for w, n in wf.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + unigram.SEED_MAX_PIECE_LEN) + 1):
                subs[w[i:j]] += n
    ordered = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))
    seed: Dict[str, int] = {}
    for p, n in ordered:
        if n >= MIN_COUNT and len(seed) < SEED_SIZE:
            seed[p] = n
    for p, n in subs.items():
        if len(p) == 1:
            seed.setdefault(p, n)
    vocab = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))

    for _ in range(EM_ROUNDS):
        total = sum(c for _, c in vocab)
        probs = {p: c / total for p, c in vocab}
        agg: Counter = Counter()
        for w, n in wf.items():
            for piece, q in unigram._eft_counts(w, n, probs).items():
                agg[piece] += q
        vocab = sorted(
            ((p, int(q)) for p, q in agg.items() if q > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )

    singles = [(p, c) for p, c in vocab if len(p) == 1]
    multis = [(p, c) for p, c in vocab if len(p) > 1]
    kept = sorted(
        singles + multis[: max(0, VOCAB_SIZE - len(singles))],
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert kept, "mirror produced an empty vocabulary"
    rows = ",".join(
        f"({i},{_sql_str(p)},{c})" for i, (p, c) in enumerate(kept)
    )
    return (
        "SELECT CAST(rank AS INTEGER) AS rank, piece,"
        " CAST(count_q AS BIGINT) AS count_q"
        f" FROM (VALUES {rows}) AS v(rank, piece, count_q)"
    )


@register(
    "t_unigram_vocab",
    oracle=lambda: _unigram_mirror_sql(),
    tags=("X-text",),
    doc="Unigram-LM (SentencePiece-style) tokenizer training over the "
    "documents corpus: substring seeding via JVM explode + combinable "
    "count + TakeOrdered cap, then EM rounds whose E-step runs the "
    "forward-backward lattice as an Arrow-batched pandas UDF over the "
    "Heaps-law word table with FIXED-POINT quantized expected counts — "
    "integer sums make the result partitioning-invariant and "
    "hash-comparable. Oracle = independent Counter-replay of the same "
    "spec (VALUES golden).",
)
def t_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = ensure_vocab(spark, sf_dir)
    return spark.createDataFrame(
        [list(v) for v in vocab], schema="rank int, piece string, count_q bigint"
    )
