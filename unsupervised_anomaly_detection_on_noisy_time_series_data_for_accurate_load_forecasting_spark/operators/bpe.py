"""Distributed byte-pair-encoding (BPE) tokenizer training and encoding.

§2.12 extension operator for the LLM-data-pipeline surface (SURVEY.md §2.12
"X-text" family; the reference repo has no tokenizer trainer — this row is
extension depth, not reference parity). STAGED in r14 with pytest-only
coverage; the registry query + oracle land in r16 when the driver-window
taint backlog has drained (NOTES_r15.md budget math). Nothing in ``plans/``
imports this module yet, so editing it taints no registered query.

Scale design — the 100 TB story
-------------------------------
* The only corpus-sized work is ONE combinable shuffle:
  ``groupBy(word).sum(count)`` compacts the corpus into a word-frequency
  table bounded by Heaps' law (~10^7 distinct words at web scale),
  independent of corpus row count. Everything after operates on that
  compact table.
* Each merge round shuffles only the word-frequency table: explode the
  adjacent symbol pairs weighted by word count → partial-aggregated pair
  counts (map-side combine) → ``orderBy(...).limit(1)`` (TakeOrdered) for
  the arg-max pair — a bounded 1-row collect per round, the same bounded-
  collect doctrine as the year-range collect (queries_relational2.py:213).
* The merge application is a JVM-side ``F.aggregate`` left fold over the
  symbol array — no Python in the per-word hot path. Python touches one
  row per round (the arg-max) and the final merge-table assembly.
* Iterative lineage is cut with ``localCheckpoint`` every
  ``checkpoint_every`` rounds: staged-HOF chains grown under a loop hit the
  Catalyst generator re-expansion pathology (see t_winnowing_fp /
  d_cdc_chunks comments), and the barrier keeps each round's plan flat.

Determinism
-----------
Tie-breaking is max count, then lexicographically smallest ``(a, b)`` —
the merge sequence is a pure function of the word multiset (partitioning-
and arrival-order-independent), which is what lets a pure-Python oracle
replay it exactly (tests/test_bpe.py keeps a from-scratch reference
implementation).

Semantics follow the canonical Sennrich et al. 2016 formulation
(arXiv:1508.07909, the public ``learn_bpe``): words split into character
symbols plus a ``</w>`` end-of-word marker; pair counts include every
adjacent position (overlaps recount); a merge applies left-to-right
non-overlapping within each word.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"

# Default word pattern: lowercase alnum runs with inner apostrophes kept,
# matching the t_token_stats tokenizer family so corpora profile the same way.
WORD_SPLIT_PATTERN = "[^a-z0-9']+"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Compact a corpus into its word-frequency table.

    This is the single corpus-sized shuffle of BPE training: a combinable
    ``groupBy(word)`` count. Output schema: ``word string, cnt bigint``.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_PATTERN),
        lambda w: w != F.lit(""),
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _init_symbols() -> Column:
    """Split ``word`` into character symbols with the </w> marker appended."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized word table.

    Every adjacent position counts (overlaps recount), per the canonical
    formulation. The aggregate is sum-combinable, so Spark's partial
    aggregation keeps the shuffle skinny: one row per distinct pair.
    """
    # zip_with over two length-(n-1) slices rather than transform(sequence...):
    # sequence(1, 0) auto-reverses to [1, 0] in Spark, so the sequence form
    # throws INVALID_ARRAY_INDEX on fully-merged singleton words like 'a</w>'.
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1),"
        " (x, y) -> named_struct('a', x, 'b', y))"
    )
    return (
        words.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_fold(a: str, b: str) -> Column:
    """JVM-side left fold replacing adjacent (a, b) with a+b in ``syms``.

    Left-to-right non-overlapping: after a merge fires, the accumulator's
    pending symbol resets, so "aaa" under merge (a,a) becomes ["aa","a"],
    matching the reference merge semantics. Accumulator is
    struct(out array, prev string, has_prev boolean); ``prev`` buffers the
    previous symbol so a match can consume it.
    """
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        fire = acc.has_prev & (acc.prev == F.lit(a)) & (s == F.lit(b))
        return F.when(
            fire,
            F.struct(
                F.concat(acc.out, F.array(merged)).alias("out"),
                F.lit("").alias("prev"),
                F.lit(False).alias("has_prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc.has_prev, F.concat(acc.out, F.array(acc.prev)))
                .otherwise(acc.out)
                .alias("out"),
                s.alias("prev"),
                F.lit(True).alias("has_prev"),
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc.has_prev, F.concat(acc.out, F.array(acc.prev))
        ).otherwise(acc.out)

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("prev"),
        F.lit(False).alias("has_prev"),
    )
    return F.aggregate(F.col("syms"), zero, step, finish)


def train_bpe(
    word_freqs: DataFrame,
    num_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 1,
) -> Tuple[List[Tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merge rules from a word-frequency table.

    Returns ``(merges, final_words)`` where ``merges`` is a list of
    ``(rank, a, b, count)`` in learned order and ``final_words`` is the
    word table with its post-merge symbol arrays (useful for vocab export
    and for the encode-equals-training invariant).

    Stops early when the best pair's count drops below ``min_count`` (a
    merge seen once generalizes to nothing and would make the sequence
    sensitive to corpus noise).

    ``checkpoint_every`` defaults to 1 (a barrier after every merge): the
    alternative — letting fold expressions stack between barriers — makes
    Catalyst re-analyze an ever-deeper nested-aggregate plan each round,
    which measured ~2× slower at cadence 8 than cadence 1 on sf0.1
    (11.5 s → 6.2 s for 32 merges). The word table is Heaps-law small at
    any corpus scale, so the per-round materialization is cheap
    everywhere. The cadence is semantics-free either way
    (tests/test_bpe.py::test_checkpoint_cadence_invariance).
    """
    words = word_freqs.select(_init_symbols().alias("syms"), "cnt")
    words = words.localCheckpoint(eager=False)
    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((rank, a, b, n))
        words = words.withColumn("syms", _merge_fold(a, b))
        if (rank + 1) % max(1, checkpoint_every) == 0:
            words = words.localCheckpoint(eager=True)
    return merges, words


_SEP = "\x00"  # never occurs in symbols: words are regex-token chars, plus </w>


def _merge_fold_multi(pairs: Sequence[Tuple[str, str]]) -> Column:
    """JVM left fold applying a SET of pairwise symbol-disjoint merges.

    Same accumulator as ``_merge_fold``; the pair lookup is a broadcast-free
    map literal keyed on ``prev + \\x00 + s`` probed with ``try_element_at``
    (NULL on miss — ``element_at`` would throw under ANSI). Disjointness
    guarantees at most one pair matches any position, so the leftmost-greedy
    result is independent of the order pairs were picked in.
    """
    entries: List[Column] = []
    for a, b in pairs:
        entries.append(F.lit(a + _SEP + b))
        entries.append(F.lit(a + b))
    m = F.create_map(*entries)

    def step(acc: Column, s: Column) -> Column:
        merged = F.try_element_at(m, F.concat(acc.prev, F.lit(_SEP), s))
        fire = acc.has_prev & merged.isNotNull()
        return F.when(
            fire,
            F.struct(
                F.concat(acc.out, F.array(merged)).alias("out"),
                F.lit("").alias("prev"),
                F.lit(False).alias("has_prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc.has_prev, F.concat(acc.out, F.array(acc.prev)))
                .otherwise(acc.out)
                .alias("out"),
                s.alias("prev"),
                F.lit(True).alias("has_prev"),
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc.has_prev, F.concat(acc.out, F.array(acc.prev))
        ).otherwise(acc.out)

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("prev"),
        F.lit(False).alias("has_prev"),
    )
    return F.aggregate(F.col("syms"), zero, step, finish)


def train_bpe_batched(
    word_freqs: DataFrame,
    num_merges: int,
    batch_size: int = 8,
    min_count: int = 2,
) -> Tuple[List[Tuple[int, int, str, str, int]], DataFrame]:
    """Batched-merge BPE training — the 32k-vocab scale path.

    Exact greedy BPE is one merge per round; a production vocabulary
    (32k–100k merges) cannot afford 32k shuffle rounds. The standard
    batched variant merges the top ``batch_size`` PAIRWISE SYMBOL-DISJOINT
    pairs of each round's count snapshot in one fold pass, cutting rounds
    by ~batch_size while keeping the result a pure function of the word
    multiset: the candidate order is (count desc, then lexicographic), the
    disjoint filter is a deterministic greedy walk of that order, and
    disjointness makes the one-pass fold order-independent. Deviation from
    exact greedy is the usual one — pairs ranked within a batch don't see
    the counts the earlier merges of that batch would have changed — and
    ``batch_size=1`` reproduces exact ``train_bpe`` merge-for-merge
    (tested). Merged outputs never chain within a pass (the accumulator
    resets after a fire), so a pass touches only pre-pass adjacencies.

    Per round: one skinny pair-count shuffle + a bounded collect of
    ``4 × batch_size`` candidate rows (enough to survive the disjoint
    filter's rejections; if fewer survive, the round merges fewer — the
    cap bounds driver traffic, not correctness).

    Returns ``(merges, final_words)`` with ``merges`` as
    ``(rank, round, a, b, count)``.
    """
    words = word_freqs.select(_init_symbols().alias("syms"), "cnt")
    words = words.localCheckpoint(eager=False)
    merges: List[Tuple[int, int, str, str, int]] = []
    rnd = 0
    while len(merges) < num_merges:
        want = min(batch_size, num_merges - len(merges))
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(4 * want)
            .collect()
        )
        used: set = set()
        picked: List[Tuple[str, str]] = []
        for r in top:
            if len(picked) == want:
                break
            if r["n"] < min_count:
                break
            if r["a"] in used or r["b"] in used:
                continue
            picked.append((r["a"], r["b"]))
            used.add(r["a"])
            used.add(r["b"])
            merges.append((len(merges), rnd, r["a"], r["b"], int(r["n"])))
        if not picked:
            break
        words = words.withColumn("syms", _merge_fold_multi(picked))
        words = words.localCheckpoint(eager=True)
        rnd += 1
    return merges, words


def merges_to_df(spark: SparkSession, merges: Sequence[Tuple[int, str, str, int]]) -> DataFrame:
    """Materialize a learned merge table as ``rank, a, b, pair_count``."""
    return spark.createDataFrame(
        list(merges), schema="rank int, a string, b string, pair_count bigint"
    )


def _normalize_merges(
    merges: Sequence[Tuple],
) -> List[Tuple[int, str, str, int]]:
    """Accept exact-mode ``(rank, a, b, n)`` or batched-mode
    ``(rank, round, a, b, n)`` tuples and return the exact shape."""
    out: List[Tuple[int, str, str, int]] = []
    for m in merges:
        if len(m) == 5:
            rank, _rnd, a, b, n = m
        else:
            rank, a, b, n = m
        out.append((int(rank), a, b, int(n)))
    return out


def save_merges(
    path: str, merges: Sequence[Tuple[int, str, str, int]], meta: Optional[dict] = None
) -> None:
    """Persist a learned merge table as a portable JSON artifact.

    Same doctrine as the S9 model store (ml/artifacts.py): driver-side file,
    no pickle, written to a unique tmp name then atomically renamed so
    concurrent writers of the same path never interleave.
    """
    import json
    import os
    import uuid

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "format": "bpe-merges-v1",
                "end_of_word": END_OF_WORD,
                "word_split_pattern": WORD_SPLIT_PATTERN,
                "merges": [list(m) for m in merges],
                "meta": meta or {},
            },
            f,
            sort_keys=True,
        )
    os.replace(tmp, path)


def load_merges(path: str) -> List[Tuple]:
    """Load a merge artifact, preserving the stored tuple shape:
    exact-mode ``(rank, a, b, n)`` or batched ``(rank, round, a, b, n)``."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a bpe-merges-v1 artifact: {path}")
    out: List[Tuple] = []
    for m in doc["merges"]:
        if len(m) == 5:
            r, rnd, a, b, n = m
            out.append((int(r), int(rnd), a, b, int(n)))
        else:
            r, a, b, n = m
            out.append((int(r), a, b, int(n)))
    return out


def _encode_word(word: str, ranks: dict) -> Tuple[str, ...]:
    """Greedy lowest-rank-first BPE encode of one word (reference encode).

    Equivalent to applying the merge rules in rank order; for any word in
    the training corpus this reproduces its final training segmentation.
    """
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank: Optional[int] = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
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
    return tuple(syms)


def encode_with_merges(
    docs: DataFrame,
    merges: Sequence[Tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a corpus with a learned merge table.

    Encoding is per-word greedy-by-rank — inherently an iterative in-word
    loop, so this is the one Python stage, done as an Arrow-batched pandas
    UDF with the rank table shipped once per task in the closure (a merge
    table is ≤ vocab-size rows — broadcast-sized by construction). A
    per-word memo keeps the loop amortized O(1) for repeated words within
    a batch (Zipf makes repeats the common case).
    """
    ranks = {(a, b): rank for rank, a, b, _ in _normalize_merges(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        import re

        memo: dict = {}
        splitter = re.compile(WORD_SPLIT_PATTERN)

        def encode_text(t):
            if t is None:
                return []
            out: List[str] = []
            for w in splitter.split(t.lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                out.extend(got)
            return out

        return texts.map(encode_text)

    return docs.withColumn(out_col, _encode(F.col(text_col)))


def vocabulary(
    merges: Sequence[Tuple[int, str, str, int]], word_freqs: DataFrame
) -> DataFrame:
    """The learned vocabulary: base character symbols ∪ merge outputs.

    Base symbols come from a corpus-wide distinct over exploded characters
    (combinable, tiny result); merge outputs are the ``a+b`` strings.
    Output schema: ``token string, kind string('char'|'merge'|'marker')``.
    """
    spark = word_freqs.sparkSession
    chars = (
        word_freqs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("token")
        )
        .distinct()
        .withColumn("kind", F.lit("char"))
    )
    merged = spark.createDataFrame(
        [(a + b, "merge") for _, a, b, _ in _normalize_merges(merges)],
        schema="token string, kind string",
    )
    marker = spark.createDataFrame(
        [(END_OF_WORD, "marker")], schema="token string, kind string"
    )
    return chars.unionByName(merged).unionByName(marker)
