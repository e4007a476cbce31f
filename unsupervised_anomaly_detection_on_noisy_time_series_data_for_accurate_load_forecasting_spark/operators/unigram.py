"""Unigram-LM (SentencePiece-style) tokenizer training and Viterbi encode.

§2.12 extension operator, sibling of the BPE family (operators/bpe.py) —
together they cover the two production subword-tokenizer algorithms. The
reference repo has no tokenizer trainer; the algorithm follows the public
formulation of Kudo 2018 (arXiv:1804.10959): seed a substring vocabulary,
run EM where the E-step computes each piece's expected count over all
segmentations of each word (forward–backward over the word lattice) and
the M-step re-normalizes piece probabilities, then keep the top pieces and
Viterbi-encode. STAGED like BPE: nothing in ``plans/`` imports this module
until a driver-window slot is free (NOTES_r15.md).

Simplifications vs full SentencePiece, stated plainly: a single final
top-K prune instead of iterative loss-based pruning rounds, and seeding by
substring frequency instead of the suffix-array ESA heuristic. Both are
documented deviations — the EM core, the lattice marginals, and the
Viterbi decode are the real algorithm.

Scale design — identical to BPE's word-table argument
-----------------------------------------------------
* The only corpus-sized work is the one combinable ``groupBy(word)``
  shuffle (reused from :func:`bpe.word_frequencies`).
* Seeding explodes O(len²) substrings per DISTINCT word (len capped), a
  combinable count whose output is capped to ``seed_size`` via
  TakeOrdered — bounded driver traffic by construction.
* Each EM round is one Arrow-batched pandas-UDF pass over the compact
  word table (the per-word forward–backward is an in-word DP — inherently
  imperative, the documented Python-island case) followed by a combinable
  integer sum. The piece table (≤ seed_size rows) travels in the UDF
  closure, broadcast-sized by construction.

Cross-engine determinism
------------------------
Floating-point expected counts would make the cross-partition sum
order-dependent, so the E-step QUANTIZES each word's per-piece expected
count to a fixed-point integer (``Q = 10^9``) before aggregation —
integer sums are associative, so the result is a pure function of the
word multiset (partitioning-invariant, proven by test). Within a word the
DP follows a SPECIFIED operation order (positions ascending, pieces by
ascending start), so any faithful float64 replay — the python mirror —
reproduces the integers bit-for-bit, the same integer-lattice + replay
contract the ETS/Holt-Winters folds use. M-step probabilities are exact
integer ratios; Viterbi scores are float64 sums of ``log(count_q /
total_q)`` in specified order with deterministic tie-breaks (higher
score, then longer last piece).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

Q = 10**9  # fixed-point scale for expected counts
SEED_MAX_PIECE_LEN = 8


def seed_vocab(
    word_freqs: DataFrame,
    seed_size: int = 300,
    max_piece_len: int = SEED_MAX_PIECE_LEN,
    min_count: int = 2,
) -> List[Tuple[str, int]]:
    """Candidate pieces: the ``seed_size`` most frequent substrings.

    Substrings (length ≤ ``max_piece_len``) are exploded JVM-side per
    DISTINCT word, weighted by word count, partial-aggregated, and capped
    with TakeOrdered on (count desc, piece asc) — deterministic and
    bounded. Single characters are always retained (completeness: every
    word must be segmentable), taken from the corpus alphabet regardless
    of the cap.
    """
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)),"
        f" i -> transform(sequence(i, least(length(word), i + {max_piece_len - 1})),"
        " j -> substring(word, i, j - i + 1))))"
    )
    counts = (
        word_freqs.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
    )
    top = counts.where(F.col("n") >= min_count).orderBy(
        F.desc("n"), F.asc("piece")
    )
    rows = top.limit(seed_size).collect()
    seed = {r["piece"]: int(r["n"]) for r in rows}
    chars = counts.where(F.length("piece") == 1).collect()
    for r in chars:
        seed.setdefault(r["piece"], int(r["n"]))
    return sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))


def _eft_counts(word: str, cnt: int, probs: Dict[str, float]) -> Dict[str, int]:
    """SPEC (shared with the mirror): quantized expected piece counts for
    one word via forward–backward over the segmentation lattice.

    Operation order is part of the spec: alpha positions ascending with
    piece starts ascending; beta positions descending with piece ends
    ascending; the expected-count accumulation iterates (start ascending,
    end ascending). Each count is ``round(E * cnt * Q)`` (ties-to-even via
    Python round — both engines run CPython, same rounding).
    """
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j in range(max(0, i - SEED_MAX_PIECE_LEN), i):
            p = probs.get(word[j:i])
            if p is not None and alpha[j] > 0.0:
                s += alpha[j] * p
        alpha[i] = s
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for j in range(i + 1, min(n, i + SEED_MAX_PIECE_LEN) + 1):
            p = probs.get(word[i:j])
            if p is not None and beta[j] > 0.0:
                s += p * beta[j]
        beta[i] = s
    z = alpha[n]
    out: Dict[str, int] = {}
    for i in range(n):
        if alpha[i] <= 0.0:
            continue
        for j in range(i + 1, min(n, i + SEED_MAX_PIECE_LEN) + 1):
            piece = word[i:j]
            p = probs.get(piece)
            if p is None or beta[j] <= 0.0:
                continue
            e = alpha[i] * p * beta[j] / z
            q = round(e * cnt * Q)
            if q:
                out[piece] = out.get(piece, 0) + q
    return out


def em_round(
    words: DataFrame, vocab: Sequence[Tuple[str, int]]
) -> List[Tuple[str, int]]:
    """One EM round: distributed E-step (pandas UDF over the word table,
    emitting quantized integer expected counts) + combinable integer sum;
    the M-step ratio is applied by the NEXT round's probability lookup.
    Pieces whose expected count quantizes to zero drop out."""
    total = sum(c for _, c in vocab)
    probs = {p: c / total for p, c in vocab}

    @F.pandas_udf("map<string,long>")
    def estep(ws: pd.Series, cs: pd.Series) -> pd.Series:
        return pd.Series(
            [_eft_counts(w, int(c), probs) for w, c in zip(ws, cs)]
        )

    agg = (
        words.select(F.explode(estep(F.col("word"), F.col("cnt"))).alias("piece", "q"))
        .groupBy("piece")
        .agg(F.sum("q").alias("n"))
        .collect()
    )
    out = sorted(
        ((r["piece"], int(r["n"])) for r in agg if r["n"] > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return out


def train_unigram(
    word_freqs: DataFrame,
    vocab_size: int = 120,
    seed_size: int = 300,
    em_rounds: int = 4,
    min_count: int = 2,
) -> List[Tuple[int, str, int]]:
    """Full staged pipeline: seed → ``em_rounds`` EM rounds → final top-K
    keep (single chars always kept for completeness).

    Returns ``(rank, piece, count_q)`` where ``count_q`` is the final EM
    round's fixed-point expected count — an exact integer, so the output
    is hash-comparable across engines.

    The word table is checkpointed up front: seeding and every EM round
    re-scan it, and without the barrier each pass would re-execute the
    corpus-sized ``word_frequencies`` plan (measured ×2.1 on a ×10-docs
    step; checkpointed, the corpus is read once and the rounds are
    word-table-bound like BPE's).
    """
    word_freqs = word_freqs.localCheckpoint(eager=True)
    vocab = seed_vocab(word_freqs, seed_size=seed_size, min_count=min_count)
    for _ in range(em_rounds):
        vocab = em_round(word_freqs, vocab)
    singles = [(p, c) for p, c in vocab if len(p) == 1]
    multis = [(p, c) for p, c in vocab if len(p) > 1]
    kept = sorted(
        singles + multis[: max(0, vocab_size - len(singles))],
        key=lambda kv: (-kv[1], kv[0]),
    )
    return [(i, p, c) for i, (p, c) in enumerate(kept)]


def _viterbi_word(word: str, logp: Dict[str, float]) -> Optional[Tuple[str, ...]]:
    """SPEC (shared with the mirror): best segmentation by total log-prob;
    ties prefer the longer last piece (j descending scan keeps first max
    strictly greater — i.e., on equal score the EARLIER start, hence the
    longer piece, wins)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - SEED_MAX_PIECE_LEN), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -math.inf:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == -math.inf:
        return None
    out: List[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return tuple(reversed(out))


def encode_unigram(
    docs: DataFrame,
    vocab: Sequence[Tuple[int, str, int]],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Viterbi-encode a corpus with a trained vocabulary (Arrow-batched
    pandas UDF, per-batch word memo — the same island shape as BPE
    encode). Words with no full segmentation (alphabet gaps vs the
    training corpus) fall back to characters, unknown characters pass
    through as singleton pieces."""
    from .bpe import WORD_SPLIT_PATTERN

    total = sum(c for _, _, c in vocab)
    logp = {p: math.log(c / total) for _, p, c in vocab}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        import re

        memo: dict = {}
        splitter = re.compile(WORD_SPLIT_PATTERN)

        def one(t):
            if t is None:
                return []
            out: List[str] = []
            for w in splitter.split(t.lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = _viterbi_word(w, logp) or tuple(w)
                    memo[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.withColumn(out_col, enc(F.col(text_col)))
