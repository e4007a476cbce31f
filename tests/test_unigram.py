"""Unigram-LM tokenizer trainer vs from-scratch replays of its spec.

The spec (operators/unigram.py docstrings) fixes operation order and
fixed-point quantization precisely so that independent faithful replays
meet bit-for-bit; the replays here re-derive seeding and the EM loop with
plain dict/Counter code.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators import (
    bpe,
    unigram,
)

CORPUS = [
    "the lowest lower low low low",
    "newer newest new new news",
    "the the the widest wide wider",
    "low lower newest nest nests rest rests",
    "it's the widest nest you've seen",
    "",
    "aaaa aaa aa a",
]


def ref_word_freqs():
    import re

    c: Counter = Counter()
    for doc in CORPUS:
        for w in re.split("[^a-z0-9']+", doc.lower()):
            if w:
                c[w] += 1
    return dict(c)


def ref_seed(word_freqs, seed_size=300, max_len=8, min_count=2):
    c: Counter = Counter()
    for w, n in word_freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                c[w[i:j]] += n
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    seed = {}
    for p, n in ordered:
        if n >= min_count and len(seed) < seed_size:
            seed[p] = n
    for p, n in c.items():
        if len(p) == 1:
            seed.setdefault(p, n)
    return sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))


def ref_em_round(word_freqs, vocab):
    total = sum(c for _, c in vocab)
    probs = {p: c / total for p, c in vocab}
    agg: Counter = Counter()
    for w, n in word_freqs.items():
        for piece, q in unigram._eft_counts(w, n, probs).items():
            agg[piece] += q
    return sorted(
        ((p, int(q)) for p, q in agg.items() if q > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], schema="text string")


@pytest.fixture(scope="module")
def wf(corpus_df):
    return bpe.word_frequencies(corpus_df)


def test_seed_vocab_matches_reference(wf):
    got = unigram.seed_vocab(wf, seed_size=300)
    assert got == ref_seed(ref_word_freqs(), seed_size=300)
    assert len(got) > 30
    chars = {c for w in ref_word_freqs() for c in w}
    assert chars <= {p for p, _ in got}  # single chars always present


def test_em_round_matches_reference(wf):
    seed = unigram.seed_vocab(wf, seed_size=120)
    got = unigram.em_round(wf, seed)
    assert got == ref_em_round(ref_word_freqs(), seed)
    assert len(got) > 10


def test_train_partitioning_invariance(spark, corpus_df, wf):
    base = unigram.train_unigram(wf, vocab_size=60, seed_size=120, em_rounds=2)
    wf7 = bpe.word_frequencies(corpus_df.repartition(7))
    again = unigram.train_unigram(wf7, vocab_size=60, seed_size=120, em_rounds=2)
    assert base == again
    assert len(base) > 20


def test_train_matches_full_reference_loop(wf):
    got = unigram.train_unigram(wf, vocab_size=60, seed_size=120, em_rounds=3)
    vocab = ref_seed(ref_word_freqs(), seed_size=120)
    for _ in range(3):
        vocab = ref_em_round(ref_word_freqs(), vocab)
    singles = [(p, c) for p, c in vocab if len(p) == 1]
    multis = [(p, c) for p, c in vocab if len(p) > 1]
    kept = sorted(
        singles + multis[: max(0, 60 - len(singles))],
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == [(i, p, c) for i, (p, c) in enumerate(kept)]


def test_viterbi_prefers_high_prob_and_breaks_ties_longer_last():
    logp = {p: math.log(v) for p, v in {"ab": 0.4, "a": 0.2, "b": 0.2, "c": 0.2}.items()}
    assert unigram._viterbi_word("abc", logp) == ("ab", "c")
    # tie: 'ab'+'ab' vs 'ab'+'a'+'b'? second is strictly worse; force a real
    # tie between ('a','b') and ('ab',) by giving ab exactly p(a)*p(b)
    logp2 = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.0625)}
    assert unigram._viterbi_word("ab", logp2) == ("ab",)  # longer last piece wins the tie


def test_encode_segments_and_falls_back(spark, wf):
    vocab = unigram.train_unigram(wf, vocab_size=60, seed_size=120, em_rounds=2)
    df = spark.createDataFrame(
        [("the lowest qzx",), (None,), ("",)], schema="text string"
    )
    rows = {
        (r["text"] if r["text"] is not None else "<null>"): r["unigram_tokens"]
        for r in unigram.encode_unigram(df, vocab).collect()
    }
    assert rows["<null>"] == []
    assert rows[""] == []
    toks = rows["the lowest qzx"]
    assert "".join(toks) == "thelowestqzx"  # lossless concatenation
    pieces = {p for _, p, _ in vocab}
    # known words segment into vocab pieces; unknown chars pass through
    assert all(t in pieces or set(t) <= set("qzx") for t in toks)


def test_every_training_word_is_segmentable(spark, wf):
    vocab = unigram.train_unigram(wf, vocab_size=60, seed_size=120, em_rounds=2)
    total = sum(c for _, _, c in vocab)
    logp = {p: math.log(c / total) for _, p, c in vocab}
    for w in ref_word_freqs():
        assert unigram._viterbi_word(w, logp) is not None, w
