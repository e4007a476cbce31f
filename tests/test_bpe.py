"""BPE trainer/encoder vs a from-scratch pure-Python reference.

The reference implementation below is written directly from the canonical
Sennrich et al. 2016 formulation (arXiv:1508.07909): count every adjacent
symbol-pair position weighted by word frequency, merge the arg-max pair
(ties → lexicographically smallest) left-to-right non-overlapping, repeat.
It shares no code with operators/bpe.py, so agreement is two independent
derivations meeting — the same oracle standard the registry queries use.
"""

from __future__ import annotations

from collections import Counter

import pytest

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators import (
    bpe,
)

CORPUS = [
    "the lowest lower low low low",
    "newer newest new new news",
    "the the the widest wide wider",
    "low lower newest nest nests rest rests",
    "it's the widest nest you've seen",
    "",  # empty doc must be a no-op
    "aaaa aaa aa a",  # overlap recounting + left-to-right non-overlap merges
]


# ---------------------------------------------------------------- reference
def ref_word_freqs(corpus):
    import re

    c: Counter = Counter()
    for doc in corpus:
        for w in re.split("[^a-z0-9']+", doc.lower()):
            if w:
                c[w] += 1
    return dict(c)


def ref_pair_counts(vocab):
    pairs: Counter = Counter()
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += cnt
    return pairs


def ref_merge(syms, a, b):
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_train(word_freqs, num_merges, min_count=2):
    vocab = {
        tuple(w) + (bpe.END_OF_WORD,): c for w, c in word_freqs.items()
    }
    merges = []
    for rank in range(num_merges):
        pairs = ref_pair_counts(vocab)
        if not pairs:
            break
        # max count, tie-break lexicographically smallest pair
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        vocab = {ref_merge(s, a, b): c for s, c in vocab.items()}
    return merges, vocab


# ------------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], schema="text string")


@pytest.fixture(scope="module")
def trained(spark, corpus_df):
    wf = bpe.word_frequencies(corpus_df)
    merges, words = bpe.train_bpe(wf, num_merges=25, checkpoint_every=4)
    return wf, merges, words


def test_word_frequencies_match_reference(corpus_df):
    got = {
        r["word"]: r["cnt"]
        for r in bpe.word_frequencies(corpus_df).collect()
    }
    assert got == ref_word_freqs(CORPUS)


def test_merge_sequence_matches_reference(trained):
    _, merges, _ = trained
    ref_merges, _ = ref_train(ref_word_freqs(CORPUS), 25)
    assert merges == ref_merges
    assert len(merges) > 5  # the corpus is rich enough to be a real check


def test_final_segmentation_matches_reference(trained):
    _, _, words = trained
    ref_merges, ref_vocab = ref_train(ref_word_freqs(CORPUS), 25)
    got = {tuple(r["syms"]): r["cnt"] for r in words.collect()}
    assert got == {s: c for s, c in ref_vocab.items()}


def test_partitioning_invariance(spark, corpus_df, trained):
    """Merge sequence is a function of the word multiset, not layout."""
    _, merges, _ = trained
    wf7 = bpe.word_frequencies(corpus_df.repartition(7))
    merges7, _ = bpe.train_bpe(wf7, num_merges=25, checkpoint_every=4)
    assert merges7 == merges


def test_checkpoint_cadence_invariance(trained):
    """localCheckpoint is a lineage barrier only — never a semantic one."""
    wf, merges, _ = trained
    merges1, _ = bpe.train_bpe(wf, num_merges=25, checkpoint_every=1)
    merges100, _ = bpe.train_bpe(wf, num_merges=25, checkpoint_every=100)
    assert merges1 == merges == merges100


def test_min_count_stops_early(trained):
    wf, _, _ = trained
    merges, _ = bpe.train_bpe(wf, num_merges=10_000, min_count=3)
    assert merges  # something merges at count >= 3
    assert all(n >= 3 for _, _, _, n in merges)
    # and the stop is genuine: the unrestricted run goes further
    more, _ = bpe.train_bpe(wf, num_merges=10_000, min_count=2)
    assert len(more) >= len(merges)


def test_encode_reproduces_training_segmentation(spark, trained):
    """Greedy-by-rank encode == training segmentation for training words.

    This is the classic BPE invariant: applying the learned merges in rank
    order to any training word reproduces exactly the symbols the trainer
    left it with.
    """
    wf, merges, words = trained
    train_words = spark.createDataFrame(
        [(r["word"],) for r in wf.collect()], schema="text string"
    )
    enc = {
        r["text"]: tuple(r["bpe_tokens"])
        for r in bpe.encode_with_merges(train_words, merges).collect()
    }
    _, ref_vocab = ref_train(ref_word_freqs(CORPUS), 25)
    # rebuild word -> final syms from the reference vocab
    for syms, _ in ref_vocab.items():
        word = "".join(syms).replace(bpe.END_OF_WORD, "")
        assert enc[word] == syms


def test_encode_handles_unseen_and_null(spark, trained):
    _, merges, _ = trained
    df = spark.createDataFrame(
        [("qzx low",), (None,), ("",)], schema="text string"
    )
    rows = {
        (r["text"] if r["text"] is not None else "<null>"): r["bpe_tokens"]
        for r in bpe.encode_with_merges(df, merges).collect()
    }
    assert rows["<null>"] == []
    assert rows[""] == []
    toks = rows["qzx low"]
    # unseen word falls back to (possibly partially merged) char symbols,
    # and reconstructing the text from tokens is lossless
    joined = "".join(toks).replace(bpe.END_OF_WORD, " ").strip()
    assert joined == "qzx low"


def test_vocabulary_contents(spark, trained):
    wf, merges, _ = trained
    vocab = {
        (r["token"], r["kind"]) for r in bpe.vocabulary(merges, wf).collect()
    }
    chars = {c for w in ref_word_freqs(CORPUS) for c in w}
    assert {(c, "char") for c in chars} <= vocab
    assert {(a + b, "merge") for _, a, b, _ in merges} <= vocab
    assert (bpe.END_OF_WORD, "marker") in vocab


def test_overlap_semantics_on_runs(spark):
    """'aaaa aaa' pins both halves of the canonical overlap rule:
    counting recounts overlaps; merging is left-to-right non-overlapping."""
    df = spark.createDataFrame([("aaaa aaa",)], schema="text string")
    wf = bpe.word_frequencies(df)
    merges, words = bpe.train_bpe(wf, num_merges=1, min_count=1)
    assert merges[0][1:3] == ("a", "a")
    # aaaa -> [aa, aa, </w>]; aaa -> [aa, a, </w>]
    got = {tuple(r["syms"]) for r in words.collect()}
    assert got == {
        ("aa", "aa", bpe.END_OF_WORD),
        ("aa", "a", bpe.END_OF_WORD),
    }


# ------------------------------------------------------- plan + property
def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pair_count_plan_is_partial_aggregated_and_python_free(spark, corpus_df):
    """The per-round pair count must map-side combine (partial_sum before
    the exchange) and keep the training hot path JVM-only — no
    ArrowEvalPython / BatchEvalPython anywhere in the loop's plans."""
    import re

    wf = bpe.word_frequencies(corpus_df)
    words = wf.select(bpe._init_symbols().alias("syms"), "cnt")
    plan = _plan(bpe._pair_counts(words))
    assert re.search(r"HashAggregate.*partial_sum", plan), plan[:800]
    assert "EvalPython" not in plan
    # and the merge fold is likewise pure JVM expression work
    fold_plan = _plan(words.withColumn("syms", bpe._merge_fold("a", "b")))
    assert "EvalPython" not in fold_plan


def test_encode_plan_is_single_arrow_stage(spark, corpus_df, trained):
    """Encoding adds exactly one Arrow-batched Python stage and no shuffle:
    a map-only pass over the corpus."""
    _, merges, _ = trained
    plan = _plan(bpe.encode_with_merges(corpus_df, merges))
    assert plan.count("ArrowEvalPython") == 1, plan[:800]
    assert "Exchange" not in plan


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _sym = st.sampled_from(["a", "b", "ab", "c", bpe.END_OF_WORD])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_sym, min_size=1, max_size=12), st.sampled_from([("a", "b"), ("a", "a"), ("ab", "c")]))
    def test_merge_fold_matches_python_fold(spark_holder, syms, pair):
        """JVM F.aggregate fold == reference left-to-right merge on random
        symbol arrays (overlap runs, merged-symbol collisions included)."""
        spark = spark_holder
        df = spark.createDataFrame([(syms,)], schema="syms array<string>")
        got = df.select(bpe._merge_fold(*pair).alias("m")).collect()[0]["m"]
        assert tuple(got) == ref_merge(syms, *pair)

    @pytest.fixture(scope="module")
    def spark_holder(spark):
        return spark

except ImportError:  # pragma: no cover - hypothesis is baked into the env
    pass


# ------------------------------------------------------- batched scale mode
def ref_merge_multi(syms, pair_map):
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) in pair_map:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_train_batched(word_freqs, num_merges, batch_size, min_count=2):
    """Reference for the batched spec: top 4*batch candidates per round by
    (count desc, lex), greedy pairwise-symbol-disjoint filter, one
    left-to-right non-chaining pass applying the picked set."""
    vocab = {tuple(w) + (bpe.END_OF_WORD,): c for w, c in word_freqs.items()}
    merges = []
    rnd = 0
    while len(merges) < num_merges:
        want = min(batch_size, num_merges - len(merges))
        pairs = ref_pair_counts(vocab)
        cands = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * want]
        used, picked = set(), []
        for (a, b), n in cands:
            if len(picked) == want:
                break
            if n < min_count:
                break
            if a in used or b in used:
                continue
            picked.append((a, b))
            used |= {a, b}
            merges.append((len(merges), rnd, a, b, n))
        if not picked:
            break
        pm = set(picked)
        nxt = {}
        for syms, cnt in vocab.items():
            k = ref_merge_multi(syms, pm)
            nxt[k] = nxt.get(k, 0) + cnt
        vocab = nxt
        rnd += 1
    return merges, vocab


def test_batched_batch1_reproduces_exact_greedy(trained):
    wf, exact, _ = trained
    batched, _ = bpe.train_bpe_batched(wf, num_merges=25, batch_size=1)
    assert [(r, a, b, n) for r, _rnd, a, b, n in batched] == exact
    # and every round merges exactly one pair
    assert [rnd for _, rnd, *_ in batched] == list(range(len(batched)))


def test_batched_matches_reference_spec(trained):
    wf, _, _ = trained
    got, words = bpe.train_bpe_batched(wf, num_merges=25, batch_size=4)
    ref, ref_vocab = ref_train_batched(ref_word_freqs(CORPUS), 25, 4)
    assert got == ref
    got_vocab = {tuple(r["syms"]): r["cnt"] for r in words.collect()}
    assert got_vocab == ref_vocab


def test_batched_rounds_compress_and_stay_disjoint(trained):
    wf, _, _ = trained
    merges, _ = bpe.train_bpe_batched(wf, num_merges=24, batch_size=8)
    assert len(merges) > 8
    n_rounds = max(rnd for _, rnd, *_ in merges) + 1
    assert n_rounds < len(merges) / 2  # real compression vs one-per-round
    by_round = {}
    for _, rnd, a, b, _n in merges:
        by_round.setdefault(rnd, []).append((a, b))
    for rnd, pairs in by_round.items():
        # cross-pair disjointness (a self-pair like (a, a) is one pair and
        # legitimately repeats its own symbol)
        for i, p in enumerate(pairs):
            for q in pairs[i + 1 :]:
                assert not (set(p) & set(q)), f"round {rnd}: {p} overlaps {q}"


def test_batched_partitioning_invariance(spark, corpus_df, trained):
    wf, _, _ = trained
    base, _ = bpe.train_bpe_batched(wf, num_merges=20, batch_size=4)
    wf7 = bpe.word_frequencies(corpus_df.repartition(7))
    again, _ = bpe.train_bpe_batched(wf7, num_merges=20, batch_size=4)
    assert base == again


# ----------------------------------------------------------- artifact store
def test_merge_artifact_roundtrip(tmp_path, spark, trained):
    _, merges, _ = trained
    p = str(tmp_path / "tok" / "merges.json")
    bpe.save_merges(p, merges, meta={"corpus": "unit"})
    assert bpe.load_merges(p) == merges
    # a restored table drives encode identically to the in-memory one
    df = spark.createDataFrame([("the lowest nests",)], schema="text string")
    a = bpe.encode_with_merges(df, merges).collect()[0]["bpe_tokens"]
    b = bpe.encode_with_merges(df, bpe.load_merges(p)).collect()[0]["bpe_tokens"]
    assert a == b


def test_merge_artifact_rejects_foreign_format(tmp_path):
    import json

    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError):
        bpe.load_merges(p)
