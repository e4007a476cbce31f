"""LLM corpus-prep operators: packing invariants, stratified quota
exactness, TF-IDF top-k shape (oracle parity is covered by the registry
gate; these pin the operator contracts directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
    pack_documents,
    stratified_sample,
    tfidf_top_terms,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


def test_packing_respects_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_documents(docs, budget=256, n_shards=8)
    bins = (
        packed.groupBy("shard", "bin_id")
        .agg(F.sum("n_tok").alias("fill"), F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    assert bins
    for r in bins:
        # a bin only exceeds the budget when a single oversized doc owns it
        assert r.fill <= 256 or r.n_docs == 1, (r.shard, r.bin_id, r.fill, r.n_docs)


def test_packing_covers_every_doc_once(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_documents(docs, budget=256, n_shards=8)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_packing_bins_are_contiguous_in_doc_order(spark, sf_dir):
    # within a shard, bin_id must be non-decreasing along doc_id order —
    # greedy sequential packing never reopens an earlier bin
    docs = load_table(spark, sf_dir, "documents")
    rows = pack_documents(docs, budget=256, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.doc_id, r.bin_id))
    for shard, lst in by_shard.items():
        lst.sort()
        bins = [b for _, b in lst]
        assert bins == sorted(bins), f"shard {shard} bin order regressed"
        assert bins[0] == 0


def test_stratified_sample_exact_quotas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    quota = 7
    avail = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        r.lang: r.n
        for r in stratified_sample(docs, quota=quota)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in sizes.items():
        assert n == min(quota, avail[lang])


def test_tfidf_topk_shape_and_ranking(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=3)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("rnk").alias("lo"), F.max("rnk").alias("hi")
    )
    rows = per_doc.collect()
    assert rows
    for r in rows:
        assert 1 <= r.n <= 3 and r.lo == 1 and r.hi == r.n
    # scores are non-increasing with rank inside a doc
    bad = (
        out.alias("a")
        .join(out.alias("b"), "doc_id")
        .filter((F.col("a.rnk") < F.col("b.rnk")) & (F.col("a.score") < F.col("b.score")))
        .count()
    )
    assert bad == 0


def test_decontaminate_flags_match_direct_ngram_overlap(spark, sf_dir):
    # independent recomputation: string 4-grams via pandas, same RNG split
    import pandas as pd

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
        rng_draw_np,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        DECON_MOD,
        DECON_SALT,
        decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in decontaminate(docs, n=4).collect()}

    pdf = docs.select("doc_id", "text").toPandas()
    draws = rng_draw_np([pdf.doc_id.to_numpy()], salt=DECON_SALT) % DECON_MOD
    pdf["is_bench"] = draws == 0

    def grams(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 4]) for i in range(len(t) - 3)}

    bench = set()
    for _, r in pdf[pdf.is_bench].iterrows():
        bench |= grams(r.text)
    expected = {}
    for _, r in pdf[~pdf.is_bench].iterrows():
        n = len(grams(r.text) & bench)
        expected[r.doc_id] = (n, n > 0)
    assert got == expected


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
        rng_draw_np,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        DECON_MOD,
        DECON_SALT,
        decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    out_ids = {r.doc_id for r in decontaminate(docs, n=4).select("doc_id").collect()}
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    bench = {i for i in ids if rng_draw_np([i], salt=DECON_SALT) % DECON_MOD == 0}
    assert out_ids == set(ids) - bench
    assert bench  # split is non-degenerate at test SF


def test_pii_scrub_redacts_known_spans(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.textops import (
        pii_counts,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.do-e@sub.example-x.org now"),
            (2, "visit https://a.example.org/x_y-z/3 or http://b.io/q"),
            (3, "host 192.168.0.1 dialed +1-555-0042 twice +12-123-123"),
            (4, "plain text with no pii at all"),
        ],
        "doc_id int, t string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *pii_counts("t"), scrub_pii("t").alias("s")
        ).collect()
    }
    assert rows[1].n_email == 1 and rows[1].s == "mail me at <EMAIL> now"
    assert rows[2].n_url == 2 and rows[2].s == "visit <URL> or <URL>"
    assert rows[3].n_ip == 1 and rows[3].n_phone == 2
    assert rows[3].s == "host <IP> dialed <PHONE> twice <PHONE>"
    assert rows[4].s == "plain text with no pii at all"
    assert all(
        rows[4][c] == 0 for c in ("n_url", "n_email", "n_ip", "n_phone")
    )


def test_misra_gries_guarantee_small():
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        misra_gries,
    )

    stream = ["a"] * 50 + ["b"] * 30 + ["c"] * 10 + list("defghij")
    k = 3
    got = misra_gries(stream, k)
    n = len(stream)
    exact = {t: stream.count(t) for t in set(stream)}
    for tok, est in got.items():
        assert est <= exact[tok]
        assert exact[tok] - est <= n // (k + 1)
    # every token with true count > n/(k+1) must survive the pass
    for tok, c in exact.items():
        if c > n // (k + 1):
            assert tok in got


def test_heavy_hitters_bounds_and_completeness(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = heavy_hitters(docs, k=8, n_shards=4).collect()
    assert rows
    for r in rows:
        assert r.mg_ok, (r.tok, r.est, r.n_exact)
        assert r.complete
        assert 0 < r.est <= r.n_exact


def test_domain_mix_quotas_follow_sqrt_weights(spark, sf_dir):
    import math

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        domain_mix,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = 120
    out = domain_mix(docs, budget=budget)
    rows = out.collect()
    avail = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    q = {s: math.floor(math.sqrt(n) * 1e6 + 0.5) for s, n in avail.items()}
    S = sum(q.values())
    expected_quota = {s: max(1, (budget * qi) // S) for s, qi in q.items()}
    got_quota = {}
    per_source: dict[str, int] = {}
    for r in rows:
        got_quota[r.source] = r.quota
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert got_quota == {s: expected_quota[s] for s in got_quota}
    for s, n_kept in per_source.items():
        assert n_kept == min(expected_quota[s], avail[s])


def test_repetition_stats_on_known_docs(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.textops import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab -> 2 distinct of 5
            (2, "x y z w"),           # all bigrams distinct
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_bigrams == 5 and rows[1].n_distinct_bigrams == 2
    assert abs(rows[1].rep_ratio - 0.6) < 1e-9
    assert abs(rows[1].top_tok_share - 0.5) < 1e-9
    assert rows[2].rep_ratio == 0.0 and rows[2].top_tok_share == 0.25


def test_theta_kmv_merge_property_and_estimates(spark, sf_dir):
    """The KMV identity the union path relies on — the k smallest of
    (k-smallest(A) ∪ k-smallest(B)) ARE the k smallest of A∪B — plus
    estimate sanity: every theta estimate must be within 3/sqrt(k)
    relative of its exact baseline (KMV standard error is ~1/sqrt(k-2);
    3x is a generous deterministic-fixture bound, not a statistical one).
    """
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.corpus import (
        THETA_K,
        theta_setops,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = {r.op: r for r in theta_setops(docs).collect()}
    assert set(rows) == {"card_a", "card_b", "union", "intersect"}
    k = THETA_K
    for op in ("card_a", "card_b", "union"):
        r = rows[op]
        assert r.n_exact > 0
        rel = abs(r.n_est - r.n_exact) / r.n_exact
        assert rel <= 3.0 / (k ** 0.5), f"{op}: est {r.n_est} vs {r.n_exact} (rel {rel:.3f})"
    # inclusion-exclusion coherence on the exact side
    assert rows["union"].n_exact == rows["card_a"].n_exact + rows["card_b"].n_exact - rows["intersect"].n_exact

    # pure-python KMV merge property over the same hash domain
    import random

    rng = random.Random(11)
    A = {rng.randrange(1, 2**31 - 1) for _ in range(500)}
    B = {rng.randrange(1, 2**31 - 1) for _ in range(400)}
    ska, skb = sorted(A)[:k], sorted(B)[:k]
    assert sorted(set(ska) | set(skb))[:k] == sorted(A | B)[:k]


def test_lexical_density_engine_matches_mirror_on_adversarial_docs(
    spark, tmp_path, monkeypatch
):
    """Edge docs for the MTLD fold: empty text, all-stopwords (empty
    content stream), constant token (TTR never drops -> zero factors,
    zero partial -> NULL MTLD), and a high-diversity stream. The Spark
    HOF fold and the Python-replay oracle must agree cell-for-cell."""
    import duckdb
    import pandas as pd

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
        REGISTRY,
    )

    texts = [
        "",
        "the a of and is the a of",
        "x x x x x x x x x x x x",
        " ".join(f"w{i}" for i in range(60)),
        ("alpha beta gamma alpha beta delta " * 12).strip(),
        "solo",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", str(tmp_path))
    spec = REGISTRY["t_lexical_density"]
    got = {r["doc_id"]: r.asDict() for r in spec.spark(spark, str(tmp_path)).collect()}
    sql = spec.oracle() if callable(spec.oracle) else spec.oracle
    con = duckdb.connect()
    cols = ["doc_id", "n_tokens", "n_content", "lex_density", "mtld_factors", "mtld_fwd"]
    for row in con.execute(sql).fetchall():
        want = dict(zip(cols, row))
        assert got[want["doc_id"]] == want, (got[want["doc_id"]], want)
    # constant tokens: TTR hits 1/2 < 0.72 on every repeat, so a factor
    # completes every 2 tokens -> MTLD = 12/6 = 2, the canonical
    # low-diversity floor
    assert got[3]["mtld_factors"] == 6 and got[3]["mtld_fwd"] == 2.0
    # the all-stopword doc has an empty content stream
    assert got[2]["n_content"] == 0 and got[2]["lex_density"] == 0.0
    # a single content token: no factor, ttr_end = 1 -> partial exactly 0,
    # denominator 0 -> NULL MTLD by contract
    assert got[6]["mtld_factors"] == 0 and got[6]["mtld_fwd"] is None
