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
