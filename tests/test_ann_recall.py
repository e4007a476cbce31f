"""ANN quality: IVF top-k recall against the exact brute-force baseline."""

from __future__ import annotations

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, n_queries=30, k=5).collect()}
    approx = {(r.qid, r.nid) for r in ivf_topk(emb, n_queries=30, k=5, n_lists=8, n_probe=4).collect()}
    assert exact, "no exact pairs"
    recall = len(exact & approx) / len(exact)
    # probing half the cells should retain most true neighbors
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_ivf_degenerate_cell_count_keeps_rows(spark, sf_dir):
    # n_lists < n_probe: no row reaches fast-rank n_probe, so the windowed
    # kth threshold is NULL — it must behave as +inf (keep every cell), not
    # filter the query's candidate set to nothing (round-4 advice).
    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_topk(emb, n_queries=10, k=3, n_lists=2, n_probe=4).collect()
    qids = {r.qid for r in rows}
    assert len(qids) == 10, f"expected all 10 queries to keep results, got {sorted(qids)}"


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    # int8 quantization perturbs each cosine by O(1/127) per component; the
    # quantized top-5 must still largely agree with the exact float top-5.
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        sq8_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, n_queries=30, k=5).collect()}
    quant = {(r.qid, r.nid) for r in sq8_topk(emb, n_queries=30, k=5).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"sq8 recall {recall:.2f}"


def test_kmeans_lloyd_matches_mirror_and_partitions(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        kmeans_lloyd,
        kmeans_mirror,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.vec_id: (r.cluster, r.d2) for r in kmeans_lloyd(emb, k=4, iters=2).collect()}

    rows = sorted(
        (r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()
    )
    ids = [r[0] for r in rows]
    X = [r[1] for r in rows]
    _, expected = kmeans_mirror(ids, X, k=4, iters=2)
    assert got == expected
    # every vector assigned, clusters within range, >1 cluster used
    assert set(got) == set(ids)
    used = {c for c, _ in got.values()}
    assert used <= set(range(1, 5)) and len(used) > 1
