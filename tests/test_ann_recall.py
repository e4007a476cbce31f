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
