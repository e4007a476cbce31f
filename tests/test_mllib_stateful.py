"""MLlib scale modes + stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.mllib_modes import (
    ann_window_scores,
    kmeans_coreset,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.softpatch import (
    SoftPatchConfig,
    embed_windows,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.windows import (
    day_windows,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators import (
    anomaly as AN,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


@pytest.fixture(scope="module")
def embedded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    points = AN.inject_anomalies(AN.prepared_series(ev))
    emb = embed_windows(day_windows(points), SoftPatchConfig())
    emb.cache().count()
    return emb


def test_kmeans_coreset_shape(embedded):
    bank = kmeans_coreset(embedded, k=16)
    rows = bank.collect()
    assert len(rows) == 16
    assert all(len(r.feature) == SoftPatchConfig().embed_dim for r in rows)


def test_ann_scores_cover_windows(embedded):
    bank = kmeans_coreset(embedded, k=16)
    scores = ann_window_scores(embedded, bank, threshold=1e6)
    n_windows = embedded.select("series_id", "window_start").distinct().count()
    got = scores.count()
    # ANN recall: a window can miss if none of its patches shares a bucket
    # with any bank point — approximate by contract, bounded loss
    assert got >= 0.9 * n_windows, f"{got} of {n_windows}"
    assert scores.filter(F.col("score") < 0).count() == 0


def test_stateful_online_zscore(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.score_stream import (
        run_available_now,
        stream_events,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.stateful import (
        online_zscore_flags,
    )

    flags = online_zscore_flags(stream_events(spark, sf_dir))
    q = (
        flags.writeStream.format("memory")
        .queryName("online_flags_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("online_flags_t")
    rows = out.collect()
    # flags only after warm-up, and every flagged |z| exceeds the threshold
    assert all(r.n_seen >= 30 for r in rows)
    assert all(abs(r.z) > 3.0 for r in rows)
    _ = run_available_now  # imported for API parity


def test_det_ann_scores_degenerate_cell_count(embedded):
    # n_lists < n_probe: under ANSI mode element_at(..., n_probe) on the
    # scored-cells array would throw; the clamped index must instead keep
    # every cell and still score every window (round-4 advice).
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.mllib_modes import (
        det_ann_scores,
    )

    n_windows = embedded.select("series_id", "window_start").distinct().count()
    out = det_ann_scores(embedded, n_bank=64, n_lists=2, n_probe=8)
    assert out.count() == n_windows
