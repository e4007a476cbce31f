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


def test_stream_sessions_matches_batch_gaps_and_islands(spark, sf_dir):
    """AvailableNow replay of session_window == batch sessionization with
    half-open gap semantics (>= gap opens a new session)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.exact import (
        dsum,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.score_stream import (
        run_available_now,
        stream_sessions,
    )

    name = run_available_now(
        stream_sessions(spark, sf_dir), "t_sessions", output_mode="complete"
    )
    got = {
        (r.series_id, r.session_start): (r.n_events, r.session_value)
        for r in spark.table(name).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    ow = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(ow))
    new_sess = F.when(F.lag("ts", 1).over(ow).isNull() | (gap >= 1800), 1).otherwise(0)
    run_w = ow.rowsBetween(W.unboundedPreceding, 0)
    s = ev.withColumn("_ns", new_sess).withColumn("sn", F.sum("_ns").over(run_w))
    batch = s.groupBy(F.col("user_id").cast("string").alias("series_id"), "sn").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("session_value"),
    )
    expected = {
        (r.series_id, r.session_start): (r.n_events, r.session_value)
        for r in batch.collect()
    }
    assert got == expected
