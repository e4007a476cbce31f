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


def test_stream_gap_monitor_state_carries_across_batches(spark, sf_dir, tmp_path):
    """Split the events feed into 4 event_id-ordered files and stream them
    one per micro-batch: the per-user (n_events, n_gaps, max_gap_s) must
    equal the batch lag-window replay exactly — the cross-batch state
    carry (last timestamp surviving the batch boundary) is what's on
    trial; a state reset would undercount boundary gaps."""
    import os
    import time

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.stateful import (
        GAP_THRESHOLD_US,
        stream_gap_monitor,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n = ev.count()
    ordered = ev.orderBy("event_id").collect()
    qs = [ordered[i * n // 4 : (i + 1) * n // 4] for i in range(4)]
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate(qs):
        p = str(feed / f"part{i}.parquet")
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        # file source ingests in mtime order — pin it to the split order
        src = next(
            f for f in os.listdir(p + ".dir") if f.endswith(".parquet")
        )
        os.rename(os.path.join(p + ".dir", src), p)
        t = 1_700_000_000 + i * 10
        os.utime(p, (t, t))
    s = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "part*.parquet")
        .parquet(str(feed))
    )
    out = stream_gap_monitor(s)
    q = (
        out.writeStream.format("memory")
        .queryName("gapmon_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table("gapmon_t")
    got = {
        r.user_id: (r.n_events, r.n_gaps, r.max_gap_s)
        for r in t.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_gaps", "max_gap_s")).alias("m"))
        .select("user_id", "m.*")
        .collect()
    }
    assert q.lastProgress is not None  # the stream really ran
    batch = (
        ev.selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
            "lag(unix_micros(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY event_id) AS prev",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("us") - F.col("prev") > GAP_THRESHOLD_US),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_gaps"),
            F.floor(
                F.greatest(
                    F.coalesce(F.max(F.col("us") - F.col("prev")), F.lit(0)),
                    F.lit(0),
                )
                / 1_000_000
            )
            .cast("bigint")
            .alias("max_gap_s"),
        )
        .collect()
    )
    want = {r.user_id: (r.n_events, r.n_gaps, r.max_gap_s) for r in batch}
    assert got == want


def test_stream_zjoin_availablenow_matches_batch_band_join(spark, sf_dir):
    """AvailableNow replay of the two-sided z-join == the identical band
    join executed as a plain batch DataFrame plan over the same parquet —
    micro-batching must neither drop pairs that straddle batch boundaries
    nor emit duplicates."""
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.score_stream import (
        run_available_now,
        stream_overlap_zjoin,
    )

    name = run_available_now(
        stream_overlap_zjoin(spark, sf_dir), "t_zjoin", output_mode="append"
    )
    got = sorted(
        (r.purchase_id, r.error_id, r.user_id, r.offset_min)
        for r in spark.table(name).collect()
    )

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    batch = p.join(
        e,
        F.expr(
            "p_user = e_user AND p_ts >= e_ts - INTERVAL 30 minutes"
            " AND p_ts <= e_ts + INTERVAL 90 minutes"
        ),
    ).select(
        "purchase_id",
        "error_id",
        F.col("p_user").alias("user_id"),
        F.floor(
            (F.unix_timestamp("p_ts") - F.unix_timestamp("e_ts")) / F.lit(60.0)
        ).alias("offset_min"),
    )
    expected = sorted(
        (r.purchase_id, r.error_id, r.user_id, r.offset_min) for r in batch.collect()
    )
    assert got == expected and len(got) > 0


def test_stream_zjoin_band_boundaries_inclusive_at_microseconds(spark, tmp_path):
    """Pin the band contract at the exact edges: purchases at e_ts - 30m
    and e_ts + 90m (to the microsecond) are IN; 1 µs beyond either edge is
    OUT; the signed offset floor-divides (-30m -> -30, -1 µs short of a
    minute boundary floors DOWN, not toward zero)."""
    import datetime as dt

    from pyspark.sql import Row
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.score_stream import (
        run_available_now,
        stream_overlap_zjoin,
    )

    e_ts = dt.datetime(2024, 6, 1, 12, 0, 0, 500000)
    us = dt.timedelta(microseconds=1)

    def ev(eid, ts, etype, uid=7):
        return Row(
            event_id=eid, ts=ts, user_id=uid, event_type=etype, value=1.0, props="{}"
        )

    rows = [
        ev(1, e_ts, "error"),
        ev(10, e_ts - dt.timedelta(minutes=30), "purchase"),        # ON lower edge
        ev(11, e_ts - dt.timedelta(minutes=30) - us, "purchase"),   # 1 µs early
        ev(12, e_ts + dt.timedelta(minutes=90), "purchase"),        # ON upper edge
        ev(13, e_ts + dt.timedelta(minutes=90) + us, "purchase"),   # 1 µs late
        # 1 µs before the error: the diff truncates to SECONDS first (both
        # engines: unix_timestamp / date_diff('second')), so offset is 0
        ev(14, e_ts - us, "purchase"),
        ev(15, e_ts, "purchase"),       # simultaneous: offset 0
        ev(16, e_ts, "purchase", uid=8),  # other user: never joins
        # 59 s early: floor(-59/60) = -1 — a bigint cast would truncate to 0
        ev(17, e_ts - dt.timedelta(seconds=59), "purchase"),
    ]
    feed = tmp_path / "zfeed"
    feed.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # INT96 (Spark's default physical type) trips the source's nanos-sniff
    # branch; the real generator ships MICROS — write what production writes
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(feed / "stage")
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    import glob
    import shutil

    part = glob.glob(str(feed / "stage" / "part-*.parquet"))[0]
    shutil.copy(part, str(feed / "events.parquet"))

    name = run_available_now(
        stream_overlap_zjoin(spark, str(feed)), "t_zedge", output_mode="append"
    )
    got = {r.purchase_id: r.offset_min for r in spark.table(name).collect()}
    assert got == {10: -30, 12: 90, 14: 0, 15: 0, 17: -1}


def test_det_ann_scores_np_matches_hof(embedded):
    """r16: the Arrow-island ANN scorer must reproduce the HOF two-speed
    form bit-for-bit — same bank, same probe cells, same quantized
    distances (the island uses the mirror's exact arithmetic, so any
    drift in either kernel fails this)."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.mllib_modes import (
        det_ann_scores,
        det_ann_scores_np,
    )

    hof = {
        (r.series_id, r.window_start): r.score
        for r in det_ann_scores(embedded).collect()
    }
    isl = {
        (r.series_id, r.window_start): r.score
        for r in det_ann_scores_np(embedded).collect()
    }
    assert hof.keys() == isl.keys()
    for k, v in hof.items():
        assert isl[k] == v, (k, isl[k], v)  # bit-exact, no tolerance
