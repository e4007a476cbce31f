"""Smoke + semantics for the end-to-end pipeline orchestrator."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = run_pipeline(
        spark, sf_dir, PipelineConfig(persist_dir=str(tmp_path / "stages"))
    )
    assert {"series", "injected", "flagged", "cleaned", "metrics", "forecast_ab"} <= set(out)
    m = out["metrics"].agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    ).collect()[0]
    assert m.tp + m.fn > 0  # injected anomalies exist
    assert m.tp > 0  # and the detector finds some
    ab = out["forecast_ab"].collect()
    assert ab and all(r.smape_cleaned is not None for r in ab)
    # stage contract persisted and re-readable
    back = spark.read.parquet(str(tmp_path / "stages" / "cleaned"))
    assert back.count() == out["cleaned"].count()


def test_pipeline_memory_bank_mode(spark, sf_dir):
    out = run_pipeline(spark, sf_dir, PipelineConfig(detector="memory_bank"))
    scores = out["window_scores"]
    assert scores.filter(F.col("score_norm").isNull()).count() == 0
    assert scores.count() > 0
