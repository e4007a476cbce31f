"""Invariants for multimodal plumbing and the imputation splice contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml import (
    imputer as IM,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.neural import (
    HAS_TORCH,
    LSTMAutoencoder,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators import (
    anomaly as AN,
    multimodal as MM,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


def test_media_schema_and_features(spark, sf_dir):
    media = MM.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    feats = MM.extract_features(media)
    rows = feats.limit(10).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == MM.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.n_bytes > 0


def test_features_deterministic(spark, sf_dir):
    media = MM.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    a = {r.media_id: tuple(r.feature) for r in MM.extract_features(media).collect()}
    b = {r.media_id: tuple(r.feature) for r in MM.extract_features(media).collect()}
    assert a == b


def test_real_codecs_are_marked_unimplemented(spark, sf_dir):
    media = MM.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        MM.frame_sample(media, use_real_codecs=True)


def test_frame_sample_counts(spark, sf_dir):
    media = MM.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    frames = MM.frame_sample(media, every_n=4)
    got = frames.groupBy("media_id").count().join(
        media.select("media_id", F.col("meta.n_frames").alias("nf")), "media_id"
    )
    for r in got.limit(20).collect():
        assert r["count"] == (r.nf + 3) // 4  # ceil(n_frames / 4)


def test_resize_contract(spark, sf_dir):
    media = MM.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    out = MM.resize(media, out_w=16, out_h=8)
    rows = out.limit(10).collect()
    assert rows
    for r in rows:
        assert len(r.pixels) == 16 * 8
        assert r.width == 16 and r.height == 8
        assert all(0.0 <= p <= 1.0 for p in r.pixels)
    with pytest.raises(NotImplementedError):
        MM.resize(media, use_real_codecs=True)


def test_impute_touches_only_masked(spark, sf_dir):
    series = AN.prepared_series(load_table(spark, sf_dir, "events"))
    imputed = IM.profile_impute(IM.with_training_mask(series))
    # M18 contract: outside the mask the series is untouched.
    violated = imputed.filter((F.col("mask") == 0) & (F.col("imputed") != F.col("value"))).count()
    assert violated == 0
    assert imputed.filter(F.col("mask") == 1).count() > 0


def test_neural_models_gated():
    if HAS_TORCH:
        pytest.skip("torch present; gating not applicable")
    with pytest.raises(NotImplementedError, match="torch"):
        LSTMAutoencoder()
