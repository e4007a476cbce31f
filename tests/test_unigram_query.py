"""Driver-gate-style parity for the STAGED unigram-LM registry query."""

from __future__ import annotations

import pytest

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
    REGISTRY,
    queries_unigram,  # noqa: F401  (import registers the staged spec)
)


def test_staged_unigram_query_matches_oracle(spark, duck, sf_dir):
    spec = REGISTRY["t_unigram_vocab"]
    df = spec.spark(spark, sf_dir)
    spark_rows = sorted(tuple(r) for r in df.collect())
    res = duck.execute(spec.oracle())
    duck_cols = [d[0] for d in res.description]
    assert sorted(df.columns) == sorted(duck_cols)
    duck_rows = sorted(tuple(r) for r in res.fetchall())
    # the synthetic corpus has a ~30-word vocabulary and EM concentrates
    # mass on whole-word pieces, so the surviving vocab is compact
    assert len(spark_rows) == len(duck_rows) > 20
    assert spark_rows == duck_rows  # all-integer output: exact equality


def test_vocab_artifact_restore(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WEIGHTS_DIR", str(tmp_path))
    queries_unigram._VOCAB_MEMO.clear()
    trained = queries_unigram.ensure_vocab(spark, sf_dir)
    queries_unigram._VOCAB_MEMO.clear()

    def boom(*a, **k):
        raise AssertionError("retrained despite warm artifact")

    monkeypatch.setattr(queries_unigram.unigram, "train_unigram", boom)
    assert queries_unigram.ensure_vocab(spark, sf_dir) == trained
    queries_unigram._VOCAB_MEMO.clear()
    monkeypatch.setattr(queries_unigram, "EM_ROUNDS", queries_unigram.EM_ROUNDS + 1)
    with pytest.raises(AssertionError, match="retrained"):
        queries_unigram.ensure_vocab(spark, sf_dir)
    queries_unigram._VOCAB_MEMO.clear()
