"""Driver-gate-style parity for the STAGED BPE registry queries.

plans/queries_bpe.py is dormant (not imported by plans/__init__.py) until
the r16/r17 window has room, so test_oracle_parity's registry walk only
picks it up when this module's import has registered it first. This file
runs the same comparison explicitly so the staged queries carry full
parity evidence regardless of collection order.
"""

from __future__ import annotations

import math

import pytest

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
    REGISTRY,
    queries_bpe,  # noqa: F401  (import registers the staged specs)
)

STAGED = ["t_bpe_merges", "t_bpe_compression"]


@pytest.mark.parametrize("name", STAGED, ids=STAGED)
def test_staged_bpe_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(spec.oracle() if callable(spec.oracle) else spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert len(spark_rows) > 0, f"{name} produced no rows at sf0.001"

    def norm(rows, cols):
        order = [cols.index(c) for c in sorted(cols)]
        return sorted(
            (tuple(r[i] for i in order) for r in rows),
            key=lambda r: tuple(str(c) for c in r),
        )

    for i, (sr, dr) in enumerate(zip(norm(spark_rows, spark_cols), norm(duck_rows, duck_cols))):
        for a, b, c in zip(sr, dr, sorted(spark_cols)):
            if isinstance(a, float) and isinstance(b, float):
                assert not math.isnan(a) and not math.isnan(b)
                assert a == b, f"{name} row {i} col {c}: {a!r} vs {b!r} (exact-operand division must be bit-equal)"
            else:
                assert a == b, f"{name} row {i} col {c}: {a!r} vs {b!r}"


def test_merges_memo_reused_between_queries(spark, sf_dir):
    queries_bpe._MERGES_MEMO.clear()
    REGISTRY["t_bpe_merges"].spark(spark, sf_dir).collect()
    memo_after_first = dict(queries_bpe._MERGES_MEMO)
    REGISTRY["t_bpe_compression"].spark(spark, sf_dir).collect()
    assert queries_bpe._MERGES_MEMO == memo_after_first  # no retrain


def test_merges_restore_from_artifact_store(spark, sf_dir, tmp_path, monkeypatch):
    """Second session (fresh memo) restores from the keyed artifact instead
    of retraining; a hyperparameter change rotates the key and retrains."""
    monkeypatch.setenv("SPARK_GRAFT_WEIGHTS_DIR", str(tmp_path))
    queries_bpe._MERGES_MEMO.clear()
    trained = queries_bpe.ensure_merges(spark, sf_dir)
    arts = [p for p in tmp_path.iterdir() if p.name.startswith("bpe-merges-")]
    assert len(arts) == 1

    queries_bpe._MERGES_MEMO.clear()

    def boom(*a, **k):  # restore path must not retrain
        raise AssertionError("retrained despite warm artifact")

    monkeypatch.setattr(queries_bpe.bpe, "train_bpe_batched", boom)
    restored = queries_bpe.ensure_merges(spark, sf_dir)
    assert restored == trained

    # hyperparameter change -> new key -> honest slow path (boom fires)
    queries_bpe._MERGES_MEMO.clear()
    monkeypatch.setattr(queries_bpe, "NUM_MERGES", queries_bpe.NUM_MERGES - 1)
    with pytest.raises(AssertionError, match="retrained"):
        queries_bpe.ensure_merges(spark, sf_dir)
    queries_bpe._MERGES_MEMO.clear()
