"""M20/M21 trained-forecaster harness: the reference's cleaned-vs-contaminated
A/B experiment as one Spark program.

Reference semantics (citations into /root/reference/):
- experiment matrix (model × data)   src/pipeline.py:400-486 — seq2seq AND
  SCINet each trained on cleaned and on contaminated data, evaluated on the
  common held-out test split with (smape, mae, mse, rmse, r2)
- windowing                          src/forecasting/main.py:73-78 — 48 h
  windows split 24 in / 24 out
- metric suite                       src/forecasting/seq2seq/wrapper.py:102-126
  (here computed over all test points per cell, not averaged per batch —
  batch-size must never change a result in this engine)

Execution shape (100 TB story):
- windowing / splitting / metric aggregation are declarative Spark;
- training consumes a driver-side sample **bounded by construction**
  (deterministic RNG hash-stride caps the collect at TRAIN_CAP windows —
  the same pattern as the softpatch candidate cap); models are O(1)-size;
- inference ships broadcast weights into a mapInPandas island;
- metrics use decimal-exact sums, so the result is partition-independent
  and reproducible in the DuckDB oracle.

The pandas helpers at the bottom are the *mirror* data path used by the
oracle builder (plans/queries_neural.py): DuckDB SQL produces the same
points, pandas builds the same windows, the same numpy models train on the
same matrices — predictions must agree bit-for-bit with the island's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import dsum
from ..functions.rng import rng_draw
from ..operators.timeseries import SID, TS
from .neural_np import GRUSeq2Seq, SCINetNP

N_IN = 24
N_OUT = 24
WIN_H = N_IN + N_OUT
TRAIN_FRAC = 0.8
TRAIN_CAP = 1024  # driver-sample bound: models this size saturate well before 1k windows
FC_STRIDE_SALT = 37
GRU_HIDDEN, GRU_FC, GRU_EPOCHS, GRU_PATIENCE = 16, 8, 40, 8
SCI_EPOCHS, SCI_PATIENCE = 40, 8
VARIANTS = ("cleaned", "contam")


def ab_windows(points: DataFrame) -> DataFrame:
    """48 h tumbling windows (epoch-aligned), both value variants, with the
    per-series positional train/test split. One shuffle on (series, window)."""
    eh = F.floor(F.unix_timestamp(F.col(TS)) / 3600).cast("bigint")
    g = (
        points.withColumn("_wid", F.floor(eh / WIN_H).cast("bigint"))
        .withColumn("_pos", F.pmod(eh, F.lit(WIN_H)).cast("int"))
        .groupBy(SID, "_wid")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_pos"),
                        F.col("cleaned").alias("c"),
                        F.col("value_contam").alias("x"),
                    )
                )
            ).alias("pts")
        )
        .filter(F.size("pts") == WIN_H)
    )
    rk = F.row_number().over(W.partitionBy(SID).orderBy("_wid"))
    n = F.count(F.lit(1)).over(W.partitionBy(SID))
    sel = lambda a, b, f: F.expr(f"transform(slice(pts, {a}, {b}), s -> s.{f})")
    return (
        g.withColumn("_rk", rk)
        .withColumn("_n", n)
        .select(
            SID,
            F.col("_wid").alias("wid"),
            (F.col("_rk") > F.floor(F.lit(TRAIN_FRAC) * F.col("_n"))).alias("is_test"),
            sel(1, N_IN, "c").alias("in_clean"),
            sel(N_IN + 1, N_OUT, "c").alias("tgt_clean"),
            sel(1, N_IN, "x").alias("in_contam"),
            sel(N_IN + 1, N_OUT, "x").alias("tgt_contam"),
        )
    )


def collect_train(windows: DataFrame) -> pd.DataFrame:
    """Driver-side training sample, bounded by TRAIN_CAP via the
    deterministic engine-side hash-stride (never an unbounded collect)."""
    tr = windows.filter(~F.col("is_test"))
    n = tr.count()
    if n > TRAIN_CAP:
        stride = -(-n // TRAIN_CAP)
        tr = tr.filter(
            F.pmod(
                rng_draw(F.col(SID).cast("bigint"), F.col("wid"), salt=FC_STRIDE_SALT),
                F.lit(stride),
            )
            == 0
        )
    return tr.orderBy(SID, "wid").select(
        "in_clean", "tgt_clean", "in_contam", "tgt_contam"
    ).toPandas()


def _q6(a: np.ndarray) -> np.ndarray:
    """Canonicalize a window matrix onto the 1e-6 value lattice before any
    model consumes it. The training dynamics are chaotic amplifiers: a
    sub-ulp difference in ONE cleaned value (the imputation chain runs in
    Arrow islands whose batch shapes vary with session state) grew into a
    1.3e-3 weight divergence and a deterministic 1e-8 metric mismatch
    against the mirror at sf0.1 (r11). Snapping both engines' windows to
    the same lattice BEFORE the fit/forward makes the whole experiment a
    function of quantized inputs — engine- and session-independent."""
    return np.floor(a * 1e6 + 0.5) / 1e6


def fit_ab_models(train_pdf: pd.DataFrame) -> dict[tuple[str, str], dict[str, np.ndarray]]:
    """Train 4 models: {seq2seq, scinet} × {cleaned, contam}. Deterministic:
    seeded inits, key-sorted full-batch data, fixed schedules, inputs
    canonicalized to the 1e-6 lattice (see :func:`_q6`), and BLAS pinned
    to one thread for the fit (r15: OpenBLAS reduction order follows the
    thread count, so an unpinned fit is only reproducible within one
    environment — the stored artifact then diverges from the mirror
    oracle's refit; see artifacts.single_threaded_blas)."""
    from .artifacts import single_threaded_blas

    with single_threaded_blas():
        return _fit_ab_models_pinned(train_pdf)


def _fit_ab_models_pinned(
    train_pdf: pd.DataFrame,
) -> dict[tuple[str, str], dict[str, np.ndarray]]:
    out: dict[tuple[str, str], dict[str, np.ndarray]] = {}
    for variant in VARIANTS:
        suffix = "clean" if variant == "cleaned" else "contam"
        X = _q6(np.stack(train_pdf["in_" + suffix].to_numpy()))
        Y = _q6(np.stack(train_pdf["tgt_" + suffix].to_numpy()))
        gru = GRUSeq2Seq(n_in=N_IN, n_out=N_OUT, hidden=GRU_HIDDEN, fc_units=GRU_FC, seed=0)
        gru.fit(X, Y, epochs=GRU_EPOCHS, patience=GRU_PATIENCE)
        sci = SCINetNP(n_in=N_IN, n_out=N_OUT, levels=2, seed=0)
        # full end-to-end training (conv tree + projection, analytic
        # gradients); falls back to its ridge warm start if Adam never
        # beats it on validation
        sci.fit_bp(X, Y, epochs=SCI_EPOCHS, patience=SCI_PATIENCE)
        out[("seq2seq", variant)] = gru.weights()
        out[("scinet", variant)] = sci.weights()
    return out


_PRED_SCHEMA = T.StructType(
    [
        T.StructField("model", T.StringType()),
        T.StructField("train_data", T.StringType()),
        T.StructField("series_id", T.StringType()),
        T.StructField("wid", T.LongType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("pred", T.DoubleType()),
        T.StructField("actual", T.DoubleType()),
    ]
)


def _models_from_weights(w: dict) -> dict:
    return {
        key: (
            GRUSeq2Seq.from_weights(wd, n_in=N_IN, n_out=N_OUT)
            if key[0] == "seq2seq"
            else SCINetNP.from_weights(wd, n_in=N_IN, n_out=N_OUT, levels=2)
        )
        for key, wd in w.items()
    }


def predict_test(windows: DataFrame, weights: dict[tuple[str, str], dict]) -> DataFrame:
    """Distributed inference: broadcast weights, Arrow-batched numpy forward,
    long output (one row per model × variant × test point)."""
    test = windows.filter(F.col("is_test")).select(SID, "wid", "in_clean", "tgt_clean")
    b = test.sparkSession.sparkContext.broadcast(weights)

    def gen(batches):
        models = None
        for pdf in batches:
            if pdf.empty:
                continue
            if models is None:
                models = _models_from_weights(b.value)
            X = _q6(np.stack(pdf["in_clean"].to_numpy()))
            # targets feed the metric path — quantize them too, so the whole
            # experiment (fit AND eval) is a function of lattice inputs
            A = _q6(np.stack(pdf["tgt_clean"].to_numpy()))
            bsz = len(X)
            for (m, v), mod in sorted(models.items()):
                P = mod.predict(X)
                yield pd.DataFrame(
                    {
                        "model": np.repeat(m, bsz * N_OUT),
                        "train_data": np.repeat(v, bsz * N_OUT),
                        "series_id": np.repeat(pdf["series_id"].to_numpy(), N_OUT),
                        "wid": np.repeat(pdf["wid"].to_numpy(), N_OUT),
                        "h": np.tile(np.arange(N_OUT, dtype="int32"), bsz),
                        "pred": P.ravel(),
                        "actual": A.ravel(),
                    }
                )

    return test.mapInPandas(gen, schema=_PRED_SCHEMA)


def ab_metrics(preds: DataFrame) -> DataFrame:
    """wrapper.py:102-126 metric suite over all test points per experiment
    cell, decimal-exact (cross-engine bit-stable)."""
    e = F.col("pred") - F.col("actual")
    denom = F.abs(F.col("pred")) + F.abs(F.col("actual"))
    term = F.when(denom > 0, F.lit(2.0) * F.abs(e) / denom).otherwise(F.lit(0.0))
    n = F.count(F.lit(1)).cast("double")
    sse = dsum(e * e)
    sy = dsum(F.col("actual"))
    sy2 = dsum(F.col("actual") * F.col("actual"))
    mse = sse / n
    return preds.groupBy("model", "train_data").agg(
        F.count(F.lit(1)).alias("n_points"),
        (dsum(term) / n * 100).alias("smape"),
        (dsum(F.abs(e)) / n).alias("mae"),
        mse.alias("mse"),
        F.sqrt(mse).alias("rmse"),
        (F.lit(1.0) - F.try_divide(sse, sy2 - sy * sy / n)).alias("r2"),
    )


def run_forecast_ab(points: DataFrame) -> DataFrame:
    """Full experiment: windows → bounded-collect train → 4 models →
    distributed scoring → exact metrics (4 rows)."""
    from . import softpatch as SP

    windows = ab_windows(points)
    SP._release_caches()
    windows.persist()
    SP._live_caches.append(windows)  # the returned plan re-reads the cache
    weights = fit_ab_models(collect_train(windows))
    preds = predict_test(windows, weights)
    return ab_metrics(preds)


# ---------------------------------------------------------------------------
# pandas mirror (oracle data path) — same spec, independent implementation
# ---------------------------------------------------------------------------


def ab_windows_pd(points: pd.DataFrame) -> pd.DataFrame:
    """Mirror of :func:`ab_windows` over a (series_id, ts, value_contam,
    cleaned) pandas frame."""
    df = points.copy()
    eh = (df["ts"].values.astype("datetime64[s]").astype("int64")) // 3600
    df["wid"] = eh // WIN_H
    df["pos"] = eh % WIN_H
    df = df.sort_values(["series_id", "wid", "pos"])
    rows = []
    for (sid, wid), grp in df.groupby(["series_id", "wid"], sort=True):
        if len(grp) != WIN_H:
            continue
        c = grp["cleaned"].to_numpy(dtype=np.float64)
        x = grp["value_contam"].to_numpy(dtype=np.float64)
        rows.append(
            {
                "series_id": sid,
                "wid": int(wid),
                "in_clean": c[:N_IN],
                "tgt_clean": c[N_IN:],
                "in_contam": x[:N_IN],
                "tgt_contam": x[N_IN:],
            }
        )
    w = pd.DataFrame(rows).sort_values(["series_id", "wid"]).reset_index(drop=True)
    w["_rk"] = w.groupby("series_id").cumcount() + 1
    w["_n"] = w.groupby("series_id")["wid"].transform("size")
    w["is_test"] = w["_rk"] > np.floor(TRAIN_FRAC * w["_n"])
    return w.drop(columns=["_rk", "_n"])


def mirror_train_windows(w: pd.DataFrame) -> pd.DataFrame:
    """Mirror of :func:`collect_train` (same cap, same RNG stride)."""
    from ..functions.rng import rng_draw_np

    tr = w[~w["is_test"]].sort_values(["series_id", "wid"]).reset_index(drop=True)
    if len(tr) > TRAIN_CAP:
        stride = -(-len(tr) // TRAIN_CAP)
        draws = rng_draw_np(
            [tr["series_id"].astype("int64").to_numpy(), tr["wid"].to_numpy()],
            salt=FC_STRIDE_SALT,
        )
        tr = tr[draws % stride == 0].reset_index(drop=True)
    return tr


def mirror_predictions(w: pd.DataFrame) -> pd.DataFrame:
    """Train the same 4 models on the mirror windows and score the test
    split locally — the oracle's expected (pred, actual) rows."""
    weights = fit_ab_models(mirror_train_windows(w))
    models = _models_from_weights(weights)
    te = w[w["is_test"]].sort_values(["series_id", "wid"]).reset_index(drop=True)
    X = _q6(np.stack(te["in_clean"].to_numpy()))
    A = _q6(np.stack(te["tgt_clean"].to_numpy()))
    frames = []
    for (m, v), mod in sorted(models.items()):
        P = mod.predict(X)
        frames.append(
            pd.DataFrame(
                {
                    "model": np.repeat(m, P.size),
                    "train_data": np.repeat(v, P.size),
                    "pred": P.ravel(),
                    "actual": A.ravel(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)
