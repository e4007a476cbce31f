"""TS-SoftPatch re-expressed for Spark: memory-bank anomaly detection with
patch features, outlier-weight denoising, greedy-coreset subsampling, and
1-NN scoring.

Reference semantics (citations into /root/reference/):
- M7 channel features (raw, patch-std, EWMA)  src/anomaly_detection/feature_extractor.py:38-112
- M8 deep embedding                           src/anomaly_detection/softpatch.py:120-180
- M9 patchify                                 src/anomaly_detection/softpatch.py:457-483
- M10 gaussian patch-weight denoising         src/anomaly_detection/softpatch.py:224-269,
                                              multi_variate_gaussian.py:77-104
- M11 greedy coreset (approx k-center)        src/anomaly_detection/sampler.py:118-174
- M12 1-NN scoring (FAISS L2 → here exact)    src/anomaly_detection/common.py:275-330,
                                              softpatch.py:365-397
- M13 score normalization                     src/anomaly_detection/main.py:157-167

Execution shape (the part that matters at 100 TB):
- Embedding is a **mapInPandas island**: Arrow-batched, weights broadcast,
  rows never leave the executor. The backbone here is a seeded random
  projection (torch/timm are unavailable in this environment — the
  ``_load_backbone`` hook is where a real frozen ResNet/timm model plugs in;
  the Spark plumbing is identical either way).
- Patch-weight fitting groups by **patch position** — small fixed key space,
  so stats are computed with one tiny applyInPandas per position over a
  sampled candidate set.
- Coreset is the reference's inherently-sequential greedy k-center: run on
  the **driver** over the (weight-filtered, projected) candidate matrix,
  exactly like the reference collects features before sampling. The bank is
  ≪ data (10 % of train patches) and is **broadcast** for scoring.
- Scoring is a second mapInPandas island: vectorized cdist argmin against
  the broadcast bank — the exact-search analog of FAISS IndexFlatL2.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.timeseries import SID


@dataclass(frozen=True)
class SoftPatchConfig:
    day_size: int = 24
    patch_size: int = 8  # -> 3 patches per day window
    embed_dim: int = 16
    coreset_ratio: float = 0.1
    coreset_max: int = 1024  # greedy k-center is O(k·n); cap k for the driver loop
    candidate_cap: int = 50000  # deterministic stride-subsample of the bank candidates
    weight_quantile: float = 0.15  # drop the most-outlying 15 % of patches
    ewma_alpha: float = 0.2
    seed: int = 42

    @property
    def n_patches(self) -> int:
        return self.day_size // self.patch_size


def _channel_features(points: np.ndarray, cfg: SoftPatchConfig) -> np.ndarray:
    """M7: stack [raw, patch_std, ewma] -> (3, day_size). Pure numpy mirror of
    feature_extractor.py semantics (population std per patch, EWMA seeded with
    x0, adjust=False)."""
    raw = points
    ps = np.repeat(
        points.reshape(-1, cfg.patch_size).std(axis=1), cfg.patch_size
    )  # population std, repeated across the patch
    ewma = np.empty_like(points)
    acc = points[0]
    for i, x in enumerate(points):
        acc = cfg.ewma_alpha * x + (1 - cfg.ewma_alpha) * acc if i else x
        ewma[i] = acc
    return np.stack([raw, ps, ewma])


def _projection(cfg: SoftPatchConfig) -> np.ndarray:
    """Seeded dense projection standing in for the frozen backbone (M8).
    Deterministic: same matrix on every executor, no broadcast needed beyond
    the closure."""
    rs = np.random.RandomState(cfg.seed)
    in_dim = 3 * cfg.patch_size
    return rs.standard_normal((in_dim, cfg.embed_dim)).astype(np.float64) / np.sqrt(in_dim)


def embed_windows(windows: DataFrame, cfg: SoftPatchConfig) -> DataFrame:
    """M8/M9: window -> per-patch embeddings, as a mapInPandas island.

    Output: (series_id, window_start, window_label, patch_idx, feature[]).
    """
    proj = _projection(cfg)
    n_p, p_sz = cfg.n_patches, cfg.patch_size

    schema = T.StructType(
        [
            T.StructField("series_id", T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_label", T.IntegerType()),
            T.StructField("patch_idx", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    alpha = cfg.ewma_alpha

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fully vectorized over the Arrow batch: channels and projections are
        # (batch × …) matrix ops; the only Python loop is over time steps.
        for pdf in batches:
            if pdf.empty:
                continue
            pts = np.stack([np.asarray(p, dtype=np.float64) for p in pdf["points"]])
            b = len(pts)
            ps = np.repeat(pts.reshape(b, n_p, p_sz).std(axis=2), p_sz, axis=1)
            ew = np.empty_like(pts)
            acc = pts[:, 0].copy()
            ew[:, 0] = acc
            for t in range(1, pts.shape[1]):
                acc = alpha * pts[:, t] + (1 - alpha) * acc
                ew[:, t] = acc
            ch = np.stack([pts, ps, ew], axis=1)  # (b, 3, day)
            frames = []
            for p in range(n_p):
                feats = ch[:, :, p * p_sz : (p + 1) * p_sz].reshape(b, -1) @ proj
                frames.append(
                    pd.DataFrame(
                        {
                            "series_id": pdf["series_id"].to_numpy(),
                            "window_start": pdf["window_start"].to_numpy(),
                            "window_label": pdf["window_label"].astype("int32").to_numpy(),
                            "patch_idx": np.full(b, p, dtype="int32"),
                            "feature": feats.tolist(),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    cols = ["series_id", "window_start", "window_label", "points"]
    return windows.select(*cols).mapInPandas(gen, schema=schema)


def _gaussian_weights(feats: np.ndarray) -> np.ndarray:
    """M10 (gaussian mode): Mahalanobis distance of each row to the patch
    population N(mean, cov + 0.01·I) — the reference's denoising score
    (multi_variate_gaussian.py:77-104, softpatch.py:241-245)."""
    mean = feats.mean(axis=0)
    d = feats - mean
    cov = (d.T @ d) / max(len(feats) - 1, 1) + 0.01 * np.eye(feats.shape[1])
    inv = np.linalg.inv(cov)
    return np.sqrt(np.maximum((d @ inv * d).sum(axis=1), 0.0))


def _lof_weights(feats: np.ndarray, k: int = 6) -> np.ndarray:
    """M10 (LOF mode): Local Outlier Factor, the reference's alternative
    denoiser (softpatch.py:279-286, k=6). Pure numpy (sklearn is absent):
    k-distance → reachability distance → local reachability density → LOF.
    Group sizes are bounded (patch-position populations), so the pairwise
    matrix is fine inside one group."""
    n = len(feats)
    kk = min(k, n - 1)
    if kk < 1:
        return np.zeros(n)
    d = np.sqrt(
        np.maximum(
            (feats * feats).sum(1)[:, None] - 2 * feats @ feats.T + (feats * feats).sum(1)[None, :],
            0.0,
        )
    )
    np.fill_diagonal(d, np.inf)
    knn_idx = np.argsort(d, axis=1, kind="stable")[:, :kk]  # k nearest neighbors
    kdist = d[np.arange(n)[:, None], knn_idx][:, -1]  # k-distance per point
    reach = np.maximum(d[np.arange(n)[:, None], knn_idx], kdist[knn_idx])
    lrd = kk / np.maximum(reach.sum(axis=1), 1e-12)
    lof = (lrd[knn_idx].sum(axis=1) / kk) / lrd
    return lof


def patch_weights(embedded: DataFrame, cfg: SoftPatchConfig, mode: str = "gaussian") -> DataFrame:
    """M10: per-patch-position outlier weights via applyInPandas.

    Patch position is the natural partition key (reference permutes to
    (patch, batch, dim) at softpatch.py:232). Key cardinality is tiny, but
    each group is a bounded (n_windows × dim) matrix — the group fits because
    the *candidate set* is what flows in, not the raw corpus."""
    schema = T.StructType(
        [
            T.StructField("series_id", T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("patch_idx", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
            T.StructField("weight", T.DoubleType()),
        ]
    )

    def per_patch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # Pin row order: float mean/cov are order-sensitive in the last ulps,
        # and Arrow batch arrival order is not deterministic.
        pdf = pdf.sort_values(["series_id", "window_start"]).reset_index(drop=True)
        feats = np.stack(pdf["feature"].to_numpy())
        w = _lof_weights(feats) if mode == "lof" else _gaussian_weights(feats)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"],
                "window_start": pdf["window_start"],
                "patch_idx": pdf["patch_idx"],
                "feature": pdf["feature"],
                "weight": w,
            }
        )

    return embedded.groupBy("patch_idx").applyInPandas(per_patch, schema=schema)


def greedy_coreset(feats: np.ndarray, ratio: float, seed: int, k_max: int | None = None) -> np.ndarray:
    """M11: approximate greedy k-center (driver-side, mirrors
    sampler.py:118-174): iterative argmax of min-distance to the picked set.
    Returns selected row indices. ``k_max`` bounds the O(k·n) loop — the
    reference's own 'approximate greedy' justification (sampler.py:134-137)."""
    n = len(feats)
    k = max(1, int(round(n * ratio)))
    if k_max is not None:
        k = min(k, k_max)
    rs = np.random.RandomState(seed)
    start = int(rs.randint(n))
    picked = [start]
    dmin = np.linalg.norm(feats - feats[start], axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(dmin))
        picked.append(nxt)
        dmin = np.minimum(dmin, np.linalg.norm(feats - feats[nxt], axis=1))
    return np.asarray(picked)


def fit_memory_bank(train_windows: DataFrame, cfg: SoftPatchConfig) -> np.ndarray:
    """Fit = embed → denoise-weight → weight-filter → greedy coreset."""
    return fit_memory_bank_from_embedded(embed_windows(train_windows, cfg), cfg)


def fit_memory_bank_from_embedded(embedded: DataFrame, cfg: SoftPatchConfig) -> np.ndarray:
    """Fit from an already-embedded patch DataFrame (lets callers embed the
    corpus once and share it between fit and scoring).

    The collect() here is the reference's own design point: the candidate
    bank after filtering is ≪ the corpus (10⁴-10⁶ rows), and greedy k-center
    is sequential — so it runs on the driver, and the resulting bank is
    broadcast back for scoring (SURVEY.md §4.2)."""
    weighted = patch_weights(embedded, cfg)
    weighted.persist()  # two actions below (percentile + collect) share lineage
    cut = weighted.agg(
        F.percentile("weight", F.lit(1.0 - cfg.weight_quantile)).alias("q")
    ).collect()[0]["q"]
    kept = weighted.filter(F.col("weight") <= F.lit(float(cut)))
    # Deterministic candidate order → deterministic coreset (greedy k-center
    # picks by row index; unordered collect would vary with partitioning).
    pdf = kept.orderBy(SID, "window_start", "patch_idx").select("feature", "weight").toPandas()
    weighted.unpersist()
    feats = np.stack(pdf["feature"].to_numpy())
    w_all = pdf["weight"].to_numpy()
    if len(feats) > cfg.candidate_cap:  # deterministic stride subsample
        stride_idx = np.linspace(0, len(feats) - 1, cfg.candidate_cap).astype(int)
        feats, w_all = feats[stride_idx], w_all[stride_idx]
    idx = greedy_coreset(feats, cfg.coreset_ratio, cfg.seed, k_max=cfg.coreset_max)
    # J6 soft-weighting (softpatch.py:376-380): each bank row keeps its
    # denoising weight, normalized to [0,1]; scores multiply by the matched
    # row's weight so matches to noisy bank points score lower confidence.
    w = w_all[idx]
    w_norm = w / w.max() if w.max() > 0 else np.ones_like(w)
    return np.hstack([feats[idx], w_norm[:, None]])


def score_windows(test_windows: DataFrame, bank: np.ndarray, cfg: SoftPatchConfig) -> DataFrame:
    """M12/M13: 1-NN L2 distance to the broadcast bank per patch; window score
    = max patch score (W10). Exact search in a vectorized mapInPandas island —
    the IndexFlatL2 analog; swap in LSH/IVF for billion-row banks."""
    return score_embedded(embed_windows(test_windows, cfg), bank)


def score_embedded(embedded: DataFrame, bank: np.ndarray) -> DataFrame:
    """Score an already-embedded patch DataFrame against the broadcast bank."""
    sc = embedded.sparkSession.sparkContext
    bank_b = sc.broadcast(np.ascontiguousarray(bank))

    schema = T.StructType(
        [
            T.StructField("series_id", T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_label", T.IntegerType()),
            T.StructField("patch_idx", T.IntegerType()),
            T.StructField("patch_score", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bank_full = bank_b.value
        bk, bk_w = bank_full[:, :-1], bank_full[:, -1]  # features | J6 weights
        bk_sq = (bk * bk).sum(axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["feature"].to_numpy())
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ bk.T) + bk_sq[None, :]
            nn_idx = d2.argmin(axis=1)
            # J6: distance × matched bank row's denoising weight
            score = np.sqrt(np.maximum(d2[np.arange(len(x)), nn_idx], 0.0)) * bk_w[nn_idx]
            yield pd.DataFrame(
                {
                    "series_id": pdf["series_id"],
                    "window_start": pdf["window_start"],
                    "window_label": pdf["window_label"],
                    "patch_idx": pdf["patch_idx"],
                    "patch_score": score,
                }
            )

    patch_scores = embedded.mapInPandas(gen, schema=schema)
    return patch_scores.groupBy(SID, "window_start", "window_label").agg(
        F.max("patch_score").alias("score")
    )


def softpatch_scores(windows: DataFrame, cfg: SoftPatchConfig | None = None) -> DataFrame:
    """End-to-end M7-M13: train on clean windows, score all windows, min-max
    normalize scores globally (M13). Returns
    (series_id, window_start, window_label, score, score_norm)."""
    cfg = cfg or SoftPatchConfig()
    # Embed the whole corpus ONCE; fit consumes the clean subset, scoring the
    # full set — the expensive windows→channels→projection pass is shared.
    embedded = embed_windows(windows, cfg)
    embedded.persist()
    bank = fit_memory_bank_from_embedded(embedded.filter(F.col("window_label") == 0), cfg)
    scored = score_embedded(embedded, bank)
    scored.persist()  # min/max action + the caller's collect share lineage
    lo_hi = scored.agg(F.min("score").alias("lo"), F.max("score").alias("hi")).collect()[0]
    lo, hi = float(lo_hi["lo"]), float(lo_hi["hi"])
    rng = (hi - lo) or 1.0
    return scored.withColumn("score_norm", (F.col("score") - F.lit(lo)) / F.lit(rng))
