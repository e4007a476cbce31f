"""Single-node numpy mirror of the softpatch pipeline — the oracle data path
for ml_softpatch_scores / ml_softpatch_eval.

Replicates, on one node and one array at a time, exactly what the Spark plan
computes across the cluster:

    day windows → channel features → projection embedding → two-phase
    gaussian patch weights → percentile cut → (stride cap) → greedy coreset
    bank → 1-NN scoring → min-max normalization

Float discipline: every step either (a) reuses the same pure-numpy helper
the Spark islands run (projection, greedy_coreset), (b) reproduces the
islands' vectorized array ops with row-independent kernels (so Arrow batch
composition cannot change a value), or (c) reproduces Spark's scalar
formulas (percentile interpolation) verbatim. The driver's hash gate then
compares the distributed plan against this mirror bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rng import rng_draw_np
from .softpatch import (
    BUCKET_SALT,
    N_BUCKETS,
    STRIDE_SALT,
    SoftPatchConfig,
    _lof_weights,
    default_backbone,
    greedy_coreset,
)


def day_windows_pd(points: pd.DataFrame, day_size: int = 24) -> pd.DataFrame:
    """Mirror of ml/windows.day_windows over (series_id, ts, value_contam, gt):
    complete days only, arrays sorted by hour, label = any(gt)."""
    df = points.copy()
    secs = df["ts"].values.astype("datetime64[s]").astype("int64")
    df["eday"] = secs // 86400
    df["h"] = (secs % 86400) // 3600
    df = df.sort_values(["series_id", "eday", "h"])
    rows = []
    for (sid, eday), grp in df.groupby(["series_id", "eday"], sort=True):
        if len(grp) != day_size:
            continue
        pts = grp["value_contam"].to_numpy(dtype=np.float64)
        gt = grp["gt"].to_numpy(dtype=np.int64)
        rows.append(
            {
                "series_id": sid,
                "eday": int(eday),
                "points": pts,
                "window_label": int((gt == 1).any()),
            }
        )
    return pd.DataFrame(rows).sort_values(["series_id", "eday"]).reset_index(drop=True)


def embed_pd(windows: pd.DataFrame, cfg: SoftPatchConfig) -> pd.DataFrame:
    """Mirror of softpatch.embed_windows' vectorized island: one long row per
    (window, patch) with the backbone feature vector (the SHARED frozen CNN
    — batch-shape-independent, so one full-matrix pass here equals the
    island's Arrow-batched passes bit-for-bit)."""
    backbone = default_backbone(cfg)
    n_p, p_sz, alpha = cfg.n_patches, cfg.patch_size, cfg.ewma_alpha
    pts = np.stack(windows["points"].to_numpy())
    b = len(pts)
    ps = np.repeat(pts.reshape(b, n_p, p_sz).std(axis=2), p_sz, axis=1)
    ew = np.empty_like(pts)
    acc = pts[:, 0].copy()
    ew[:, 0] = acc
    for t in range(1, pts.shape[1]):
        acc = alpha * pts[:, t] + (1 - alpha) * acc
        ew[:, t] = acc
    ch = np.stack([pts, ps, ew], axis=1)
    frames = []
    for p in range(n_p):
        feats = backbone(ch[:, :, p * p_sz : (p + 1) * p_sz].reshape(b, -1))
        frames.append(
            pd.DataFrame(
                {
                    "series_id": windows["series_id"].to_numpy(),
                    "eday": windows["eday"].to_numpy(),
                    "window_label": windows["window_label"].to_numpy(),
                    "patch_idx": np.full(b, p, dtype=np.int64),
                    "row": np.arange(b),
                    "patch": [feats[i] for i in range(b)],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def gaussian_weights_pd(embedded: pd.DataFrame, cfg: SoftPatchConfig) -> pd.DataFrame:
    """Mirror of the two-phase salted moments + stateless Mahalanobis."""
    emb = embedded.copy()
    emb["bkt"] = (
        rng_draw_np(
            [emb["series_id"].astype("int64").to_numpy(), emb["eday"].to_numpy()],
            salt=BUCKET_SALT,
        )
        % N_BUCKETS
    )
    dim = cfg.embed_dim
    partials: dict[int, list] = {}
    for (p, bkt), grp in emb.groupby(["patch_idx", "bkt"], sort=True):
        grp = grp.sort_values(["series_id", "eday"])
        X = np.stack(grp["patch"].to_numpy())
        partials.setdefault(int(p), []).append((int(bkt), len(X), X.sum(axis=0), (X.T @ X).ravel()))
    stats = {}
    for p, rows in sorted(partials.items()):
        rows = sorted(rows, key=lambda r: r[0])
        n = int(sum(r[1] for r in rows))
        s = np.stack([r[2] for r in rows]).sum(axis=0)
        ss = np.stack([r[3] for r in rows]).sum(axis=0).reshape(dim, dim)
        mean = s / n
        cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1) + 0.01 * np.eye(dim)
        stats[p] = (mean, np.linalg.inv(cov))
    w = np.empty(len(emb))
    pidx = emb["patch_idx"].to_numpy()
    X = np.stack(emb["patch"].to_numpy())
    for p in np.unique(pidx):
        mean, inv = stats[int(p)]
        m = pidx == p
        d = X[m] - mean
        w[m] = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", d, inv, d), 0.0))
    out = emb.copy()
    out["weight"] = w
    return out


def lof_weights_pd(embedded: pd.DataFrame, cfg: SoftPatchConfig) -> pd.DataFrame:
    """Mirror of softpatch._lof_patch_weights: full patch-position groups,
    key-sorted, capped at candidate_cap, scored with the SHARED _lof_weights
    kernel (bit-identical numpy). Rows beyond the cap are dropped, exactly
    like the Spark island."""
    frames = []
    for p, grp in embedded.groupby("patch_idx", sort=True):
        grp = grp.sort_values(["series_id", "eday"]).reset_index(drop=True)
        if len(grp) > cfg.lof_cap:
            grp = grp.iloc[: cfg.lof_cap]
        feats = np.stack(grp["patch"].to_numpy())
        out = grp.copy()
        out["weight"] = _lof_weights(feats)
        frames.append(out)
    return pd.concat(frames, ignore_index=True)


def spark_percentile(values: np.ndarray, q: float) -> float:
    """Spark's exact `percentile` interpolation (and numpy's 'linear'):
    pos = q·(n−1); v = lo + (pos − ⌊pos⌋)·(hi − lo)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    pos = q * (len(v) - 1)
    i = int(np.floor(pos))
    if i + 1 >= len(v):
        return float(v[-1])
    return float(v[i] + (pos - i) * (v[i + 1] - v[i]))


def fit_bank_pd(embedded: pd.DataFrame, cfg: SoftPatchConfig) -> np.ndarray:
    """Mirror of softpatch.fit_memory_bank_from_embedded (clean subset in)."""
    if cfg.weight_mode == "lof":
        weighted = lof_weights_pd(embedded, cfg)
    else:
        weighted = gaussian_weights_pd(embedded, cfg)
    cut = spark_percentile(weighted["weight"].to_numpy(), 1.0 - cfg.weight_quantile)
    kept = weighted[weighted["weight"] <= cut]
    # stride derives from the TOTAL candidate count (one driver job serves
    # both scalars engine-side) — an upper bound on the kept count, so the
    # collect stays ≤ cap either way; must match fit_memory_bank_from_embedded
    if len(weighted) > cfg.candidate_cap:
        stride = -(-len(weighted) // cfg.candidate_cap)
        draws = rng_draw_np(
            [
                kept["series_id"].astype("int64").to_numpy(),
                kept["eday"].to_numpy(),
                kept["patch_idx"].to_numpy(),
            ],
            salt=STRIDE_SALT,
        )
        kept = kept[draws % stride == 0]
    kept = kept.sort_values(["series_id", "eday", "patch_idx"]).reset_index(drop=True)
    feats = np.stack(kept["patch"].to_numpy())
    w_all = kept["weight"].to_numpy()
    idx = greedy_coreset(feats, cfg.coreset_ratio, cfg.seed, k_max=cfg.coreset_max)
    w = w_all[idx]
    w_norm = w / w.max() if w.max() > 0 else np.ones_like(w)
    return np.hstack([feats[idx], w_norm[:, None]])


def score_pd(embedded: pd.DataFrame, bank: np.ndarray) -> pd.DataFrame:
    """Mirror of softpatch.score_embedded: 1-NN × J6 weight, max over
    patches, then global min-max normalization. Uses the SAME
    shape-independent kernel as the Spark island (nn_weighted_scores) —
    a GEMM here vs batched GEMMs there differs in the low bits because
    BLAS picks summation order by matrix shape."""
    from .softpatch import nn_weighted_scores

    X = np.stack(embedded["patch"].to_numpy())
    ps = nn_weighted_scores(X, bank)
    out = embedded[["series_id", "eday", "window_label"]].copy()
    out["patch_score"] = ps
    scored = (
        out.groupby(["series_id", "eday", "window_label"], sort=True)["patch_score"]
        .max()
        .reset_index()
        .rename(columns={"patch_score": "score"})
    )
    lo, hi = float(scored["score"].min()), float(scored["score"].max())
    rng = (hi - lo) or 1.0
    scored["score_norm"] = (scored["score"] - lo) / rng
    return scored


def _qd2_rows(X: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Mirror of mllib_modes._D2Q for a (n, dim) matrix vs one centroid:
    per-element squared diffs in double, tie-free 1e-6 quantization
    (floor(v·1e6 + 0.5) — exact integers), exact integer sum, one correctly
    rounded division back to double. Matches Spark's decimal fold + double
    cast bit-for-bit."""
    q = np.floor((X - c[None, :]) ** 2 * 1e6 + 0.5)
    # integer-valued doubles; sums stay far below 2^53 so the fold is exact
    return q.sum(axis=1) / 1e6


def det_ann_scores_pd(
    embedded: pd.DataFrame, n_bank: int = 64, n_lists: int = 8, n_probe: int = 2
) -> pd.DataFrame:
    """Mirror of mllib_modes.det_ann_scores over the embed_pd long frame:
    seeded-subset bank → IVF cell assignment → n_probe scan → min patch
    distance → max over patches → sqrt. Returns (series_id, eday, score)."""
    from .mllib_modes import ANN_BANK_SALT

    emb = embedded.reset_index(drop=True)
    draws = rng_draw_np(
        [
            emb["series_id"].astype("int64").to_numpy(),
            emb["eday"].to_numpy(),
            emb["patch_idx"].to_numpy(),
        ],
        salt=ANN_BANK_SALT,
    )
    order = np.lexsort(
        (
            emb["patch_idx"].to_numpy(),
            emb["eday"].to_numpy(),
            emb["series_id"].astype("int64").to_numpy(),
            draws,
        )
    )[:n_bank]
    bank = np.stack(emb["patch"].iloc[order].to_numpy())  # bank_id = row + 1
    cells = bank[:n_lists]  # cell = row + 1
    # bank → nearest cell (ties broken by lowest cell id, like the row_number)
    bank_cell = np.empty(len(bank), dtype=np.int64)
    for i in range(len(bank)):
        d = _qd2_rows(cells, bank[i])
        bank_cell[i] = int(np.argmin(d))  # argmin takes the first minimum
    scores: dict[tuple, float] = {}
    X = np.stack(emb["patch"].to_numpy())
    sid = emb["series_id"].to_numpy()
    eday = emb["eday"].to_numpy()
    for i in range(len(emb)):
        cd = _qd2_rows(cells, X[i])
        probe_cells = np.lexsort((np.arange(n_lists), cd))[:n_probe]
        cand = np.isin(bank_cell, probe_cells)
        d2min = float(_qd2_rows(bank[cand], X[i]).min())
        key = (sid[i], int(eday[i]))
        scores[key] = max(scores.get(key, -np.inf), d2min)
    rows = [
        {"series_id": k[0], "eday": k[1], "score": float(np.sqrt(v))}
        for k, v in scores.items()
    ]
    return pd.DataFrame(rows).sort_values(["series_id", "eday"]).reset_index(drop=True)


def softpatch_scores_pd(points: pd.DataFrame, cfg: SoftPatchConfig | None = None) -> pd.DataFrame:
    """End-to-end mirror: returns (series_id, eday, window_label, score,
    score_norm) — the expected values for the distributed plan."""
    cfg = cfg or SoftPatchConfig()
    windows = day_windows_pd(points, cfg.day_size)
    embedded = embed_pd(windows, cfg)
    bank = fit_bank_pd(embedded[embedded["window_label"] == 0], cfg)
    return score_pd(embedded, bank)
