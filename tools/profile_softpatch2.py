"""Fine-grained warm-session stage profile for the softpatch family.

Run: python tools/profile_softpatch2.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.session import (
    get_spark,
)

spark = get_spark("profile2")
spark.range(1).count()

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml import (
    softpatch as SP,
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

cfg = SP.SoftPatchConfig()


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s")
    return out


# ---- warm everything once (first pass, untimed beyond totals) ----
ev = load_table(spark, sf_dir, "events")
t("warm: events count", lambda: ev.count())
points = AN.inject_anomalies(AN.prepared_series(ev))
t("warm: points count", lambda: points.count())
win = day_windows(points)
t("warm: day_windows count", lambda: win.count())
emb = SP.embed_windows(win, cfg)
t("warm: embed count (no persist)", lambda: emb.count())

# ---- timed warm stages ----
t("points count (warm2)", lambda: points.count())
t("day_windows count (warm2)", lambda: win.count())
t("embed count (warm2)", lambda: emb.count())

emb.persist()
t("embed persist+count", lambda: emb.count())

train = emb.filter(F.col("window_label") == 0)
weighted = t("patch_weights build+persist+count", lambda: (lambda w: (w.persist(), w.count())[0])(SP.patch_weights(train, cfg)))

t(
    "gaussian_patch_stats (moments collect)",
    lambda: SP.gaussian_patch_stats(train, cfg),
)
row = t(
    "percentile+count agg",
    lambda: weighted.agg(
        F.percentile("weight", F.lit(1.0 - cfg.weight_quantile)).alias("q"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0],
)
cut = row["q"]
kept = weighted.filter(F.col("weight") <= F.lit(float(cut)))
pdf = t(
    "kept orderBy+toPandas",
    lambda: kept.orderBy("series_id", "window_start", "patch_idx")
    .select("feature", "weight")
    .toPandas(),
)
feats = np.stack(pdf["feature"].to_numpy())
print(f"  candidates: {feats.shape}")
idx = t("greedy_coreset driver loop", lambda: SP.greedy_coreset(feats, cfg.coreset_ratio, cfg.seed, k_max=cfg.coreset_max))
w_all = pdf["weight"].to_numpy()
w = w_all[idx]
w_norm = w / w.max() if w.max() > 0 else np.ones_like(w)
bank = np.hstack([feats[idx], w_norm[:, None]])

scored = SP.score_embedded(emb, bank)
t("score+collect", lambda: scored.collect())

# LOF path
t("lof weights (current 3-part sort) count", lambda: SP._lof_patch_weights(train, cfg).count())

# ANN scale mode
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml.mllib_modes import (
    det_ann_scores,
)

t("det_ann_scores collect", lambda: det_ann_scores(emb).collect())
