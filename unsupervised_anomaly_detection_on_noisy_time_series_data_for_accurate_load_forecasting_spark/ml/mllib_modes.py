"""MLlib scale modes for the memory-bank pipeline.

The parity modes (ml/softpatch.py) mirror the reference's sequential
algorithms (greedy k-center on the driver, exact 1-NN against a broadcast
bank). These MLlib modes are the *distributed* alternatives for banks that
outgrow a driver/broadcast — flagged in SURVEY.md §4.2:

- M11 scale mode: KMeans(k)‖ replaces greedy k-center — cluster centers are
  the coreset. Fully distributed, JVM-side.
- J5/M12 scale mode: BucketedRandomProjectionLSH approxSimilarityJoin
  replaces the broadcast cdist — an ANN join that shuffles on hash buckets
  instead of materializing N×M distances.

Both operate on the same embedded-patch DataFrame contract
(series_id, window_start, patch_idx, feature ARRAY<DOUBLE>).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_coreset(embedded: DataFrame, k: int = 256, seed: int = 42) -> DataFrame:
    """M11 scale mode: k cluster centers as the memory bank.

    Returns (center_id, feature ARRAY<DOUBLE>). KMeans|| init, fixed seed —
    deterministic for a fixed partitioning of the input."""
    vecs = embedded.select(array_to_vector(F.col("feature")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=10).fit(vecs)
    spark = embedded.sparkSession
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(centers, "center_id int, feature array<double>")


def lsh_nn_join(
    bank: DataFrame, queries: DataFrame, threshold: float = 10.0, bucket_length: float = 1.0
) -> DataFrame:
    """J5/M12 scale mode: approximate NN join query-patches ↔ bank.

    Output: (query cols..., center_id, l2_dist) for pairs within `threshold`;
    downstream takes min(l2_dist) per query key — the ANN analog of the exact
    broadcast scoring. Both sides shuffle on LSH buckets; neither is
    broadcast, so the bank can be arbitrarily large."""
    b = bank.withColumn("features", array_to_vector(F.col("feature")))
    q = queries.withColumn("features", array_to_vector(F.col("feature")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, numHashTables=4, seed=42
    )
    model = lsh.fit(b)
    joined = model.approxSimilarityJoin(q, b, threshold, distCol="l2_dist")
    return joined.select(
        F.col("datasetA.series_id").alias("series_id"),
        F.col("datasetA.window_start").alias("window_start"),
        F.col("datasetA.patch_idx").alias("patch_idx"),
        F.col("datasetB.center_id").alias("center_id"),
        F.col("l2_dist"),
    )


def ann_window_scores(embedded: DataFrame, bank: DataFrame, threshold: float = 10.0) -> DataFrame:
    """Window score via the ANN join: min patch distance → max over patches
    (W10), matching the exact pipeline's shape with distributed physops."""
    nn = lsh_nn_join(bank, embedded, threshold=threshold)
    patch_min = nn.groupBy("series_id", "window_start", "patch_idx").agg(
        F.min("l2_dist").alias("patch_score")
    )
    return patch_min.groupBy("series_id", "window_start").agg(
        F.max("patch_score").alias("score")
    )
