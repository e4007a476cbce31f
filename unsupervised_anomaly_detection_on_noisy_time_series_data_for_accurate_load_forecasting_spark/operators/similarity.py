"""Similarity search over embedding columns: exact brute-force cosine top-k
(the correctness baseline) and random-hyperplane LSH bucketing (the scale
path for all-pairs near-dup at 100 TB).

Layout choice: embeddings explode to long form (vec_id, dim_idx, x) so dot
products become decimal-exact grouped sums — reproducible across engines and
partitionings — and the query side broadcasts (it is always the small side).
The LSH projection weights come from the deterministic hash-counter RNG keyed
on (dim, hyperplane), so both engines derive the identical "random" matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.exact import dsum
from ..functions.rng import rng_uniform

DIM = 64
N_PLANES = 8
PLANE_SALT = 100


def embeddings_long(df: DataFrame) -> DataFrame:
    """(vec_id, i, x): 1-based dim index, value widened float→double."""
    return df.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x"))


def norms(long: DataFrame) -> DataFrame:
    return long.groupBy("vec_id").agg(dsum(F.col("x") * F.col("x")).alias("sq"))


def cosine_topk(df: DataFrame, n_queries: int = 100, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries vs the full corpus.

    The query side is broadcast (n_queries·DIM rows); the corpus streams
    through one grouped decimal-exact dot-product aggregation. Deterministic
    ranking: (cosine DESC, neighbor ASC)."""
    long = embeddings_long(df)
    nm = norms(long)
    q = long.filter(F.col("vec_id") < n_queries)
    dots = (
        F.broadcast(q.select(F.col("vec_id").alias("qid"), "i", F.col("x").alias("qx")))
        .join(long.select(F.col("vec_id").alias("nid"), "i", "x"), "i")
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid")
        .agg(dsum(F.col("qx") * F.col("x")).alias("dot"))
    )
    qn = nm.select(F.col("vec_id").alias("qid"), F.col("sq").alias("qsq"))
    tn = nm.select(F.col("vec_id").alias("nid"), F.col("sq").alias("nsq"))
    cos = (
        dots.join(F.broadcast(qn), "qid")
        .join(F.broadcast(tn), "nid")
        .withColumn("cosine", F.col("dot") / F.sqrt(F.col("qsq") * F.col("nsq")))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cosine", "rk")
    )


def lsh_buckets(df: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane signature: bit_k = sign(Σ_i x_i · w(i,k)) with
    w(i,k) = 2·U(i,k)−1 from the deterministic RNG. Per-vector key, no
    shuffle until the bucket groupBy."""
    long = embeddings_long(df)
    planes = (
        long.select("vec_id", "i", "x")
        .join(
            F.broadcast(
                long.select("i").distinct().crossJoin(
                    df.sparkSession.range(n_planes).select(F.col("id").cast("int").alias("k"))
                )
            ).withColumn(
                "w", F.lit(2.0) * rng_uniform(F.col("i"), F.col("k"), salt=PLANE_SALT) - F.lit(1.0)
            ),
            "i",
        )
        .groupBy("vec_id", "k")
        .agg(dsum(F.col("x") * F.col("w")).alias("proj"))
        .withColumn("bit", F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return planes.groupBy("vec_id").agg(
        F.concat_ws("", F.transform(F.array_sort(F.collect_list(F.struct("k", "bit"))), lambda s: s["bit"])).alias(
            "bucket"
        )
    )


def lsh_near_pairs(df: DataFrame, min_cosine: float = 0.25) -> DataFrame:
    """All-pairs near-dup via LSH buckets + exact cosine verify on candidates.

    Scale shape: candidates only form inside buckets (expected tiny), and the
    verify join is semi-pruned to candidate vec_ids before the dot products."""
    buckets = lsh_buckets(df)
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2"))

    long = embeddings_long(df)
    ids = cands.select(F.col("d1").alias("vec_id")).union(cands.select("d2")).distinct()
    pruned = long.join(F.broadcast(ids), "vec_id", "left_semi")
    nm = norms(pruned)
    l1 = pruned.select(F.col("vec_id").alias("d1"), "i", F.col("x").alias("x1"))
    l2 = pruned.select(F.col("vec_id").alias("d2"), "i", F.col("x").alias("x2"))
    dots = (
        cands.join(l1, "d1")
        .join(l2, ["d2", "i"])
        .groupBy("d1", "d2")
        .agg(dsum(F.col("x1") * F.col("x2")).alias("dot"))
    )
    return (
        dots.join(F.broadcast(nm.select(F.col("vec_id").alias("d1"), F.col("sq").alias("sq1"))), "d1")
        .join(F.broadcast(nm.select(F.col("vec_id").alias("d2"), F.col("sq").alias("sq2"))), "d2")
        .withColumn("cosine", F.col("dot") / F.sqrt(F.col("sq1") * F.col("sq2")))
        .filter(F.col("cosine") >= min_cosine)
        .select("d1", "d2", "cosine")
    )
