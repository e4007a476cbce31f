"""Similarity search over embedding columns: exact brute-force cosine top-k
(the correctness baseline) and random-hyperplane LSH bucketing (the scale
path for all-pairs near-dup at 100 TB).

Execution shape: vectors stay as ARRAY columns end-to-end — dot products are
`zip_with` + decimal `aggregate` folds inside whole-stage codegen (no explode,
no join-per-dimension). Decimal accumulation is associative, so the result is
bit-identical to the oracle's long-form decimal sums while running at
array-kernel speed. The query side of every join is broadcast.

The LSH projection weights come from the deterministic hash-counter RNG keyed
on (dim, hyperplane), so both engines derive the identical "random" matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.exact import qround
from ..functions.rng import rng_uniform_sql

DIM = 64
N_BANDS = 4
PLANES_PER_BAND = 8
N_PLANES = N_BANDS * PLANES_PER_BAND  # total hyperplanes across all bands
PLANE_SALT = 100
BUCKET_CAP = 2000  # per-(band, bucket) member cap — bounds the self-join quadratic


def ddot_expr(a: str, b: str) -> str:
    """Decimal-exact dot product of two (float) array columns.

    Each element product is computed in double (matching the oracle's
    widened long form), rounded once to DECIMAL(27,6), and summed exactly —
    associativity makes the fold order irrelevant."""
    return (
        f"cast(aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as decimal(38,6)), (acc, v) -> acc + cast(floor(v * 1000000.0 + 0.5) / 1000000.0 as decimal(27,6))) as double)"
    )


def fdot_expr(a: str, b: str) -> str:
    """Fast double-precision dot product (plain FP fold, no BigDecimal).

    Used only as a pre-filter. The decimal path quantizes each element
    product at 1e-6, so |fdot − ddot| ≤ DIM·5e-7 ≈ 3.2e-5 (quantization
    dominates fp drift). Filtering at (threshold − MARGIN) with MARGIN well
    above that keeps a deterministic superset of the exact result; the
    decimal path then decides the boundary exactly."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


MARGIN = 1e-3  # ≫ DIM·(decimal quantization step)/2, ≪ meaningful data gaps
# MARGIN bounds the *dot product* error; the induced cosine error is
# MARGIN/(‖q‖·‖n‖), so the superset guarantee assumes norm products ≳ 0.03
# (unit-ish embeddings — true for every supported fixture). Zero-norm
# vectors are excluded up front (they have no defined cosine at all);
# sub-0.03-norm corpora should scale MARGIN by 1/min(‖q‖·‖n‖).


def dnorm_sq(col: str = "embedding") -> Column:
    return F.expr(ddot_expr(col, col))


def cosine_topk(df: DataFrame, n_queries: int = 100, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries vs the full corpus.

    Broadcast the (tiny) query side against the streaming corpus; one
    codegen'd dot product per pair; deterministic ranking
    (cosine DESC, neighbor ASC)."""
    e = df.select("vec_id", "embedding").withColumn("sq", dnorm_sq()).filter(F.col("sq") > 0)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"), F.col("sq").alias("qsq")
    )
    pairs = (
        e.select(F.col("vec_id").alias("nid"), "embedding", F.col("sq").alias("nsq"))
        .join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn("cos_fast", F.expr(fdot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("nsq")))
    )
    # Fast pre-rank keeps everything within MARGIN of the fast kth score —
    # a deterministic superset of the exact top-k — then the decimal path
    # decides the final ranking exactly.
    wf = W.partitionBy("qid").orderBy(F.col("cos_fast").desc(), F.col("nid").asc())
    kth = F.max(F.when(F.col("rkf") == k, F.col("cos_fast"))).over(W.partitionBy("qid"))
    survivors = (
        pairs.withColumn("rkf", F.row_number().over(wf))
        .withColumn("kth_fast", F.coalesce(kth, F.lit(-2.0)))  # <k pairs: keep all
        .filter(F.col("cos_fast") >= F.col("kth_fast") - F.lit(MARGIN))
    )
    exact = survivors.withColumn(
        "cosine", F.expr(ddot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("nsq"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cosine", "rk")
    )


def hard_negatives_topk(
    df: DataFrame, n_queries: int = 100, k: int = 3, label_col: str = "label"
) -> DataFrame:
    """Contrastive hard-negative mining — for each query vector, the top-k
    highest-cosine corpus vectors with a DIFFERENT label: the pairs a
    metric-learning / embedding fine-tune actually trains on (the nearest
    same-label neighbors are trivial positives; the nearest OTHER-label
    neighbors are the gradient-bearing negatives).

    Same scale shape as :func:`cosine_topk`: the query side (n_queries
    rows) broadcasts against the streaming corpus — one codegen'd FP dot
    per pair as a deterministic pre-filter (everything within MARGIN of
    the fast kth score survives), decimal-exact re-rank on the survivors,
    per-query windows only. The label-disagreement predicate rides the
    broadcast join condition, so mismatched pairs never materialize."""
    e = (
        df.select("vec_id", "embedding", label_col)
        .withColumn("sq", dnorm_sq())
        .filter(F.col("sq") > 0)
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("sq").alias("qsq"),
        F.col(label_col).alias("q_label"),
    )
    pairs = (
        e.select(
            F.col("vec_id").alias("nid"),
            "embedding",
            F.col("sq").alias("nsq"),
            F.col(label_col).alias("n_label"),
        )
        .join(
            F.broadcast(q),
            (F.col("qid") != F.col("nid")) & (F.col("q_label") != F.col("n_label")),
        )
        .withColumn(
            "cos_fast",
            F.expr(fdot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("nsq")),
        )
    )
    wf = W.partitionBy("qid").orderBy(F.col("cos_fast").desc(), F.col("nid").asc())
    kth = F.max(F.when(F.col("rkf") == k, F.col("cos_fast"))).over(W.partitionBy("qid"))
    survivors = (
        pairs.withColumn("rkf", F.row_number().over(wf))
        .withColumn("kth_fast", F.coalesce(kth, F.lit(-2.0)))
        .filter(F.col("cos_fast") >= F.col("kth_fast") - F.lit(MARGIN))
    )
    exact = survivors.withColumn(
        "cosine", F.expr(ddot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("nsq"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "q_label", "nid", "n_label", "cosine", "rk")
    )


def _plane_matrix(n_planes: int = N_PLANES) -> "list[list[float]]":
    """The hyperplane weights w(i,k) = 2·U(i,k)−1, materialized ONCE on the
    driver from the shared RNG model. Bit-identical to what the SQL mirror
    derives per row (`2.0*(draw/M)−1.0` on exact integer draws), but paid
    once per query instead of per row×plane×dim."""
    import numpy as np

    from ..functions.rng import M, rng_draw_np

    ks, is_ = np.meshgrid(
        np.arange(n_planes, dtype=np.int64), np.arange(1, DIM + 1, dtype=np.int64), indexing="ij"
    )
    u = rng_draw_np([is_.ravel(), ks.ravel()], salt=PLANE_SALT).astype(np.float64) / float(M)
    return (2.0 * u - 1.0).reshape(n_planes, DIM).tolist()


def _bucket_expr(n_planes: int = N_PLANES) -> str:
    """Hyperplane signature: bit_k = sign(Σ_i x_i · w_k) with the plane
    weights inlined as double literals (exact round-trip via repr).

    Two-speed sign decision per plane: a plain-double fold decides every
    plane whose |projection| clears the decimal-quantization error bound
    (nearly all); only projections inside ±MARGIN re-run the BigDecimal
    fold (CASE branches evaluate lazily). The signature stays bit-identical
    to the all-decimal long-form oracle at double-fold speed."""
    planes = _plane_matrix(n_planes)
    bits = []
    for k in range(n_planes):
        w_k = "array(" + ",".join(repr(w) + "D" for w in planes[k]) + ")"
        prods = f"zip_with(embedding, {w_k}, (x, w) -> cast(x as double) * w)"
        fproj = f"aggregate({prods}, cast(0 as double), (acc, v) -> acc + v)"
        dproj = (
            f"cast(aggregate({prods}, "
            f"cast(0 as decimal(38,6)), (acc, v) -> acc + cast(floor(v * 1000000.0 + 0.5) / 1000000.0 as decimal(27,6))) as double)"
        )
        bits.append(
            f"case when {fproj} > {MARGIN} then '1' "
            f"when {fproj} < -{MARGIN} then '0' "
            f"when {dproj} >= 0 then '1' else '0' end"
        )
    return "concat_ws(''," + ",".join(bits) + ")"


def lsh_buckets(df: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    return df.select("vec_id", "embedding").withColumn("bucket", F.expr(_bucket_expr(n_planes)))


def banded_buckets(df: DataFrame, bucket_cap: int | None = BUCKET_CAP) -> DataFrame:
    """Multi-table (banded) LSH: the full `N_PLANES`-bit signature is split
    into `N_BANDS` bands of `PLANES_PER_BAND` bits; a pair is a candidate if
    it collides in ANY band. Versus one long signature this trades a few
    extra shuffled rows (×N_BANDS) for recall that doesn't collapse as the
    corpus grows; versus one short signature it keeps bucket populations —
    and therefore the self-join quadratic — small.

    ``bucket_cap`` bounds every (band, bucket) population deterministically
    (lowest vec_ids survive, SQL-mirrorable). Oversized buckets mean the
    planes stopped discriminating (duplicate-heavy corpora); the cap turns a
    quadratic blow-up into a reported truncation — see lsh_band_stats for
    the visibility query (no silent caps)."""
    sig = df.select("vec_id", "embedding").withColumn("sig", F.expr(_bucket_expr(N_PLANES)))
    r = PLANES_PER_BAND
    bands = sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, substring(sig, b * {r} + 1, {r}) AS bucket))"
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if bucket_cap is not None:
        rk = F.row_number().over(W.partitionBy("band", "bucket").orderBy("vec_id"))
        bands = bands.withColumn("_rk", rk).filter(F.col("_rk") <= bucket_cap).drop("_rk")
    return bands


IVF_SALT = 53


def ivf_cells(
    df: DataFrame, n_queries: int = 100, n_lists: int = 16, n_probe: int = 4
) -> tuple[DataFrame, DataFrame]:
    """Coarse IVF cell structure shared by :func:`ivf_topk` (exact-cosine
    refine) and :func:`ivfpq_topk` (PQ-ADC refine): assign every corpus
    vector to its nearest cell, and every query to its ``n_probe`` nearest
    cells.

    The coarse quantizer is a **deterministic seeded corpus subset** (the
    n_lists vectors minimizing the cross-engine RNG hash of their id) — the
    FAISS "arbitrary quantizer" pattern. That keeps the whole plan, cell
    assignment included, exactly reproducible in the SQL oracle; swap in
    KMeans‖ centroids (ml/mllib_modes.kmeans_coreset) when cell balance
    matters more than cross-engine verifiability.

    Returns ``(corpus, probes)``: corpus = (vec_id, embedding, sq, cell)
    with exactly one row per vector; probes = (qid, qemb, qsq, cell) with
    ``n_probe`` rows per query id below ``n_queries``. Distances are
    decimal-exact, so both frames are partition-independent."""
    from ..functions.rng import rng_draw

    e = df.select("vec_id", "embedding").withColumn("sq", dnorm_sq())
    picked = (
        e.withColumn("_d", rng_draw(F.col("vec_id"), salt=IVF_SALT))
        .orderBy("_d", "vec_id")  # TakeOrdered: n_lists rows, distributed
        .limit(n_lists)
    )
    centroids = picked.select(
        F.row_number().over(W.orderBy("_d", "vec_id")).alias("cell"),  # 16 rows
        F.col("embedding").alias("centroid"),
    )

    # nearest cells, two-speed: a plain-double squared-L2 ranks all n_lists
    # cells; only cells within the error margin of the row's deepest needed
    # rank (1 for corpus assignment, n_probe for query probing) pay the
    # decimal-exact fold, which then decides the ranking exactly. A cell
    # outside the margin has decimal distance strictly above the decimal
    # rank-``need`` value (|fast − decimal| ≤ margin/2 per fold), so the
    # pruned decimal ranking selects identical rows at ~need/n_lists of the
    # BigDecimal cost.
    dist2 = (
        "cast(aggregate(zip_with(embedding, centroid, "
        "(x, c) -> (cast(x as double) - cast(c as double)) * (cast(x as double) - cast(c as double))), "
        "cast(0 as decimal(38,6)), (acc, v) -> acc + cast(floor(v * 1000000.0 + 0.5) / 1000000.0 as decimal(27,6))) as double)"
    )
    fdist2 = (
        "aggregate(zip_with(embedding, centroid, "
        "(x, c) -> (cast(x as double) - cast(c as double)) * (cast(x as double) - cast(c as double))), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    d2_margin = F.lit(1e-3) + F.lit(1e-9) * F.greatest(F.col("_kth"), F.lit(0.0))
    need = F.when(F.col("vec_id") < n_queries, F.lit(n_probe)).otherwise(F.lit(1))
    vkey = W.partitionBy("vec_id")
    kth_fast = F.max(F.when(F.col("frk") == F.col("_need"), F.col("fdist"))).over(vkey)
    assign = (
        e.crossJoin(F.broadcast(centroids))
        .withColumn("fdist", F.expr(fdist2))
        .withColumn("_need", need)
        .withColumn(
            "frk",
            F.row_number().over(vkey.orderBy(F.col("fdist").asc(), F.col("cell").asc())),
        )
        # When fewer cells exist than the deepest needed rank (n_lists <
        # n_probe), no row carries frk == _need and the windowed max is
        # NULL; a NULL threshold must keep every cell, not filter them all.
        .withColumn("_kth", F.coalesce(kth_fast, F.lit(float("inf"))))
        .filter(F.col("fdist") <= F.col("_kth") + d2_margin)
        .withColumn("cdist", F.expr(dist2))
        .withColumn(
            "crk",
            F.row_number().over(vkey.orderBy(F.col("cdist").asc(), F.col("cell").asc())),
        )
    )
    corpus = assign.filter(F.col("crk") == 1).select("vec_id", "embedding", "sq", "cell")
    probes = (
        assign.filter((F.col("vec_id") < n_queries) & (F.col("crk") <= n_probe))
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"), F.col("sq").alias("qsq"), "cell")
    )
    return corpus, probes


def ivf_topk(
    df: DataFrame, n_queries: int = 100, k: int = 5, n_lists: int = 16, n_probe: int = 4
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into `n_lists`
    cells (:func:`ivf_cells`); each query scans only its `n_probe` nearest
    cells with the exact two-speed cosine.

    Scale shape: centroids are tiny and broadcast; the corpus is bucketed
    once (one shuffle on cell id); a query touches n_probe/n_lists of the
    data instead of all of it. Distances are decimal-exact (same as the
    brute-force baseline), so assignment and ranking are partition-
    independent; recall is approximate by design (tests/test_ann_recall.py
    pins the bound against brute force)."""
    corpus, probes = ivf_cells(df, n_queries=n_queries, n_lists=n_lists, n_probe=n_probe)
    # candidate ranking, two-speed (same shape as cosine_topk): fast cosine
    # pre-rank keeps everything within MARGIN of the fast kth — a provable
    # superset of the exact top-k — then the decimal path decides exactly.
    pairs = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .withColumn(
            "cos_fast", F.expr(fdot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("sq"))
        )
    )
    wf = W.partitionBy("qid").orderBy(F.col("cos_fast").desc(), F.col("vec_id").asc())
    kth_cos = F.max(F.when(F.col("rkf") == k, F.col("cos_fast"))).over(W.partitionBy("qid"))
    survivors = (
        pairs.withColumn("rkf", F.row_number().over(wf))
        .withColumn("kth_fast", F.coalesce(kth_cos, F.lit(-2.0)))  # <k pairs: keep all
        .filter(F.col("cos_fast") >= F.col("kth_fast") - F.lit(MARGIN))
        .withColumn("cosine", F.expr(ddot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("sq")))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "cosine", "rk")
    )


def lsh_near_pairs(
    df: DataFrame,
    min_cosine: float = 0.25,
    bucket_cap: int | None = BUCKET_CAP,
    bands: DataFrame | None = None,
) -> DataFrame:
    """All-pairs near-dup via banded LSH + exact cosine verify on candidates.

    Scale shape: pairs only form inside (band, bucket) groups, bucket
    populations are capped, the self-join shuffles on the bucket key, a
    cross-band row_number dedups pairs that collide in several bands, and
    each candidate is verified with one codegen'd dot product.

    ``bands``: pass a precomputed (ideally persisted) banded_buckets result
    to share the 32-projection signature pass across several consumers —
    the signature is the dominant scan cost."""
    b = bands if bands is not None else banded_buckets(df, bucket_cap=bucket_cap)
    b = b.withColumn("sq", dnorm_sq()).filter(F.col("sq") > 0)
    a, c = b.alias("a"), b.alias("b")
    multi = a.join(
        c,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.band").alias("band"),
        F.col("a.vec_id").alias("d1"),
        F.col("b.vec_id").alias("d2"),
        F.col("a.embedding").alias("e1"),
        F.col("b.embedding").alias("e2"),
        F.col("a.sq").alias("sq1"),
        F.col("b.sq").alias("sq2"),
    )
    # a pair colliding in several bands must be verified exactly once
    first_band = F.row_number().over(W.partitionBy("d1", "d2").orderBy("band"))
    cands = multi.withColumn("_fb", first_band).filter(F.col("_fb") == 1).drop("_fb", "band")
    # Fast double dot prunes the bucket pairs (superset within MARGIN);
    # the decimal-exact dot decides the threshold boundary.
    survivors = cands.filter(
        F.expr(fdot_expr("e1", "e2")) / F.sqrt(F.col("sq1") * F.col("sq2"))
        >= F.lit(min_cosine - MARGIN)
    )
    return (
        survivors.withColumn(
            "cosine", F.expr(ddot_expr("e1", "e2")) / F.sqrt(F.col("sq1") * F.col("sq2"))
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("d1", "d2", "cosine")
    )


def lsh_band_stats(
    df: DataFrame, bucket_cap: int | None = BUCKET_CAP, bands: DataFrame | None = None
) -> DataFrame:
    """Band diagnostics — makes the cap visible (no silent truncation):
    per band, bucket count, max (capped) population, and the candidate-pair
    count Σ c·(c−1)/2 the self-join will materialize."""
    b = bands if bands is not None else banded_buckets(df, bucket_cap=bucket_cap)
    sizes = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("c"))
    return sizes.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_bucket"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("bigint").alias("n_cand_pairs"),
    )


_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * cast(y as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)


def sq8_quantize(df: DataFrame) -> DataFrame:
    """SQ8 symmetric scalar quantization of the embedding column: per vector,
    q_i = floor(x_i · 127 / max|x| + 0.5) stored as tinyint — 8× smaller than
    the float64 the folds widen to, 4× smaller at rest than float32. Cosine
    is scale-invariant, so the per-vector scale cancels and never needs to be
    carried: cos_q = dot(qa, qb) / √(‖qa‖²·‖qb‖²) on pure integers.

    The tie-free floor(+0.5) quantizer and the integer dot products make the
    whole pipeline bit-exact across engines with NO decimal machinery —
    integer sums are exact, the final sqrt/division are single correctly-
    rounded IEEE ops. Zero vectors (max|x| = 0) are excluded, mirroring the
    zero-norm exclusion of the float path."""
    mx = F.expr("array_max(transform(embedding, v -> abs(cast(v as double))))")
    return (
        df.select("vec_id", "embedding")
        .withColumn("_mx", mx)
        .filter(F.col("_mx") > 0)
        .withColumn(
            "q8",
            F.expr(
                "transform(embedding, v -> "
                "cast(floor(cast(v as double) * 127.0D / _mx + 0.5D) as tinyint))"
            ),
        )
        .withColumn("n8", F.expr(_IDOT.format(a="q8", b="q8")))
        .select("vec_id", "q8", "n8")
    )


def sq8_topk(df: DataFrame, n_queries: int = 100, k: int = 5) -> DataFrame:
    """Quantized brute-force cosine top-k — the memory/bandwidth scale mode
    of :func:`cosine_topk`. At 100 TB the embedding shuffle is the cost;
    int8 vectors cut it 4× (vs float32 at rest) while the integer dot
    product fold stays inside whole-stage codegen with no BigDecimal at all
    (the float path needs decimal folds for cross-engine exactness; integer
    arithmetic is exact by construction). Ranking: cos_q DESC, nid ASC."""
    e = sq8_quantize(df)
    q = e.select(
        F.col("vec_id").alias("qid"), F.col("q8").alias("qq8"), F.col("n8").alias("qn8")
    ).filter(F.col("qid") < n_queries)
    pairs = (
        e.select(F.col("vec_id").alias("nid"), "q8", "n8")
        .join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn(
            "cosine_sq8",
            F.expr(_IDOT.format(a="qq8", b="q8")).cast("double")
            / F.sqrt(F.col("qn8").cast("double") * F.col("n8").cast("double")),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine_sq8").desc(), F.col("nid").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cosine_sq8", F.col("rk").cast("int").alias("rk"))
    )


# --- distributed k-means (Lloyd) ----------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def d2i_expr(vec: str, cent: str) -> str:
    """Integer-quantized squared L2 distance: each per-coordinate squared
    difference is quantized to an exact integer (floor(v*1e6 + 0.5) — exact
    in double below 2^53), then summed as BIGINT. Order-independent and
    reproducible bit-for-bit in DuckDB/numpy with no decimal machinery —
    the softpatch-mirror integer discipline applied to clustering."""
    return (
        f"aggregate(zip_with({vec}, {cent}, "
        "(x, c) -> CAST(floor((CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c) * 1000000.0 + 0.5) AS BIGINT)), "
        "CAST(0 AS BIGINT), (a, v) -> a + v)"
    )


def _cents_literal(cents: list[tuple[int, list[float]]]) -> str:
    """SQL array-of-structs literal for the centroid set. Each weight goes
    through ``lit_double`` so the emitted text parses to the identical
    double in every engine (see functions/exact.py — DuckDB's literal
    parser is not correctly rounded)."""
    from ..functions.exact import lit_double

    items = ", ".join(
        f"named_struct('cell', {cell}, 'c', array("
        + ", ".join(lit_double(float(v)) for v in vec)
        + "))"
        for cell, vec in cents
    )
    return f"array({items})"


def kmeans_assign_expr(cents: list[tuple[int, list[float]]], vec: str = "embedding") -> str:
    """Per-row argmin over the centroid literals: transform to
    (d2i, cell) structs, array_min picks lexicographically — smallest
    distance, ties to the lowest cell id. Pure map-side: no join, no
    shuffle; the centroid array is a plan literal."""
    return (
        f"array_min(transform({_cents_literal(cents)}, "
        f"ce -> struct({d2i_expr(vec, 'ce.c')} AS d2i, ce.cell AS cell)))"
    )


def lloyd_train(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The Lloyd driver loop alone: returns the trained centroid list
    (cell, vec) without the final assignment pass — so callers that treat
    the centroids as a build-time index artifact (semantic dedup, PQ) can
    checkpoint them and skip retraining.

    Per round: assignment is a pure map stage (argmin over broadcast-
    literal centroids, integer-quantized distances); the update is ONE
    map-side-combinable shuffle (posexplode to (cell, dim) → exact integer
    coordinate sums + counts), k·dim rows back to the driver — the same
    driver-loop shape MLlib's KMeans uses, with deterministic arithmetic
    replacing its run-dependent float reductions. Init = the k lowest-id
    vectors (deterministic, cross-engine).

    New centroid coordinate: c = floor(S/n + 0.5)/1e6 where S is the exact
    integer micro-unit sum — double division + floor, identical in Spark,
    DuckDB, and numpy. An emptied cell keeps its previous centroid.

    Scale: driver traffic is k·dim integers per round; everything else is
    two narrow stages per round. At 100 TB the integer sums stay exact
    below 2^53 micro-units per (cell, dim) — ~9e9 unit-scale mass, beyond
    which the sum would need one extra split (two-level aggregation)."""
    e = df.select(F.col(id_col), F.col(vec_col).alias("embedding")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    init = [
        (i + 1, [float(x) for x in r.embedding])
        for i, r in enumerate(e.orderBy(id_col).limit(k).collect())
    ]
    cents = [(cell, [_q6(v) for v in vec]) for cell, vec in init]

    for _ in range(iters):
        assigned = e.withColumn("_a", F.expr(kmeans_assign_expr(cents))).select(
            id_col, "embedding", F.col("_a.cell").alias("cell")
        )
        stats = (
            assigned.select("cell", F.posexplode("embedding").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(
                F.sum(
                    F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cell.setdefault(r.cell, {})[r.i] = (int(r.s), int(r.n))
        new_cents = []
        for cell, vec in cents:
            dims = by_cell.get(cell)
            if not dims:
                new_cents.append((cell, vec))  # emptied cell keeps centroid
                continue
            new_vec = [
                _mean_q6(dims[i][0], dims[i][1]) for i in range(len(vec))
            ]
            new_cents.append((cell, new_vec))
        cents = new_cents
    return cents


def kmeans_lloyd(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[tuple[int, list[float]]] | None = None,
    spread: bool = False,
) -> DataFrame:
    """Distributed Lloyd's k-means assignment (see :func:`lloyd_train` for
    the training loop and the bit-stability spec). ``cents``: pass trained
    (checkpointed) centroids to skip the driver loop entirely — the output
    is then one pure map stage. ``spread``: repartition to all cores before
    the argmin map — the n·k·dim fold serializes on a single-split small-SF
    scan (at real scale the scan is already wide); leave False when the
    shuffle-free map-only plan matters more than toy-scale parallelism
    (k = 8 s_kmeans_embed asserts that plan shape)."""
    if cents is None:
        cents = lloyd_train(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    e = df.select(F.col(id_col), F.col(vec_col).alias("embedding"))
    if spread:
        e = e.repartition(df.sparkSession.sparkContext.defaultParallelism)
    out = e.withColumn("_a", F.expr(kmeans_assign_expr(cents)))
    return out.select(
        F.col(id_col),
        F.col("_a.cell").alias("cluster"),
        (F.col("_a.d2i").cast("double") / F.lit(1e6)).alias("d2"),
    )


def _q6(v: float) -> float:
    """Quantize a double to micro-units the way both engines do."""
    import math

    return math.floor(float(v) * 1e6 + 0.5) / 1e6


def _mean_q6(s_int: int, n: int) -> float:
    """Centroid coordinate from the exact micro-unit sum: double division,
    floor(+0.5), back to units — deterministic IEEE ops in every engine."""
    import math

    return math.floor(s_int / n + 0.5) / 1e6


def _d2i_matrix(Xd, cents):
    """(n, k) int64 matrix of integer-quantized squared distances: column j
    is floor((x−c_j)²·1e6 + 0.5) summed per row — elementwise identical to
    the scalar d2i spec, just evaluated a column (cell) at a time."""
    import numpy as np

    cols = []
    for _cell, c in cents:
        d = Xd - np.asarray(c, dtype=np.float64)
        cols.append(np.floor(d * d * 1e6 + 0.5).astype(np.int64).sum(axis=1))
    return np.stack(cols, axis=1)


def _assign_lex(Xd, cents):
    """Per-row argmin over (d2i, cell) — lexicographic, ties to the lowest
    cell id. ``cents`` is in ascending cell order by construction, so a
    strict-< scan in column order reproduces the tuple compare exactly."""
    import numpy as np

    D = _d2i_matrix(Xd, cents)
    cells = np.asarray([cell for cell, _ in cents], dtype=np.int64)
    best_idx = np.zeros(len(Xd), dtype=np.int64)
    best_d2 = D[:, 0].copy()
    for j in range(1, len(cents)):
        better = D[:, j] < best_d2
        best_idx[better] = j
        best_d2[better] = D[better, j]
    return cells[best_idx], best_d2


def kmeans_mirror(ids, X, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Independent numpy replica of :func:`kmeans_lloyd` (oracle side).
    Returns (centroids list, assignments dict id -> (cluster, d2)).

    Vectorized per cell (not per row) — bit-identical to the scalar spec
    (tests/test_ann_recall.py pins the equivalence against a per-row
    reference): the elementwise quantization, int64 row sums, and the
    (d2, cell) lexicographic tie-break are unchanged."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    Xd = np.asarray(X, dtype=np.float64)
    cents = [
        (i + 1, [_q6(v) for v in Xd[order[i]]]) for i in range(k)
    ]
    qX = np.floor(Xd * 1e6 + 0.5).astype(np.int64)  # micro-unit coords

    for _ in range(iters):
        assign, _ = _assign_lex(Xd, cents)
        new_cents = []
        for cell, c in cents:
            mask = assign == cell
            n = int(mask.sum())
            if n == 0:
                new_cents.append((cell, c))
                continue
            sums = qX[mask].sum(axis=0)  # exact int64 sums
            new_cents.append((cell, [_mean_q6(int(s), n) for s in sums]))
        cents = new_cents

    final_cells, final_d2 = _assign_lex(Xd, cents)
    result = {
        int(ids[ridx]): (int(final_cells[ridx]), int(final_d2[ridx]) / 1e6)
        for ridx in range(len(Xd))
    }
    return cents, result


SEMDEDUP_TAU = 0.30  # within-cluster cosine above which the higher id drops
SEMDEDUP_K_CAP = 256  # centroid-literal capacity of the map-side argmin
SEMDEDUP_WINDOW = 32  # sorted-neighborhood candidate span within a cluster
# SemDeDup's k-means is BLOCKING, not a fitted model — 2 Lloyd rounds place
# near-duplicates in one cell just as well as 3 (each round is a full
# assignment+stats pass, so rounds are the dominant cost of the query).
SEMDEDUP_ITERS = 2


def semdedup_k(n: int) -> int:
    """Cluster count for semantic dedup: k ~ sqrt(n) (the knob the SemDeDup
    paper tunes so cluster sizes track n/k ~ sqrt(n)), clamped to [8, 256].
    The upper clamp is the plan-literal capacity of the map-side argmin —
    beyond it, assignment should move to a broadcast centroid JOIN (same
    map-only shape, centroids shipped as a broadcast relation instead of
    expression literals)."""
    import math

    return min(max(8, math.isqrt(max(n, 1))), SEMDEDUP_K_CAP)


def semantic_candidates(v_all: DataFrame, window: int = SEMDEDUP_WINDOW) -> DataFrame:
    """Sorted-neighborhood candidate pairs of an assigned embedding frame
    (vec_id, embedding, cluster, d2): rank members by (distance-to-centroid,
    vec_id) inside each cluster, pair each vector only with its ``window``
    predecessors in that order. Candidate volume is ≤ window·n — LINEAR in
    n (the probe in tools/scale_probe.py counts this frame directly as the
    scaling evidence).

    r16 (guide §2.3/§2.4 — the lsh_candidate_pairs/t_winnowing_fp lead()
    discipline): pairing used to be an equi-join on (cluster, rank) with
    the successor side sequence-exploded ×window BEFORE the join — i.e.
    window·n rows, EACH CARRYING A FULL EMBEDDING, crossed a second
    exchange just to meet their predecessor ≤ window ranks back.
    lead(·, j) over the SAME (cluster | d2, vec_id) window IS that
    lookahead: one window pass (the single exchange the rank already
    paid) emits each member's next 1..window in-cluster successors with
    their embeddings — the heavy payload never crosses a second shuffle
    and the join disappears. (d2, vec_id) is a total order (vec_id is
    unique), so lead-at-gap-j ≡ rank-gap-j and the pair multiset is
    unchanged; lead is partition-bounded, so nulls appear exactly where
    the cluster-equality join predicate cut. Pinned by
    tests/test_dedup_cc.py::test_semantic_candidates_lead_matches_join."""
    v = v_all.withColumn("sq", dnorm_sq()).filter(F.col("sq") > 0)
    rw = W.partitionBy("cluster").orderBy("d2", "vec_id")
    nbrs = F.array(
        *[
            F.struct(
                F.lead("vec_id", j).over(rw).alias("vb"),
                F.lead("embedding", j).over(rw).alias("eb"),
                F.lead("sq", j).over(rw).alias("sqb"),
            )
            for j in range(1, window + 1)
        ]
    )
    return (
        v.withColumn("_nb", nbrs)  # window exprs can't live under explode
        .select(
            F.col("vec_id").alias("va"),
            F.col("embedding").alias("ea"),
            F.col("sq").alias("sqa"),
            F.explode("_nb").alias("_p"),
        )
        .where(F.col("_p.vb").isNotNull())
        .select(
            F.least("va", "_p.vb").alias("d1"),
            F.greatest("va", "_p.vb").alias("d2"),
            "ea",
            F.col("_p.eb").alias("eb"),
            "sqa",
            F.col("_p.sqb").alias("sqb"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    tau: float = SEMDEDUP_TAU,
    k: int | None = None,
    iters: int = SEMDEDUP_ITERS,
    window: int = SEMDEDUP_WINDOW,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-block): k-means
    partitions the embedding space, exact cosine runs ONLY inside each
    cluster, and of every near-duplicate pair the higher vec_id drops (the
    same star-collapse convention as the LSH embedding dedup) — the
    cluster-blocked analog of banded LSH for semantic (non-lexical)
    duplicates, per the SemDeDup recipe of clustering first so the verify
    never crosses cluster boundaries.

    Two ENFORCED scale bounds (both mirrored exactly by the oracle):

    - ``k`` defaults to :func:`semdedup_k` = clamp(sqrt(n)) from one cheap
      count — cluster sizes track n/k instead of n/8, so a 10× corpus no
      longer grows within-cluster pair counts ~quadratically (the r6 probe
      measured ×4.1 wall per ×10 data with fixed k = 8);
    - within each cluster, candidates are the SORTED-NEIGHBORHOOD pairs:
      rank members by (distance-to-centroid, vec_id) and pair each vector
      only with the ``window`` predecessors in that order (near-duplicates
      have near-equal centroid distances, so they are adjacent). Candidate
      volume is ≤ window·n — LINEAR in n — and the pairing is an equi-join
      on (cluster, rank) via a sequence explode, never a cluster self-join
      filtered after the fact.

    Assignment is :func:`kmeans_lloyd` (map-side argmin over broadcast-
    literal centroids, k·dim driver traffic per round); the fast-double/
    exact-decimal two-step decides the cosine boundary bit-stably. The
    rank ordering uses the kmeans d2 output — exact integer micro-units in
    double, so Spark and the oracle sort identically. Zero-norm vectors
    have no cosine: they are kept, never ranked, never pair.

    Output: per-cluster dedup accounting (cluster, n_vecs, n_kept,
    n_dropped).
    """
    if cents is None:
        if k is None:
            k = semdedup_k(df.count())
        cents = lloyd_train(df, k=k, iters=iters)
    assigned = kmeans_lloyd(df, cents=cents, spread=True)
    v_all = df.select("vec_id", "embedding").join(assigned, "vec_id")
    cands = semantic_candidates(v_all, window=window)
    fast = cands.filter(
        F.expr(fdot_expr("ea", "eb")) / F.sqrt(F.col("sqa") * F.col("sqb"))
        >= F.lit(tau - MARGIN)
    )
    near = fast.filter(
        F.expr(ddot_expr("ea", "eb")) / F.sqrt(F.col("sqa") * F.col("sqb"))
        >= F.lit(tau)
    )
    dropped = near.select(F.col("d2").alias("vec_id")).distinct()
    flagged = v_all.join(dropped.withColumn("_dup", F.lit(1)), "vec_id", "left")
    return flagged.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_dropped"),
    )


PQ_M = 8  # subspaces
PQ_SUBDIM = 8  # dims per subspace (PQ_M * PQ_SUBDIM = embedding dim)
PQ_K = 16  # codes per subspace codebook
PQ_TRAIN_CAP = 4096  # deterministic codebook training sample (lowest vec_ids)
PQ_ITERS = 3


def pq_codebooks(ids, X) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks via the integer-exact k-means mirror
    (deterministic: init = lowest-id subvectors, fixed iterations). Shared
    by the engine (driver-side training on a capped sample) and the oracle
    (identical call → identical literals)."""
    import numpy as np

    Xd = np.asarray(X, dtype=np.float64)
    books = []
    for j in range(PQ_M):
        sub = Xd[:, j * PQ_SUBDIM : (j + 1) * PQ_SUBDIM]
        cents, _ = kmeans_mirror(ids, [list(r) for r in sub], k=PQ_K, iters=PQ_ITERS)
        books.append(cents)
    return books


def _pq_lut_rows(q_ids, Q, books) -> list[tuple[int, int, int, int]]:
    """(qid, sub, code, pd2i): integer-quantized partial squared distance of
    every query subvector to every codebook centroid — the ADC lookup table.
    Quantization matches d2i_expr exactly (floor(d²·1e6 + 0.5) per dim)."""
    import numpy as np

    rows = []
    for qid, q in zip(q_ids, Q):
        qd = np.asarray(q, dtype=np.float64)
        for j, cents in enumerate(books):
            sub = qd[j * PQ_SUBDIM : (j + 1) * PQ_SUBDIM]
            for code, c in cents:
                d = sub - np.asarray(c, dtype=np.float64)
                pd2i = int(np.floor(d * d * 1e6 + 0.5).astype(np.int64).sum())
                rows.append((int(qid), j, int(code), pd2i))
    return rows


def pq_topk(
    df: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    books: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC) — the
    memory-bandwidth scale mode of the ANN family: each 64-float vector
    compresses to PQ_M 4-bit-ish codes, and a query scans codes against a
    tiny lookup table instead of touching floats.

    Scale shape: codebooks train DRIVER-SIDE on a deterministic capped
    sample (lowest ``PQ_TRAIN_CAP`` ids — the standard PQ practice of
    sampling the train set; cap and determinism make the oracle replayable);
    encoding is a pure map stage (per-subspace argmin over codebook
    LITERALS, integer-quantized distances — no join, no shuffle); the ADC
    scan is one broadcast join of the (n_queries·PQ_M·PQ_K)-row LUT onto
    the exploded (vec_id, sub, code) table plus one combinable sum — every
    arithmetic step integer-exact, so Spark and DuckDB agree bit-for-bit.

    Output: (qid, nid, d2_pq, rk) — top-k smallest approximate distances.
    ``books``: pass pretrained codebooks (e.g. a session-lifetime memo) to
    skip the training collect+fit — the PQ deployment shape, where the
    codebook is a build-time artifact reused by every query.
    """
    spark = df.sparkSession
    if books is None:
        sample = (
            df.orderBy("vec_id").limit(PQ_TRAIN_CAP).select("vec_id", "embedding").collect()
        )
        ids = [r["vec_id"] for r in sample]
        X = [list(r["embedding"]) for r in sample]
        books = pq_codebooks(ids, X)

    code_cols = []
    for j, cents in enumerate(books):
        sub = f"slice(embedding, {j * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        code_cols.append(
            F.expr(kmeans_assign_expr(cents, vec=sub)).getField("cell").alias(f"c{j}")
        )
    codes = df.select("vec_id", *code_cols)
    long = codes.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"c{j}") for j in range(PQ_M)])).alias("sub", "code"),
    )

    q_rows = df.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    lut_rows = _pq_lut_rows(
        [r["vec_id"] for r in q_rows], [list(r["embedding"]) for r in q_rows], books
    )
    lut = spark.createDataFrame(lut_rows, "qid long, sub int, code int, pd2i long")

    scored = (
        long.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", F.col("vec_id").alias("nid"))
        .agg(F.sum("pd2i").alias("d2i"))
    )
    w = W.partitionBy("qid").orderBy(F.col("d2i").asc(), F.col("nid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "nid",
            (F.col("d2i").cast("double") / F.lit(1e6)).alias("d2_pq"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def ivfpq_topk(
    df: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    books: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """IVF-PQ composite ANN — the index layout a 100 TB vector corpus
    actually deploys (the FAISS ``IVFxx,PQyy`` shape): the coarse IVF
    quantizer (:func:`ivf_cells`) restricts each query to its ``n_probe``
    nearest cells, and WITHIN those cells candidates are scored by the
    PQ asymmetric-distance LUT instead of touching the raw floats.

    Why the composite matters at scale: plain PQ-ADC still scans every
    vector's codes for every query (bandwidth-bound over the whole
    corpus); plain IVF refines with exact float dot products (compute-
    bound inside the probed cells). IVF-PQ scans only
    ``n_probe/n_lists`` of the corpus AND touches only 8 int codes per
    candidate — the product of both reductions.

    Plan shape: cell assignment is the shared broadcast-centroid map;
    encoding is a pure map stage (per-subspace argmin over codebook
    LITERALS — no join); the probed-cell restriction is a broadcast join
    of the (n_queries·n_probe)-row probe list on the cell key; the ADC
    scan is a broadcast LUT join plus ONE combinable integer sum — a
    single shuffle end to end. Every arithmetic step is integer-exact, so
    the SQL oracle replays cells, codes, LUT, and top-k bit-for-bit.

    Output: (qid, nid, d2_pq, rk) — top-k smallest approximate distances
    among probed cells. ``books`` as in :func:`pq_topk`."""
    spark = df.sparkSession
    if books is None:
        sample = (
            df.orderBy("vec_id").limit(PQ_TRAIN_CAP).select("vec_id", "embedding").collect()
        )
        books = pq_codebooks(
            [r["vec_id"] for r in sample], [list(r["embedding"]) for r in sample]
        )

    corpus, probes = ivf_cells(df, n_queries=n_queries, n_lists=n_lists, n_probe=n_probe)
    code_cols = []
    for j, cents in enumerate(books):
        sub = f"slice(embedding, {j * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        code_cols.append(
            F.expr(kmeans_assign_expr(cents, vec=sub)).getField("cell").alias(f"c{j}")
        )
    codes = corpus.select("vec_id", "cell", *code_cols)
    long = codes.select(
        "vec_id",
        "cell",
        F.posexplode(F.array(*[F.col(f"c{j}") for j in range(PQ_M)])).alias("sub", "code"),
    )

    q_rows = df.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    lut_rows = _pq_lut_rows(
        [r["vec_id"] for r in q_rows], [list(r["embedding"]) for r in q_rows], books
    )
    lut = spark.createDataFrame(lut_rows, "qid long, sub int, code int, pd2i long")

    scored = (
        long.join(F.broadcast(probes.select("qid", "cell")), "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .join(F.broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", F.col("vec_id").alias("nid"))
        .agg(F.sum("pd2i").alias("d2i"))
    )
    w = W.partitionBy("qid").orderBy(F.col("d2i").asc(), F.col("nid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "nid",
            (F.col("d2i").cast("double") / F.lit(1e6)).alias("d2_pq"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


MMR_LAMBDA = 0.7
MMR_SHORTLIST = 20
MMR_K = 5
MMR_QUERY_ID = 0


def mmr_diversify(
    df: DataFrame,
    query_id: int = MMR_QUERY_ID,
    shortlist: int = MMR_SHORTLIST,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: from the decimal-exact
    cosine top-``shortlist`` for one query vector, greedily select ``k``
    results maximizing ``lam·cos(q,d) − (1−lam)·max_{s∈sel} cos(d,s)`` —
    the standard diversified-retrieval post-processor (Carbonell &
    Goldberg '98) every RAG stack runs after ANN.

    Scale shape: the corpus-wide stage is the same two-speed broadcast
    scan as :func:`cosine_topk` (fast double prefilter, decimal fold only
    near the boundary, TakeOrdered); the candidate-candidate cosine
    matrix is a shortlist×shortlist self-join — O(shortlist²) decimal
    dots, constant by construction; only that constant-size matrix is
    collected for the inherently sequential greedy (same bounded-collect
    contract as the coreset/PQ training). Ties break on vec_id.

    Output: (rk, vec_id, cosine, mmr_score).
    """
    e = df.select("vec_id", "embedding").withColumn("sq", dnorm_sq()).filter(F.col("sq") > 0)
    q = e.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qemb"), F.col("sq").alias("qsq")
    )
    pairs = (
        e.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cos_fast",
            F.expr(fdot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("sq")),
        )
    )
    # Single-query shortlist WITHOUT a global window (which would drag the
    # whole corpus through one task): TakeOrdered yields the fast top-k,
    # its min is the broadcast threshold, and a second parallel scan keeps
    # the margin-padded superset for the exact decimal pass.
    fast_th = (
        pairs.orderBy(F.col("cos_fast").desc(), F.col("vec_id").asc())
        .limit(shortlist)
        .agg(F.coalesce(F.min("cos_fast"), F.lit(-2.0)).alias("kth_fast"))
    )
    survivors = pairs.join(F.broadcast(fast_th)).filter(
        F.col("cos_fast") >= F.col("kth_fast") - F.lit(MARGIN)
    )
    cand = (
        survivors.withColumn(
            "cosine",
            F.expr(ddot_expr("qemb", "embedding")) / F.sqrt(F.col("qsq") * F.col("sq")),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(shortlist)
        .select("vec_id", "embedding", "sq", "cosine")
    )
    # ONE corpus scan: collect the constant-size shortlist (embeddings
    # included — shortlist×DIM floats), then the pair-cosine self-join runs
    # over a local re-created frame so Spark's decimal fold (not driver
    # Python) still owns every dot product.
    spark = df.sparkSession
    sl_rows = cand.collect()
    sl = spark.createDataFrame(sl_rows, cand.schema)
    a = sl.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"), F.col("sq").alias("sqa")
    )
    b = sl.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"), F.col("sq").alias("sqb")
    )
    pair_cos = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        "ida",
        "idb",
        (F.expr(ddot_expr("ea", "eb")) / F.sqrt(F.col("sqa") * F.col("sqb"))).alias("cc"),
    )
    qrows = {int(r["vec_id"]): float(r["cosine"]) for r in sl_rows}
    prows = {}
    for r in pair_cos.collect():
        prows[(int(r["ida"]), int(r["idb"]))] = float(r["cc"])

    def pc(x: int, y: int) -> float:
        return prows[(x, y)] if x < y else prows[(y, x)]

    sel: list[tuple[int, float, float]] = []
    remaining = sorted(qrows)
    while remaining and len(sel) < k:
        best = None
        for d in remaining:
            div = max((pc(d, s) for s, _, _ in sel), default=0.0)
            score = lam * qrows[d] - (1.0 - lam) * div
            if best is None or score > best[1] or (score == best[1] and d < best[0]):
                best = (d, score)
        sel.append((best[0], best[1], qrows[best[0]]))
        remaining.remove(best[0])
    spark = df.sparkSession
    rows = [
        (i + 1, vid, cos, score) for i, (vid, score, cos) in enumerate(sel)
    ]
    return spark.createDataFrame(
        rows, "rk int, vec_id bigint, cosine double, mmr_score double"
    ).select("rk", "vec_id", "cosine", qround("mmr_score", 9).alias("mmr_score"))


def mmr_mirror(ids, X, query_id: int = MMR_QUERY_ID, shortlist: int = MMR_SHORTLIST,
               k: int = MMR_K, lam: float = MMR_LAMBDA):
    """Independent numpy replica of :func:`mmr_diversify` (oracle side):
    decimal dots replayed as exact integer micro-unit sums (the
    DECIMAL(27,6) lattice), the same shortlist cut and greedy spec.
    Returns [(rk, vec_id, cosine, mmr_score)]."""
    import numpy as np

    ids = [int(i) for i in ids]
    Xd = np.asarray(X, dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}

    def ddot(i: int, j: int) -> float:
        prods = Xd[i] * Xd[j]
        micros = np.floor(prods * 1e6 + 0.5).astype(np.int64)
        return float(int(micros.sum()) / 1e6)

    sq = {v: ddot(i, i) for v, i in idx.items()}
    qi = idx[query_id]
    cands = []
    for v, i in idx.items():
        if v == query_id or sq[v] <= 0:
            continue
        import math

        cos = ddot(qi, i) / math.sqrt(sq[query_id] * sq[v])
        cands.append((v, cos))
    cands.sort(key=lambda t: (-t[1], t[0]))
    cands = cands[:shortlist]
    qcos = dict(cands)

    def pc(x: int, y: int) -> float:
        import math

        return ddot(idx[x], idx[y]) / math.sqrt(sq[x] * sq[y])

    sel = []
    remaining = sorted(qcos)
    while remaining and len(sel) < k:
        best = None
        for d in remaining:
            div = max((pc(d, s) for s, _, _ in sel), default=0.0)
            score = lam * qcos[d] - (1.0 - lam) * div
            if best is None or score > best[1] or (score == best[1] and d < best[0]):
                best = (d, score)
        sel.append((best[0], best[1], qcos[best[0]]))
        remaining.remove(best[0])
    from ..functions.exact import qround_py

    return [
        (i + 1, vid, cos, qround_py(score, 9)) for i, (vid, score, cos) in enumerate(sel)
    ]


PCA_COMPONENTS = 2


def pca_fit(emb: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact-covariance PCA fit: the covariance matrix is ONE distributed
    pass (vec-keyed self-join of the long form → dec-quantized product sums,
    d² combinable cells — 4096 for the 64-wide corpus embeddings), the d×d
    eigendecomposition is a trivial driver step (the kmeans/PQ
    memoized-driver-train discipline — the reduction to d² cells is the
    distributed work; eigh on d×d costs microseconds at ANY corpus size).
    d is derived from the data (max F.size of ``emb_col``), not hardcoded.

    Cross-engine exactness: column means come from decimal-exact sums
    (float(Decimal) is correctly rounded, division by n is one IEEE op),
    covariance cells are decimal-exact sums of dec-quantized centered
    products, so the numpy-mirror oracle reconstructs the IDENTICAL float64
    matrix via int64 micro-unit sums — eigh then agrees bit-for-bit. Each
    eigenvector's sign is pinned by making its largest-|coordinate| entry
    positive (first index on ties).

    Returns (mu list[float], components list[list[float]] — top
    PCA_COMPONENTS rows, eigenvalue-descending).

    r15 plan shape: the covariance reduction is TWO Arrow islands over the
    pruned embedding column (guide §4.2 — whole batches to numpy), not the
    former vec-keyed self-join of the long form (n·d rows joined to n·d²
    product rows, all through a decimal aggregate — measured ~5 s at
    sf0.1, the dominant cost of s_pca_project). Each task emits d (means
    pass) / d² (covariance pass) int64 micro-unit partials; quantization
    is floor(x·1e6 + 0.5) per element BEFORE summation — the identical
    arithmetic the numpy-mirror oracle runs, and integer sums are
    associative, so any partitioning yields bit-identical totals (the
    decimal-exact contract, now with the quantized units summed as BIGINT;
    Spark's final F.sum over the per-task partials stays int64-safe
    because partials are bounded by rows·|x|·1e6 and ANSI mode would fail
    loudly, not wrap, at the 9.2e18 ceiling).
    """
    import numpy as np
    import pandas as pd
    from decimal import Decimal

    n = emb.count()
    d = emb.select(F.max(F.size(emb_col)).alias("d")).collect()[0]["d"]
    vecs = emb.select(F.col(emb_col).cast("array<double>").alias("_e"))

    def col_sums(batches):
        acc = np.zeros(d, dtype=np.int64)
        seen = False
        for b in batches:
            X = np.stack(b["_e"].to_numpy())
            acc += np.floor(X * 1e6 + 0.5).astype(np.int64).sum(axis=0)
            seen = True
        if seen:
            yield pd.DataFrame({"i": np.arange(d, dtype=np.int32), "s": acc})

    mrows = (
        vecs.mapInPandas(col_sums, schema="i int, s long")
        .groupBy("i")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    mu = [0.0] * d
    for r in mrows:
        mu[r["i"]] = float(Decimal(int(r["s"])).scaleb(-6)) / n
    mu_np = np.array(mu, dtype=np.float64)
    ii_flat = np.repeat(np.arange(d, dtype=np.int32), d)
    jj_flat = np.tile(np.arange(d, dtype=np.int32), d)

    def cov_cells(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        seen = False
        for b in batches:
            X = np.stack(b["_e"].to_numpy())
            cent = X - mu_np[None, :]
            P = cent[:, :, None] * cent[:, None, :]
            acc += np.floor(P * 1e6 + 0.5).astype(np.int64).sum(axis=0)
            seen = True
        if seen:
            yield pd.DataFrame({"ii": ii_flat, "jj": jj_flat, "s": acc.ravel()})

    crows = (
        vecs.mapInPandas(cov_cells, schema="ii int, jj int, s long")
        .groupBy("ii", "jj")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    C = np.zeros((d, d))
    for r in crows:
        C[r["ii"], r["jj"]] = float(Decimal(int(r["s"])).scaleb(-6)) / (n - 1)
    return mu, _pca_components_from_cov(C)


def _pca_components_from_cov(C):
    """Top-PCA_COMPONENTS eigenvectors of a symmetric covariance matrix,
    eigenvalue-descending, sign pinned (largest-|coordinate| entry made
    positive, first index on ties) — shared verbatim by the Spark fit and
    the numpy-mirror oracle so both sides run the same eigh on the same
    float64 matrix."""
    import numpy as np

    w, v = np.linalg.eigh(C)
    comps = []
    for c in range(PCA_COMPONENTS):
        vec = v[:, int(np.argsort(w)[::-1][c])].copy()
        k = int(np.argmax(np.abs(vec)))
        if vec[k] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    return comps


def pca_project_exprs(mu, components, emb_col: str = "embedding"):
    """SQL expressions projecting ``emb_col`` onto each component as a
    LEFT-TO-RIGHT fold (aggregate HOF adds x_k·w_k in array order — the
    same sequential IEEE adds the mirror's Python loop performs), with the
    constant Σ mu_k·w_k folded driver-side (same order). The fold length is
    the fitted component's width, not a hardcoded dimension."""
    from ..functions.exact import lit_double

    exprs = []
    for comp in components:
        d = len(comp)
        w_arr = "array(" + ", ".join(lit_double(float(w)) for w in comp) + ")"
        off = 0.0
        for m, w in zip(mu, comp):
            off += m * w
        exprs.append(
            f"aggregate(transform(sequence(0, {d - 1}), k -> "
            f"element_at(CAST({emb_col} AS ARRAY<DOUBLE>), k + 1) * element_at({w_arr}, k + 1)), "
            f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) - {lit_double(float(off))}"
        )
    return exprs
