"""Deduplication operators: exact, fingerprint, n-gram Jaccard, MinHash+LSH,
SimHash — the scale path for 100 TB corpus dedup.

Design notes (why each shape survives 100× scale-up):
- Exact/fingerprint dedup is a hash-shuffle groupBy on the fingerprint — one
  shuffle, map-side combinable.
- String hashing goes through a **token-hash dimension table**: the distinct
  vocabulary is hashed once (polynomial char fold, textops) and broadcast;
  every downstream op (shingles, MinHash, SimHash) is pure 64-bit integer
  arithmetic. Vocabulary ≪ corpus at any scale, and the hot path never
  touches characters again.
- Shingle ids are integer combines of 3 token hashes — so the n-gram Jaccard
  inverted index joins on bigints, not strings.
- MinHash+LSH: banded signature buckets produce candidates, verified with
  exact Jaccard on the hashed shingles. Signatures are one grouped
  aggregation (16 `min` columns) — map-side combinable, no joins.
- All hashing is engine-defined, so the DuckDB oracle reproduces results
  bit-exactly — no reliance on engine-specific hash().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.rng import M
from .textops import fingerprint, poly_hash_sql_expr

N_HASHES = 16
N_BANDS = 4
BAND_ROWS = N_HASHES // N_BANDS
SHINGLE_MULT = 1009  # combine multiplier for token-hash n-grams
# Hot-bucket bounds for the LSH candidate join (the same discipline as the
# embedding path's similarity.BUCKET_CAP and the aHash sorted neighborhood):
# a (band, band_key) bucket contributes at most LSH_NEIGHBORHOOD pairs per
# member, and buckets are truncated at LSH_BUCKET_CAP members so the
# within-bucket join compare work is bounded too. Both are deterministic
# (lowest doc_ids survive) and SQL-mirrorable.
LSH_BUCKET_CAP = 2000
LSH_NEIGHBORHOOD = 32
# Hot-shingle document-frequency cap for the EXACT inverted-index joins
# (jaccard_pairs / containment_pairs / the minhash_lsh_dedup verify): a
# shingle present in more than 1/SHINGLE_DF_DENOM of all documents is
# boilerplate ("all rights reserved" trigrams at crawl scale) — it carries
# near-zero Jaccard signal but emits C(df, 2) join rows, the same quadratic
# shape the LSH bucket cap removes. The cap is RELATIVE (it scales with the
# corpus: at 100 TB only true boilerplate crosses 1 %), floored at
# SHINGLE_DF_MIN_CAP so tiny corpora keep some headroom. Integer arithmetic
# (greatest(min_cap, n_docs div denom)) → exact cross-engine mirror.
SHINGLE_DF_DENOM = 100
SHINGLE_DF_MIN_CAP = 5


def df_capped_shingles(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop shingles whose document frequency exceeds
    ``greatest(SHINGLE_DF_MIN_CAP, n_docs div SHINGLE_DF_DENOM)`` — the
    DUP_SPAN_HOT_CAP doctrine applied to the inverted shingle index.

    Scale shape: the hot list holds at most ``total_rows / cap`` shingles
    (each needs > cap occurrences), so the LeftAnti join against it is
    broadcast-sized by construction; AQE picks the broadcast at runtime. The
    doc count rides in as a broadcast single-row aggregate, keeping the
    whole cap inside one Catalyst plan (no driver-side collect). Truncation
    is VISIBLE via :func:`shingle_df_stats` — never silent."""
    # the doc count rides in on a constant-key broadcast equi-join (a 1-row
    # crossJoin would compile to BroadcastNestedLoopJoin — same cost, worse
    # plan hygiene)
    nd = sh.agg(F.countDistinct(id_col).alias("_nd")).withColumn("_k", F.lit(1))
    cap = F.greatest(
        F.lit(SHINGLE_DF_MIN_CAP).cast("bigint"),
        F.expr(f"_nd div {SHINGLE_DF_DENOM}"),
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(nd), "_k")
        .filter(F.col("_df") > cap)
        .select("shingle")
    )
    return sh.join(hot, "shingle", "left_anti")


def shingle_df_stats(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Visibility readout for the hot-shingle df cap (the minhash_band_stats
    doctrine: an operator that truncates must report what it truncated).
    One row: corpus doc count, the effective cap, total distinct shingles,
    how many are hot (dropped), the max observed df, and the inverted-index
    row volume removed (Σ df over hot shingles) vs kept."""
    nd = sh.agg(F.countDistinct(id_col).alias("_nd")).withColumn("_k", F.lit(1))
    dfs = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(nd), "_k")
    )
    cap = F.greatest(
        F.lit(SHINGLE_DF_MIN_CAP).cast("bigint"),
        F.expr(f"_nd div {SHINGLE_DF_DENOM}"),
    )
    hot = (F.col("_df") > cap).cast("bigint")
    return dfs.groupBy().agg(
        F.max("_nd").cast("bigint").alias("n_docs"),
        F.max(cap).cast("bigint").alias("df_cap"),
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(hot).cast("bigint").alias("n_hot"),
        F.max("_df").cast("bigint").alias("max_df"),
        F.sum(F.col("_df") * hot).cast("bigint").alias("rows_dropped"),
        F.sum(F.col("_df") * (F.lit(1) - hot)).cast("bigint").alias("rows_kept"),
    )


def exact_dedup(df: DataFrame, key_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact key (deterministic keep-first)."""
    w = W.partitionBy(key_col).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def fingerprint_dedup_stats(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group doc count vs distinct normalized fingerprints."""
    return (
        df.withColumn("fp", fingerprint())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dups"),
        )
    )


def token_long(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pos, tok): positional token explosion (pos is 1-based)."""
    return df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")


def token_hash_long(tok_long_df: DataFrame) -> DataFrame:
    """(id, pos, h): token instances with the polynomial char-fold hash
    applied INLINE per instance — a pure map-only expression, no vocabulary
    dimension frame and no join. A crawl corpus's distinct whitespace-token
    vocabulary is 10^8–10^9 rows (typos, URLs, numbers); the old
    distinct-vocab + forced-broadcast shape OOMs the driver at that scale,
    while this shape stays whole-stage-codegen over token instances."""
    return tok_long_df.withColumn("h", F.expr(poly_hash_sql_expr("tok")))


def shingle_hashes(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct hashed word-3-gram shingles per doc:
    shingle = ((h1·1009 + h2) mod M · 1009 + h3) mod M over consecutive token
    hashes (lead window — no string re-materialization)."""
    tl = token_long(df, text_col, id_col)
    w = W.partitionBy(id_col).orderBy("pos")
    hashed = (
        token_hash_long(tl)
        .select(
            id_col,
            "pos",
            F.col("h").alias("h1"),
            F.lead("h", 1).over(w).alias("h2"),
            F.lead("h", 2).over(w).alias("h3"),
        )
        .filter(F.col("h3").isNotNull())
    )
    sh = F.pmod(
        F.pmod(F.col("h1") * SHINGLE_MULT + F.col("h2"), F.lit(M)) * SHINGLE_MULT + F.col("h3"),
        F.lit(M),
    )
    return hashed.select(F.col(id_col), sh.alias("shingle")).distinct()


def ngram_hashes(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct hashed word-``n``-gram ids per doc — :func:`shingle_hashes`
    generalized to any n (n=3 reproduces it exactly: the fold applies the
    same ``pmod`` after every multiply-add).

    Same scale shape: inline map-only token hashing, per-doc ``lead`` window
    (partition = doc, never global), pure 64-bit integer combine."""
    tl = token_long(df, text_col, id_col)
    w = W.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("h", i).over(w).alias(f"h{i}") for i in range(1, n)]
    hashed = (
        token_hash_long(tl)
        .select(id_col, "pos", F.col("h").alias("h0"), *leads)
        .filter(F.col(f"h{n - 1}").isNotNull())
    )
    acc = F.col("h0")
    for i in range(1, n):
        acc = F.pmod(acc * SHINGLE_MULT + F.col(f"h{i}"), F.lit(M))
    return hashed.select(F.col(id_col), acc.alias("shingle")).distinct()


def jaccard_pairs(
    sh: DataFrame, min_jaccard: float, id_col: str = "doc_id", df_capped: bool = True
) -> DataFrame:
    """Exact Jaccard over the (integer) inverted shingle index.

    sizes: |A| per doc; intersections via self-join on shingle (d1 < d2);
    J = inter / (|A| + |B| - inter). Integer arithmetic → exact cross-engine.

    The self-join emits C(df, 2) rows per shingle of document frequency df —
    boilerplate trigrams make df corpus-sized at crawl scale — so hot
    shingles (df > greatest(5, n_docs div 100)) are anti-joined away FIRST
    (:func:`df_capped_shingles`; Jaccard is then exact over the filtered
    shingle space, sizes included, so the measure stays a true set Jaccard).
    Truncation is reported by :func:`shingle_df_stats`, never silent.
    """
    if df_capped:
        sh = df_capped_shingles(sh, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    # sizes is one row per doc — corpus-sized, so never force a broadcast;
    # shuffle_hash keeps the join shuffle-side (pairs frame is the big side)
    return (
        inter.join(sa.hint("shuffle_hash"), "d1")
        .join(sb.hint("shuffle_hash"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("d1", "d2", "inter", "sz1", "sz2", "jaccard")
    )


def minhash_bands(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature as one grouped aggregation (16 affine-permutation
    mins over the shingle hash), then banded keys. Zero joins, map-side
    combinable — the signature of a 100 TB corpus is one shuffle."""
    mins = [
        F.min(F.pmod(F.col("shingle") * (2 * j + 3) + (5 * j + 1), F.lit(M))).alias(f"s{j}")
        for j in range(N_HASHES)
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    band_cols = [
        F.array_join(
            F.array(*[F.col(f"s{b * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)]), "-"
        ).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    wide = sig.select(id_col, *band_cols)
    return wide.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"b{b}") for b in range(N_BANDS)])).alias("band", "band_key"),
    )


def lsh_candidate_pairs(
    bands: DataFrame,
    id_col: str = "doc_id",
    bucket_cap: int | None = LSH_BUCKET_CAP,
    neighborhood: int = LSH_NEIGHBORHOOD,
) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 band bucket, with BOUNDED
    per-bucket pair generation.

    A naive (band, band_key) self-join is quadratic in the bucket
    population — and near-dup-heavy corpora (boilerplate, mirrored crawls)
    concentrate exactly where the bands stop discriminating, so at 100 TB
    the hot buckets ARE the workload. Two deterministic bounds keep it
    linear: (1) bucket members are ranked by id and truncated at
    ``bucket_cap`` (lowest ids survive — the embedding path's BUCKET_CAP
    move, similarity.banded_buckets), so within-bucket join compare work is
    ≤ cap² per bucket; (2) pairs form only inside a sorted-neighborhood
    window — rank distance ≤ ``neighborhood`` — so candidate OUTPUT is
    ≤ neighborhood·|bucket| per band (the aHash fix that took a ×10 data
    step from ×104 pairs to ×1.2). Oversized buckets mean the MinHash
    stopped discriminating; the bounds turn a quadratic blow-up into a
    reported truncation, never a silent hang. Ranks order by id, so the
    d1 < d2 invariant is preserved and both bounds mirror exactly in SQL.
    """
    win = W.partitionBy("band", "band_key").orderBy(F.col(id_col))
    rk = F.row_number().over(win)
    ranked = bands.withColumn("_rk", rk)
    if bucket_cap is not None:
        ranked = ranked.filter(F.col("_rk") <= bucket_cap)
    # r16 (guide §2.3/§2.4): pairs used to form via a bucket SELF-JOIN of
    # the ranked frame on (band, band_key) with rank gap 1..neighborhood —
    # a second exchange + sort-merge of both aliases just to look
    # ``neighborhood`` rows ahead within the bucket. lead(id, j) over the
    # same window IS that lookahead: one window pass emits each member's
    # next 1..neighborhood surviving bucket neighbors (lead is partition-
    # bounded, so nulls appear exactly where the join predicate's bucket
    # equality cut; both windows share one partitioning+sort, so the
    # filtered rank and the leads plan without a second exchange). Ranks
    # order by id, so d1 < d2 and the pair multiset are unchanged.
    nbrs = F.array(
        *[F.lead(F.col(id_col), j).over(win) for j in range(1, neighborhood + 1)]
    )
    return (
        ranked.withColumn("_nb", nbrs)  # window exprs can't live under explode
        .select(F.col(id_col).alias("d1"), F.explode("_nb").alias("d2"))
        .where(F.col("d2").isNotNull())
        .distinct()
    )


def minhash_band_stats(
    bands: DataFrame,
    bucket_cap: int = LSH_BUCKET_CAP,
    neighborhood: int = LSH_NEIGHBORHOOD,
) -> DataFrame:
    """Band diagnostics for the text MinHash-LSH path — makes both bounds
    VISIBLE (no silent truncation, the similarity.lsh_band_stats doctrine):
    per band — bucket count, max raw bucket population, members dropped by
    the bucket cap, and the exact candidate-pair volume the bounded
    sorted-neighborhood join materializes: per bucket of capped size c,
    pairs = c(c−1)/2 when c ≤ w+1 else w·c − w(w+1)/2 (every member pairs
    with ≤ w successors). Pure integer arithmetic — SQL-mirrored."""
    sz = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("c"))
    cap, w = bucket_cap, neighborhood
    cc = f"least(c, {cap})"
    pair_expr = (
        f"CASE WHEN {cc} <= {w} + 1 THEN ({cc} * ({cc} - 1)) div 2 "
        f"ELSE {w} * {cc} - ({w} * ({w} + 1)) div 2 END"
    )
    return (
        sz.withColumn("_cp", F.expr(pair_expr))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("c").cast("bigint").alias("max_bucket"),
            F.sum(F.expr(f"c - {cc}")).cast("bigint").alias("n_truncated"),
            F.sum("_cp").cast("bigint").alias("n_cand_pairs"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    bands: DataFrame | None = None,
    cands: DataFrame | None = None,
) -> DataFrame:
    """MinHash→LSH→exact-verify: the scalable near-dup join. Candidates from
    band buckets, then exact Jaccard computed PER CANDIDATE PAIR.

    The verify stage is candidate-bounded: intersections come from
    ``cands ⋈ sh(d1) ⋈ sh(d2)`` on equal shingle — each of the ≤ 32·n
    candidate pairs expands to |sh(d1)| rows then filters to the shared
    shingles, so verify cost is Σ min(|A|,|B|) over the candidate set,
    LINEAR in candidate volume. (A jaccard_pairs self-join over the pruned
    candidate docs is quadratic in pruned docs on a near-dup-heavy corpus —
    most docs are candidates there, and every pruned-doc pair sharing a
    shingle would recompute an intersection the candidate set never asked
    for.) Jaccard is measured over the df-capped shingle space
    (:func:`df_capped_shingles`, corpus-wide df — consistent with
    :func:`jaccard_pairs`); signatures/buckets use the raw shingles (they
    only nominate candidates, and the bucket cap already bounds hot ones).
    """
    if sh is None:
        sh = shingle_hashes(df, text_col, id_col)
    if bands is None:
        bands = minhash_bands(sh, id_col)
    if cands is None:
        cands = lsh_candidate_pairs(bands, id_col)
    shf = df_capped_shingles(sh, id_col)
    sizes = shf.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    e1 = shf.select(F.col(id_col).alias("d1"), "shingle")
    e2 = shf.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        cands.join(e1.hint("shuffle_hash"), "d1")
        .join(e2.hint("shuffle_hash"), ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa.hint("shuffle_hash"), "d1")
        .join(sb.hint("shuffle_hash"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("d1", "d2", "inter", "sz1", "sz2", "jaccard")
    )


def simhash(df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash: token hashes → ±1 votes per bit → sign → packed int.

    Token hashes are applied inline per instance (map-only). Per-bit vote counts
    are packed SIMD-style — each token row folds its ``bits`` bit values into
    ``bits/2`` 32-bit lanes across ``bits/2`` long columns, and one
    map-side-combinable ``sum`` per lane-column accumulates all bit counters
    at once. Versus the naive ``explode(0..bits-1)`` shape this cuts
    pre-combine row volume ``bits``× (one row per token, not one per
    token×bit). The ±1 vote sum never materializes: sign(Σ±1) > 0 ⟺
    2·ones(bit) > n_tokens. Lanes are 32-bit so counts are exact for docs up
    to 2^31 token occurrences — far past any real document."""
    tl = token_long(df, text_col, id_col)
    t = token_hash_long(tl)
    n_lanes = bits // 2  # two 32-bit lanes per long column
    lanes = [
        (
            F.shiftright(F.col("h"), 2 * g).bitwiseAND(F.lit(1))
            + F.shiftleft(F.shiftright(F.col("h"), 2 * g + 1).bitwiseAND(F.lit(1)), 32)
        ).alias(f"_l{g}")
        for g in range(n_lanes)
    ]
    packed = t.select(id_col, *lanes)
    agg = packed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"_l{g}").alias(f"_s{g}") for g in range(n_lanes)],
    )
    mask32 = F.lit((1 << 32) - 1)
    code = F.lit(0).cast("bigint")
    for g in range(n_lanes):
        ones_lo = F.col(f"_s{g}").bitwiseAND(mask32)
        ones_hi = F.shiftrightunsigned(F.col(f"_s{g}"), 32)
        code = (
            code
            + F.when(ones_lo * 2 > F.col("_n"), F.lit(1 << (2 * g)).cast("bigint")).otherwise(F.lit(0))
            + F.when(ones_hi * 2 > F.col("_n"), F.lit(1 << (2 * g + 1)).cast("bigint")).otherwise(F.lit(0))
        )
    return agg.select(id_col, code.cast("bigint").alias("simhash"))


GRAPH_ROWS_PER_PARTITION = 1_000_000  # ~30-60 MB of skinny graph rows
# Parallelism floor: below this many rows a partition is not worth a task,
# above it the frame should spread over the cores that exist. Together with
# the 1M-row scale bound this makes the partition count
#   max(rows/1M, min(defaultParallelism, rows/32k))
# — small frames still collapse (scheduling win), mid-size frames use every
# core (an r15 probe found the 1.17M-row bipartite edge frame coalesced to
# ONE partition, serializing every per-round graph join on local[32]), and
# at cluster scale rows/1M (memory) or defaultParallelism (cores) dominates.
GRAPH_ROWS_PAR_FLOOR = 262_144


def graph_parts(n: int, sc) -> int:
    """Scale- AND parallelism-adaptive partition count for skinny graph
    frames of ``n`` rows (see GRAPH_ROWS_PAR_FLOOR)."""
    return max(
        1,
        -(-n // GRAPH_ROWS_PER_PARTITION),
        min(sc.defaultParallelism, -(-n // GRAPH_ROWS_PAR_FLOOR)),
    )


def ckpt_coalesced(
    df: DataFrame, rows: int | None = None
) -> DataFrame:
    """Eager localCheckpoint + SCALE-ADAPTIVE coalesce (r15 optimization).

    Iterative graph operators checkpoint skinny frames (edges, labels,
    frontiers) every round; the materialized RDD keeps the partition count
    of whatever plan produced it — at small data that is 32-128 near-empty
    partitions, and every downstream round pays a task per partition per
    stage (measured: the per-round stages of pagerank/k-core were
    task-scheduling-bound, not compute-bound). Coalescing the checkpoint to
    ``ceil(rows / rows_per_partition)`` partitions (never more than it
    already has — coalesce only merges) makes the partition count a
    function of DATA SIZE, exactly the guide's scale-adaptive partitioning:
    tiny graphs collapse to a few partitions, a 100 TB edge list keeps its
    thousands. ``coalesce`` on an already-materialized checkpoint is a
    narrow dependency — no second materialization, no shuffle.

    ``rows``: pass the frame's row count when the caller already knows it;
    otherwise one cheap count job over the materialized blocks runs here.

    r15: the target is now parallelism-aware as well (:func:`graph_parts`)
    — and when the materialized frame arrived badly UNDER-partitioned (an
    AQE-coalesced upstream shuffle can hand a million-row frame over in
    1-2 partitions, which would serialize every downstream iteration), it
    is spread once via repartition + a second checkpoint. That branch only
    fires in the under-partitioned regime, where the frame is by
    definition modest (~rows x skinny-row bytes), so the extra
    materialization is a one-time few-hundred-ms cost per session view;
    at cluster scale upstream partitioning already meets the target and
    the branch is dead code.
    """
    ck = df.localCheckpoint(eager=True)
    n = ck.count() if rows is None else rows
    parts = graph_parts(n, ck.sparkSession.sparkContext)
    cur = ck.rdd.getNumPartitions()
    if parts < cur:
        return ck.coalesce(parts)
    if parts >= 2 * cur and n >= 2 * GRAPH_ROWS_PAR_FLOOR:
        return ck.repartition(parts).localCheckpoint(eager=True)
    return ck


def ckpt_capped(df: DataFrame, parts: int) -> DataFrame:
    """Eager localCheckpoint + coalesce to at most ``parts`` partitions —
    the count-free variant of :func:`ckpt_coalesced` for per-round frames
    whose row count is BOUNDED by an already-sized frame (a score/label
    vector is at most node-count long, and nodes <= 2 x edges): reusing the
    edge frame's adaptive partition count avoids paying one count job per
    round while keeping the same scale story (the bound grows with the
    data, so big graphs keep big partition counts)."""
    ck = df.localCheckpoint(eager=True)
    return ck.coalesce(parts) if parts < ck.rdd.getNumPartitions() else ck


def connected_components(pairs: DataFrame, a: str = "d1", b: str = "d2", max_iter: int = 20) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every vertex is
    labeled with the MINIMUM vertex id reachable from it — the canonical
    cluster representative for dedup cluster assignment.

    BSP min-label propagation (the GraphX/GraphFrames CC shape) with
    POINTER JUMPING: each round (1) takes the per-vertex min over
    self ∪ neighbors via one co-partitioned join + one partial-combinable
    aggregation, then (2) shortcuts label ← label(label) with a second join
    on the label key — doubling every label's reach per round, so rounds
    needed are O(log diameter) rather than the propagation radius.
    Convergence (no label changed) is checked with one driver-scalar count
    every OTHER round — halving blocking actions vs per-round checks; LSH
    near-dup graphs are union-of-near-cliques, so 2-3 rounds is typical and
    ``max_iter`` bounds the worst case at components of diameter ~2^max_iter.
    If the bound is ever exhausted mid-propagation the function WARNS rather
    than silently returning partial labels (a downstream exact oracle would
    hash-catch them). No global sorts, no driver-side graph.
    Output: (vertex, cluster).
    """
    import warnings
    # localCheckpoint (not persist): persist caches RESULTS but every
    # round's logical plan would still embed the full upstream lineage —
    # for an LSH pair graph that's the 32×64-literal signature expression
    # tree, re-analyzed per iteration until Catalyst time explodes. An
    # iterative operator must TRUNCATE lineage each round; the checkpointed
    # label set is (vertex, cluster) — tiny at any corpus scale.
    edges = ckpt_coalesced(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    )
    labels = ckpt_coalesced(
        edges.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("cluster", F.col("vertex"))
    )
    converged = False
    base = labels  # last checkpointed label set (comparison baseline)
    for it in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("vertex", "src"), "src"
        ).select(F.col("dst").alias("vertex"), "cluster")
        prop = (
            labels.select("vertex", "cluster")
            .union(nbr)
            .groupBy("vertex")
            .agg(F.min("cluster").alias("cluster"))
        )
        # pointer jump: cluster ids are themselves vertex ids, so joining
        # the label set against itself on the label key yields label(label);
        # labels only decrease, so least() is the shortcutted label.
        jump = prop.select(
            F.col("vertex").alias("cluster"), F.col("cluster").alias("_jc")
        )
        new_labels = prop.join(jump, "cluster", "left").select(
            "vertex",
            F.least(
                F.col("cluster"), F.coalesce(F.col("_jc"), F.col("cluster"))
            ).alias("cluster"),
        )
        # Checkpoint + convergence check every OTHER round (and on the last):
        # a no-change window across a full 2-round batch is a fixed point.
        # Batching halves both the blocking count() actions AND the
        # checkpoint jobs — iterative tiny-result rounds are scheduling-
        # bound, so job count is the cost that matters. Lineage depth stays
        # bounded at 2 rounds (the even round's joins re-evaluate inside the
        # odd round's single job — a ≤2× recompute of one join+agg, cheaper
        # than a whole extra materialization job at every tested scale).
        if it % 2 == 1 or it == max_iter - 1:
            new_labels = ckpt_capped(new_labels, edges.rdd.getNumPartitions())
            changed = (
                new_labels.join(base.withColumnRenamed("cluster", "_old"), "vertex")
                .filter(F.col("cluster") < F.col("_old"))
                .count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
            base = new_labels
        labels = new_labels
    if not converged:
        warnings.warn(
            f"connected_components exhausted max_iter={max_iter} before the "
            "labels reached a fixed point; returned labels may be partially "
            "propagated on components of diameter > ~2^max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def fuzzy_edit_pairs(
    df: DataFrame,
    max_rel_edit: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    bands: DataFrame | None = None,
    cands: DataFrame | None = None,
) -> DataFrame:
    """Blocked fuzzy matching: LSH band buckets generate candidate pairs,
    Levenshtein edit distance verifies them — the character-level near-dup
    join (catches small in-place edits that token-set Jaccard treats as
    whole-token substitutions).

    Scale shape: edit distance is O(len^2) per pair, so it NEVER runs
    all-pairs — only on the banded-MinHash candidate set, whose size the
    per-bucket sorted-neighborhood bound caps at LSH_NEIGHBORHOOD per
    member (see :func:`lsh_candidate_pairs`). The pair join re-reads only
    (id, text) for candidate ids (semi-pruned before the text join), and
    the text joins are SHUFFLE-side (``shuffle_hash`` hints, the
    dup_span_islands discipline): candidate texts grow with the corpus, so
    no BroadcastExchange may ever carry a text column. rel_edit =
    lev / max(len_1, len_2), quantized at 1e-6 for cross-engine equality.
    """
    if sh is None:
        sh = shingle_hashes(df, text_col, id_col)
    if bands is None:
        bands = minhash_bands(sh, id_col)
    if cands is None:
        cands = lsh_candidate_pairs(bands, id_col)
    ids = cands.select(F.col("d1").alias(id_col)).union(cands.select("d2")).distinct()
    texts = df.join(ids, id_col, "left_semi").select(F.col(id_col), F.col(text_col))
    t1 = texts.select(F.col(id_col).alias("d1"), F.col(text_col).alias("_t1"))
    t2 = texts.select(F.col(id_col).alias("d2"), F.col(text_col).alias("_t2"))
    paired = cands.join(t1.hint("shuffle_hash"), "d1").join(t2.hint("shuffle_hash"), "d2")
    lev = F.levenshtein(F.col("_t1"), F.col("_t2"))
    mx = F.greatest(F.length("_t1"), F.length("_t2"))
    rel = F.expr(
        "CAST(floor((CAST(lev AS DOUBLE) / CAST(mx AS DOUBLE)) * 1000000.0D + 0.5D) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE)"
    )
    return (
        paired.withColumn("lev", lev.cast("bigint"))
        .withColumn("mx", mx.cast("bigint"))
        .withColumn("rel_edit", rel)
        .filter(F.col("rel_edit") <= max_rel_edit)
        .select("d1", "d2", "lev", "rel_edit")
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-point PageRank (damping 0.85) over a directed edge list — the
    second iterative-graph operator next to :func:`connected_components`,
    and the canonical join+aggregate-per-round Spark shape.

    Rank lives on a 1e-9 integer lattice: contribution = r div deg and the
    damped update r' = base + (85·S) div 100 are exact BIGINT ops (all
    values nonnegative, so truncating and flooring division agree in every
    engine) — no float reduction anywhere, so the result is independent of
    partitioning and bit-reproducible in the SQL oracle's unrolled
    iteration CTEs.

    Scale shape per round: one hash join ranks⋈edges on the source key and
    one map-side-combinable groupBy(dst) sum. Source-only nodes (out-edges
    but no in-edges) must keep rank = base rather than silently dropping
    out of the rank vector after round 1 (the trap of a rebuild-from-sums
    formulation) — and because their update sum is 0 EVERY round, their
    rank is the constant base: they are computed ONCE up front as the
    anti-join nodes ∖ dst and unioned into each round's rank vector, which
    costs nothing per round instead of a per-round left join against the
    full node set. The degree-annotated edge list and the constant rows are
    localCheckpointed once, and the rank vector re-checkpoints every
    ``checkpoint_every`` rounds — the same lineage-truncation discipline as
    :func:`connected_components`, keeping the per-round plan size flat
    however many iterations run. Dangling nodes (in-edges but no out-edges)
    keep their rank but their mass is not redistributed (the standard
    dangling correction is out of scope).
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    e = ckpt_coalesced(edges.join(deg, src))
    nodes = ckpt_coalesced(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    init = (10**9) // n_nodes
    base = (15 * 10**7) // n_nodes
    # nodes that no edge points at: rank is base + 0.85·0 = base, forever
    no_in = ckpt_coalesced(
        nodes.join(
            edges.select(F.col(dst).alias("node")).distinct(), "node", "left_anti"
        ).select("node", F.lit(base).cast("bigint").alias("r"))
    )
    ranks = nodes.select("node", F.lit(init).cast("bigint").alias("r"))
    for i in range(iters):
        contrib = e.join(ranks, F.col(src) == F.col("node")).select(
            F.col(dst).alias("node_to"), F.expr("r div deg").alias("c")
        )
        s = contrib.groupBy("node_to").agg(F.sum("c").alias("S"))
        ranks = s.select(
            F.col("node_to").alias("node"),
            (F.lit(base).cast("bigint") + F.expr("(85 * S) div 100")).alias("r"),
        ).unionByName(no_in)
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ckpt_coalesced(ranks)
    return ranks.select(
        "node",
        F.col("r").alias("rank_q"),
        (F.col("r").cast("double") / F.lit(1e9)).alias("rank"),
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.) — the
    community-detection member of the graph family next to
    :func:`connected_components` (reachability), :func:`pagerank_fixed_point`
    (centrality) and :func:`triangle_counts` (clustering): every node starts
    as its own label; each round it adopts the most frequent label among its
    neighbors, ties broken to the SMALLEST label — fully deterministic, so
    the fixed-round run is replayed exactly by the oracle's unrolled
    iteration CTEs (the async/randomized LPA variants trade that for faster
    convergence; a data engine wants the bit-reproducible one).

    Scale shape per round: one hash join labels⋈edges on the source key,
    one map-side-combinable count per (node, label), and one combinable
    struct-min argmax per node (max count, then min label, as a single
    ordered struct — no window, no per-node sort). Nodes without in-edges
    keep their current label via the left-join coalesce. Same lineage-
    truncation discipline as the other iterative operators.

    Output: (community, n_members) — the label histogram after ``iters``
    synchronous rounds (on bipartite graphs synchronous LPA can oscillate
    with period 2; the fixed round count pins WHICH side of the oscillation
    is reported, identically in both engines).
    """
    nodes = ckpt_coalesced(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for i in range(iters):
        cnt = (
            edges.join(labels, F.col(src) == F.col("node"))
            .groupBy(F.col(dst).alias("node_to"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            cnt.groupBy("node_to")
            .agg(
                F.min(
                    F.struct((-F.col("c")).cast("bigint").alias("nc"), F.col("lbl").alias("l"))
                ).alias("m")
            )
            .select(F.col("node_to").alias("node"), F.col("m.l").alias("nlbl"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("nlbl", "lbl").alias("lbl"))
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            labels = ckpt_coalesced(labels)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


def triangle_counts(
    edges: DataFrame,
    a: str = "u",
    b: str = "v",
    pre_canonical: bool = False,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle participation counts via DEGREE ORIENTATION — the
    third iterative/graph operator beside :func:`connected_components` and
    :func:`pagerank_fixed_point`, and the canonical skew-bounded self-join.

    The naive wedge join (edges ⋈ edges on a shared endpoint) explodes on
    hub nodes: a degree-d vertex generates d² wedges, so one celebrity key
    produces a straggler task at 100 TB. Orienting every undirected edge
    from its lower-(degree, id) endpoint to the higher one caps every
    vertex's OUT-degree at O(√m) (a classical bound: a node of out-degree
    k has k neighbors of degree ≥ its own, and Σdeg = 2m), so the wedge
    join is O(m^1.5) total with no skewed build key — each triangle is
    counted exactly once, rooted at its lowest-(deg, id) vertex.

    Plan shape: one distinct (canonical-edge shuffle), one count per
    endpoint (map-side combinable), two broadcast joins of the skinny
    degree table onto the edge list, one self-join of the oriented edges
    on src, and one hash join back against the canonical edge set to close
    each wedge. Everything equi-join — no cross product anywhere.

    ``pre_canonical``: pass True when ``edges`` is already the canonical
    undirected edge set (u < v, distinct, ideally persisted — e.g. the
    session-lifetime co-purchase view in plans/shared.py) to skip the
    least/greatest + distinct shuffle and the internal persist.

    ``deg`` contract (r16, per the r15 advisor): a caller-supplied degree
    frame must be computed over the SAME canonical distinct edge set this
    function orients. With ``pre_canonical=False`` the function
    canonicalizes+distincts internally, so a ``deg`` built over the raw
    edge multiset can disagree — counts stay CORRECT (any consistent total
    order orients acyclically; every triangle is still rooted exactly
    once), but the O(√m) out-degree bound that the shuffle_hash/no-skew
    notes below rely on silently breaks. When in doubt pass ``deg=None``
    and let it recompute.
    """
    u, v = F.col(a), F.col(b)
    if pre_canonical:
        und = edges.select(u.alias("u"), v.alias("v"))
    else:
        und = (
            edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        und.persist()  # consumed twice: orientation source + wedge-closing probe
    if deg is None:
        # ``deg``: pass a precomputed (node, deg) frame — e.g. the session
        # degree view in plans/shared.py — to skip this 2|E|-row aggregation.
        deg = (
            und.select(F.col("u").alias("node"))
            .unionAll(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ann = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    # SHUFFLE_HASH, explicitly: the wedge self-join must never SORT the
    # oriented edge list (both sides are the full edge set; O(√m)-bounded
    # out-degree means no skewed build key). Without the hint the strategy
    # rides on Catalyst's crude join-output size estimate — measured
    # flipping to SortMergeJoin when ``deg`` arrives as a pre-built view
    # instead of an inline aggregate. AQE still upgrades to broadcast at
    # runtime when the shuffled side is actually small.
    wedges = e1.join(e2.hint("shuffle_hash"), "src").filter(
        F.col("e1.dst") < F.col("e2.dst")
    ).select("src", F.col("e1.dst").alias("d1"), F.col("e2.dst").alias("d2"))
    # close the wedge against the canonical edge set (d1 < d2 already).
    # SHUFFLE_HASH: the wedge side is ~Σdeg² rows (34x the edge list here) —
    # a sort-merge join would SORT it; hashing the small edge side instead
    # turns the probe into a streaming pass over the wedges.
    tri = wedges.join(
        und.hint("shuffle_hash"),
        (und["u"] == F.col("d1")) & (und["v"] == F.col("d2")),
    ).select("src", "d1", "d2")
    # one Generate over each triangle's three corners (a 3-way union would
    # repeat the whole wedge subtree per branch and lean on exchange reuse)
    nodes = tri.select(
        F.explode(F.array(F.col("src"), F.col("d1"), F.col("d2"))).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


DUP_SPAN_K = 32  # char window: long enough that matches are real reuse


def char_kgram_hashes(
    df: DataFrame,
    k: int = DUP_SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int | None = None,
) -> DataFrame:
    """(id, pos, h): polynomial hash of every length-``k`` character window,
    1-based positions — computed as a ROLLING hash in O(len) per document,
    not O(len·k) substring refolds.

    The window algebra: with P_i the classic char fold (P_i = 31·P_{i-1} +
    c_i mod M), the window hash is H(i) = P_{i+k-1} − 31^k·P_{i-1}. Writing
    scaled_j = c_j·31^{−j} and S_i = Σ_{j≤i} scaled_j (all mod the prime M,
    31^{−1} by Fermat), H(i) = 31^{i+k-1}·(S_{i+k-1} − S_{i-1}) — so ONE
    Generate (char explode), one broadcast join against a tiny powers dim,
    one per-doc window (running sum + lead(k−1)) and a final multiply
    produce every window hash. No per-position substring materializes.

    ``max_len``: positions beyond it are ignored (the powers dim is that
    long). Defaults to the corpus max length via one driver agg — pass it
    explicitly at real scale to skip that scan. Intermediate products stay
    under 2^62 < int64.
    """
    if max_len is None:
        max_len = (
            df.agg(F.max(F.length(text_col)).alias("m")).collect()[0]["m"] or 1
        )
    spark = df.sparkSession
    inv31 = pow(31, M - 2, M)
    rows, p, ip = [], 1, 1
    for i in range(max_len + 1):
        rows.append((i, p, ip))
        p = (p * 31) % M
        ip = (ip * inv31) % M
    powers = spark.createDataFrame(rows, "i int, p31 long, ip31 long")
    codes = F.expr(
        f"transform(sequence(1, least(length({text_col}), {max_len})), "
        f"j -> ascii(substring({text_col}, j, 1)))"
    )
    chars = df.select(
        F.col(id_col), F.posexplode(codes).alias("pos0", "c")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "c")
    scaled = chars.join(
        F.broadcast(powers.withColumnRenamed("i", "pos")), "pos"
    ).select(id_col, "pos", F.pmod(F.col("c") * F.col("ip31"), F.lit(M)).alias("sc"))
    w = W.partitionBy(id_col).orderBy("pos")
    pre = scaled.select(
        id_col,
        "pos",
        F.sum("sc").over(w).alias("s_incl"),
        F.col("sc"),
    ).select(
        id_col,
        "pos",
        F.pmod(F.col("s_incl"), F.lit(M)).alias("s_i"),
        F.pmod(F.col("s_incl") - F.col("sc"), F.lit(M)).alias("s_prev"),
    )
    win = pre.select(
        id_col,
        "pos",
        F.lead("s_i", k - 1).over(w).alias("s_end"),
        "s_prev",
    ).filter(F.col("s_end").isNotNull())
    mult = powers.select((F.col("i") - k + 1).alias("pos"), F.col("p31").alias("mul"))
    return win.join(F.broadcast(mult), "pos").select(
        F.col(id_col),
        F.col("pos"),
        F.pmod(
            F.pmod(F.col("s_end") - F.col("s_prev"), F.lit(M)) * F.col("mul"), F.lit(M)
        ).alias("h"),
    )


def char_kgram_hashes_np(
    df: DataFrame,
    k: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`char_kgram_hashes` computed in ONE Arrow island instead of the
    char-explode + powers-join + double-window chain — bit-identical values
    by construction (guide §4.2: hand whole batches to vectorized numpy).

    The SQL chain materializes one row PER CHARACTER (posexplode), joins a
    powers dim, and runs two per-doc window passes — measured ~4-8 s at
    sf0.1 for 1.5 M chars, all shuffle/window machinery around ~0.1 s of
    arithmetic. Here each task computes the IDENTICAL lattice per doc in
    numpy int64: sc_j = c_j·31^{−j} mod M, S = cumsum(sc) mod M,
    H(i) = (S_{i+k−1} − S_{i−1})·31^{i+k−1} mod M — the same algebra, the
    same modulus, the same int64 intermediate bounds (c·ip31 < 2^52,
    per-doc cumsum < len·M as in the SQL window sum, final product < M² <
    2^62), so every hash value is the same 64-bit integer the SQL chain
    yields (pytest parity-asserts island == SQL chain per row). Docs
    shorter than ``k`` contribute no rows, exactly like the SQL chain's
    lead(k−1) null filter. Only (id, text) cross the Python boundary, and
    positions/hashes come back — no per-character row ever exists in the
    JVM."""
    import pandas as pd  # noqa: F401  (imported for the island closure)

    id_field = df.schema[id_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, pos int, h long"
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        # powers tables grow once per task to the longest doc seen
        p31 = np.array([1], dtype=np.int64)
        ip31 = np.array([1], dtype=np.int64)
        inv31 = pow(31, M - 2, M)

        def grow(n: int) -> None:
            nonlocal p31, ip31
            if len(p31) > n:
                return
            old = len(p31)
            p31 = np.resize(p31, n + 1)
            ip31 = np.resize(ip31, n + 1)
            for i in range(old, n + 1):
                p31[i] = (p31[i - 1] * 31) % M
                ip31[i] = (ip31[i - 1] * inv31) % M

        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                L = len(txt)
                if L < k:
                    continue
                grow(L)
                c = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                sc = (c * ip31[1 : L + 1]) % M
                s = np.cumsum(sc) % M
                s_prev = (s - sc) % M
                n = L - k + 1
                h = ((s[k - 1 :] - s_prev[:n]) % M) * p31[k : L + 1]
                h %= M
                ids.append(np.full(n, did))
                poss.append(np.arange(1, n + 1, dtype=np.int32))
                hs.append(h)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "h": np.concatenate(hs),
                }
            )

    src = df.select(id_col, text_col)
    # The island inherits the scan's partitioning; a small corpus read as
    # one parquet split would hash single-threaded (and its 2 consumers —
    # hot list + probe side — would both run serial). Repartition UP to the
    # session parallelism only when the scan is narrower: at real scale the
    # scan already has >= cores splits and this branch is a no-op, so no
    # text bytes are shuffled where it matters (guide §2: scale-adaptive
    # partitioning, not a constant).
    target = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(gen, schema=out_schema)


DUP_SPAN_HOT_CAP = 128  # max corpus-wide occurrences of a k-gram hash


def duplicate_spans(
    df: DataFrame,
    k: int = DUP_SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_cap: int = DUP_SPAN_HOT_CAP,
    islands: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr-style cross-document duplicate span detection: find every
    maximal run of characters (length ≥ k) shared verbatim between two
    documents — the char-level dedup signal (Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better" suffix-array method,
    re-expressed as Spark-native window algebra): boilerplate, licenses,
    and templated spans that token-set Jaccard dilutes.

    Shape: rolling k-gram hashes (O(len)/doc); ENFORCED hot-k-gram cap
    (k-gram hashes occurring > ``hot_cap`` times corpus-wide are dropped
    before the candidate join — a boilerplate k-gram shared by f documents
    would otherwise contribute O(f²) candidate pairs, the skew-quadratic
    failure mode at 100 TB; the cap bounds any one hash's contribution at
    hot_cap², and the hot-hash list is produced by a map-side-combinable
    count, never by collecting occurrences); one equi-join on the hash
    (candidates = true matches + rare collisions); substring equality kills
    collisions — texts are fetched semi-pruned for candidate docs only and
    joined with SHUFFLE_HASH hints, never broadcast: the candidate doc set
    is unbounded at corpus scale, so no BroadcastExchange may carry a text
    column (plan-asserted in tests/test_plans.py). A shared span of length
    L then appears as L−k+1 consecutive matches at one positional delta —
    gaps-and-islands (pos − row_number) collapses each to one row. Never an
    all-pairs doc join; candidate volume is bounded by hot_cap × matches.

    Output: (d1, d2, n_kgrams, n_spans, max_span_chars) per document pair.

    ``islands``: pass a precomputed (ideally checkpointed) island frame from
    :func:`dup_span_islands` over the SAME (df, k, hot_cap) to share the
    rolling-hash + candidate-join pass across consumers in a session
    (plans/shared.span_islands_df).
    """
    spans = islands if islands is not None else dup_span_islands(
        df, k=k, text_col=text_col, id_col=id_col, hot_cap=hot_cap
    )
    return spans.groupBy("d1", "d2").agg(
        F.sum("n_matches").cast("bigint").alias("n_kgrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        (F.max("n_matches") + F.lit(k) - 1).cast("bigint").alias("max_span_chars"),
    )


def _span_candidates(
    df: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    hot_cap: int,
) -> DataFrame:
    """The pre-verify candidate frame of :func:`dup_span_islands`: rolling
    k-gram hashes (numpy island — bit-identical to the SQL chain), the
    hot-k-gram frequency cap (LeftAnti — the 100 TB quadratic-skew bound,
    plan-asserted in tests/test_plans.py on THIS function since the island
    builder checkpoints its output), and the hash equi-self-join."""
    g = char_kgram_hashes_np(df, k=k, text_col=text_col, id_col=id_col)
    # hot-hash list: partial-aggregated count per hash, then an anti join.
    # Typically tiny (AQE broadcasts it); correct as a shuffle join even
    # when a boilerplate-heavy corpus makes it large.
    hot = g.groupBy("h").agg(F.count(F.lit(1)).alias("_hf")).filter(
        F.col("_hf") > hot_cap
    ).select("h")
    g_cap = g.join(hot, "h", "left_anti")
    # self-join over ONE aliased frame (not two renamed projections): the
    # two join inputs canonicalize identically, so the rolling-hash +
    # anti-join lineage shuffles once and the second side is a
    # ReusedExchange — renamed projections would recompute it per side.
    x, y = g_cap.alias("x"), g_cap.alias("y")
    return x.join(
        y,
        (F.col("x.h") == F.col("y.h")) & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(
        F.col(f"x.{id_col}").alias("d1"),
        F.col("x.pos").alias("p1"),
        F.col(f"y.{id_col}").alias("d2"),
        F.col("y.pos").alias("p2"),
    )


def dup_span_islands(
    df: DataFrame,
    k: int = DUP_SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_cap: int = DUP_SPAN_HOT_CAP,
) -> DataFrame:
    """The island-level duplicate-span frame shared by
    :func:`duplicate_spans` (pair accounting) and
    :func:`remove_duplicate_spans` (text surgery): one row per maximal
    shared run at one positional delta — (d1, d2, delta, p1s = the run's
    start in d1, n_matches). See :func:`duplicate_spans` for the full
    scale-shape discussion (rolling hashes, hot-k-gram cap, shuffle-side
    text verify)."""
    cand = ckpt_coalesced(
        _span_candidates(df, k=k, text_col=text_col, id_col=id_col, hot_cap=hot_cap)
    )
    # ^ r15: the candidate frame is consumed three+ ways below (ids derives
    # from it twice, the verify join once); without a barrier each consumer
    # re-executes the hash self-join's sort+merge (only the exchanges
    # beneath it are runtime-reused). The frame is tiny by construction
    # (hot_cap bounds any hash's contribution at hot_cap²), so one eager
    # localCheckpoint + scale-adaptive coalesce replaces 3 merge-join
    # executions with 1 (measured 7.3 -> 6.0 s steady at sf0.1 before the
    # island hasher, on top of which the hasher takes the build to ~3 s).
    ids = cand.select(F.col("d1").alias(id_col)).union(cand.select("d2")).distinct()
    texts = df.join(ids, id_col, "left_semi").select(id_col, text_col)
    t1 = texts.select(F.col(id_col).alias("d1"), F.col(text_col).alias("_t1"))
    t2 = texts.select(F.col(id_col).alias("d2"), F.col(text_col).alias("_t2"))
    verified = (
        cand.join(t1.hint("shuffle_hash"), "d1")
        .join(t2.hint("shuffle_hash"), "d2")
        .filter(
            F.expr(f"substring(_t1, p1, {k})") == F.expr(f"substring(_t2, p2, {k})")
        )
        .select("d1", "d2", "p1", "p2")
    )
    iw = W.partitionBy("d1", "d2", "delta").orderBy("p1")
    islands = verified.withColumn("delta", F.col("p2") - F.col("p1")).withColumn(
        "isl", F.col("p1") - F.row_number().over(iw)
    )
    return islands.groupBy("d1", "d2", "delta", "isl").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p1").alias("p1s"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = DUP_SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_cap: int = DUP_SPAN_HOT_CAP,
    islands: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL — the "remove" half of Lee et
    al.'s char-level dedup that :func:`duplicate_spans` only detects: of
    every maximal cross-document shared run (length ≥ k), the occurrence in
    the HIGHER doc_id is cut from its text (keep-first, the same star-
    collapse convention as the embedding dedups), producing the cleaned
    corpus a training pipeline actually feeds downstream.

    Shape: intervals to remove come from the shared island frame
    (:func:`dup_span_islands` — the d2 occurrence spans chars
    [p1s+delta, p1s+delta+n_matches+k−1)); overlapping intervals merge via
    the classic running-max gaps-and-islands (per-doc window, never
    global); the surgery itself is ONE aggregate HOF per doc — a linear
    fold over the doc's sorted merged intervals concatenating the kept
    substrings (O(len) per doc, no per-character explode, no UDF). Docs
    with nothing to remove pass through the left join untouched.

    Output: (doc_id, n_before, n_removed, n_after, cleaned_hash) — the
    hash is the polynomial char fold of the CLEANED text, so the oracle
    verifies the byte-exact result of the surgery, not just the lengths.
    """
    from .textops import poly_hash_sql_expr

    isl = islands if islands is not None else dup_span_islands(
        df, k=k, text_col=text_col, id_col=id_col, hot_cap=hot_cap
    )
    iv = isl.select(
        F.col("d2").alias(id_col),
        (F.col("p1s") + F.col("delta")).alias("s"),
        (F.col("p1s") + F.col("delta") + F.col("n_matches") + F.lit(k - 1)).alias("e"),
    )
    ow = W.partitionBy(id_col).orderBy("s", "e")
    run = iv.withColumn(
        "emax", F.max("e").over(ow.rowsBetween(W.unboundedPreceding, -1))
    )
    grp = run.withColumn(
        "grp",
        F.sum(
            F.when(F.col("emax").isNull() | (F.col("s") > F.col("emax")), 1).otherwise(0)
        ).over(ow),
    )
    merged = grp.groupBy(id_col, "grp").agg(F.min("s").alias("s"), F.max("e").alias("e"))
    ivs = merged.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_ivs")
    )
    out = df.select(id_col, text_col).join(ivs, id_col, "left")
    # linear fold over the sorted intervals: acc = kept text so far, pos =
    # first char not yet emitted; finish by emitting the tail
    cleaned = F.when(F.col("_ivs").isNull(), F.col(text_col)).otherwise(
        F.expr(
            f"aggregate(_ivs, struct(1L as pos, '' as acc), "
            f"(st, iv) -> struct(cast(iv.e as bigint) as pos, "
            f"concat(st.acc, substring({text_col}, cast(st.pos as int), "
            f"greatest(cast(iv.s - st.pos as int), 0))) as acc), "
            f"st -> concat(st.acc, substring({text_col}, cast(st.pos as int), "
            f"greatest(cast(length({text_col}) - st.pos as int) + 1, 0))))"
        )
    )
    return (
        out.withColumn("_cleaned", cleaned)
        .select(
            F.col(id_col),
            F.length(text_col).cast("bigint").alias("n_before"),
            (F.length(text_col) - F.length("_cleaned")).cast("bigint").alias("n_removed"),
            F.length("_cleaned").cast("bigint").alias("n_after"),
            F.expr(poly_hash_sql_expr("_cleaned")).cast("bigint").alias("cleaned_hash"),
        )
    )


def canonical_url(url) -> "F.Column":
    """Web-corpus URL canonicalization (the normalization every crawl dedup
    runs before exact URL dedup — CCNet/RefinedWeb-style): lowercase scheme
    and host, strip a default :443 port, drop the fragment, drop tracking
    params (utm_*, sid=), SORT the surviving query params, and strip one
    trailing slash from a non-root path. Pure JVM column program — string
    splits, HOF filter, array_sort — no UDF; the oracle replays the same
    steps in SQL, so both engines must normalize byte-identically.

    Contract: absolute URLs (``scheme://host[:port]/path[?query][#frag]``).
    """
    c = F.col(url) if isinstance(url, str) else url
    nofrag = F.split(c, "#").getItem(0)
    sr = F.split(nofrag, "://")
    scheme = F.lower(sr.getItem(0))
    rest = sr.getItem(1)
    hostport = F.split(rest, "/").getItem(0)
    pathq = rest.substr(F.length(hostport) + F.lit(1), F.length(rest))
    host = F.lower(hostport)
    host = F.when(
        host.endswith(":443"), host.substr(F.lit(1), F.length(host) - F.lit(4))
    ).otherwise(host)
    pq = F.split(pathq, r"\?")
    path = pq.getItem(0)
    qstr = F.coalesce(F.try_element_at(pq, F.lit(2)), F.lit(""))
    path = F.when(
        (path != F.lit("/")) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - F.lit(1)),
    ).otherwise(path)
    kept = F.array_sort(
        F.filter(
            F.split(qstr, "&"),
            lambda x: (F.substring(x, 1, 4) != F.lit("utm_"))
            & (F.substring(x, 1, 4) != F.lit("sid="))
            & (x != F.lit("")),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )


def containment_pairs(
    sh: DataFrame, min_containment: float, id_col: str = "doc_id", df_capped: bool = True
) -> DataFrame:
    """Shingle CONTAINMENT over the inverted index — the asymmetric near-dup
    measure Jaccard misses: C = inter / min(|A|, |B|) flags a short doc
    quoted or templated inside a long one (their Jaccard is diluted by the
    long doc's size; their containment is ~1). Same scale shape as
    :func:`jaccard_pairs` — intersections form only on shared shingles
    (equi-join on the integer shingle id, never all-pairs), sizes are
    combinable counts, and the containment division is one exact
    integer-over-integer double op.

    Output: (d1, d2, inter, sz1, sz2, containment) with containment ≥ the
    threshold; d1 < d2 by id, the direction is recoverable from the sizes.

    Hot shingles (df > greatest(5, n_docs div 100)) are anti-joined away
    before the self-join (:func:`df_capped_shingles` — C(df, 2) rows per hot
    shingle otherwise), so containment is measured over the df-capped
    shingle space; truncation is visible via :func:`shingle_df_stats`.
    """
    if df_capped:
        sh = df_capped_shingles(sh, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    out = (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn(
            "containment",
            F.col("inter").cast("double") / F.least("sz1", "sz2").cast("double"),
        )
    )
    return out.filter(F.col("containment") >= F.lit(min_containment)).select(
        "d1",
        "d2",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("sz1").cast("bigint").alias("sz1"),
        F.col("sz2").cast("bigint").alias("sz2"),
        "containment",
    )


def kcore_peel(edges: DataFrame, k: int, rounds: int = 8) -> DataFrame:
    """Fixed-round k-core peel over a canonical undirected edge list
    ``(u, v)`` with u < v: each round drops every vertex whose CURRENT
    degree is below ``k`` (and the edges touching it), exactly ``rounds``
    times — the deterministic, SQL-unrollable form of k-core decomposition
    (idempotent once converged, like the LPA/PageRank fixed-round specs).
    Output: (node, core_deg) — each surviving vertex's degree inside the
    peeled subgraph.

    Scale shape per round: one map-side-combinable degree count plus two
    semi joins of the edge list against the (smaller) survivor set — all
    hash-partitioned on vertex id, no windows, no collect. Each round
    materializes once (eager localCheckpoint, cutting lineage so the plan
    never stacks ``rounds`` joins deep) and then counts the checkpointed
    edges — the count doubles as the fixed-point probe (no edge dropped ⇒
    every further peel is the identity ⇒ early-exit), and it scans the
    already-materialized checkpoint blocks, not the join lineage, so the
    probe is the cheap half of the pair of jobs.
    """
    e = edges.select("u", "v")
    n_edges = None
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        keep = deg.filter(F.col("_d") >= k).select("n")
        e = e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi").join(
            keep.withColumnRenamed("n", "v"), "v", "left_semi"
        )
        # materialize each round (cuts lineage) and early-exit at the fixed
        # point: once no edge drops, every further peel is the identity, so
        # stopping here returns exactly what the full `rounds` unroll (and
        # the oracle's unrolled CTEs) would
        e = e.localCheckpoint(eager=True)
        n_now = e.count()
        # scale- and parallelism-adaptive partition count for the next
        # round's scans (narrow coalesce over the materialized blocks —
        # see ckpt_coalesced / graph_parts)
        parts = graph_parts(n_now, e.sparkSession.sparkContext)
        if parts < e.rdd.getNumPartitions():
            e = e.coalesce(parts)
        if n_now == n_edges:
            break
        n_edges = n_now
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
    )


def bfs_hops(
    edges: DataFrame,
    n_sources: int = 8,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round multi-source BFS with nearest-hub attribution — the
    reachability/traversal member of the graph family (CC = components,
    PageRank = centrality, LPA = community, triangles = clustering,
    k-core = density).

    Sources are the ``n_sources`` highest-degree vertices (out-degree over
    the symmetric edge list, ties to the smaller id — fully deterministic).
    Output: ``(node, hop, hub)`` for every vertex reached within ``rounds``
    hops, where ``hop`` is the true BFS distance to the NEAREST hub and
    ``hub`` is the smallest hub id among those at that minimal distance.

    The min-hub attribution is consistent under per-round min-propagation:
    if hub h achieves dist(n) = r through neighbor m, then dist(m) = r-1
    and m's attributed hub h' <= h also reaches n in r hops — so taking
    ``min(neighbor hubs)`` over the round-(r-1) frontier yields exactly
    ``min{h : dist(n, h) = dist(n)}`` by induction, never a path-dependent
    accident.

    Scale shape per round: one hash join frontier⋈edges on the source key,
    one map-side-combinable groupBy(dst) min, and one anti join against the
    assigned set — frontier and assigned are both O(V), never O(V·hubs).
    Frontier and assigned localCheckpoint each round (the PageRank lineage
    discipline), and an empty frontier early-exits: no new vertex this
    round means none later, so stopping returns exactly what the full
    unroll (and the oracle's CTE chain) would.
    """
    from pyspark.sql import Window

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_d"))
    hubs = (
        deg.withColumn(
            "_rn",
            F.row_number().over(Window.orderBy(F.desc("_d"), F.asc(src))),
        )
        .filter(F.col("_rn") <= n_sources)
        .select(F.col(src).alias("node"))
    )
    assigned = ckpt_coalesced(
        hubs.select(
            "node", F.lit(0).cast("int").alias("hop"), F.col("node").alias("hub")
        ),
        rows=n_sources,
    )
    frontier = assigned.select("node", "hub")
    for r in range(1, rounds + 1):
        cand = (
            edges.join(frontier, edges[src] == frontier["node"])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.min("hub").alias("hub"))
        )
        new = cand.join(assigned.select("node"), "node", "left_anti").select(
            "node", F.lit(r).cast("int").alias("hop"), "hub"
        )
        new = new.localCheckpoint(eager=True)
        n_new = new.count()  # doubles as the empty-frontier probe
        if n_new == 0:
            break
        parts = graph_parts(n_new, new.sparkSession.sparkContext)
        if parts < new.rdd.getNumPartitions():
            new = new.coalesce(parts)
        assigned = ckpt_capped(assigned.unionAll(new), edges.rdd.getNumPartitions())
        frontier = new.select("node", "hub")
    return assigned


def hits_fixed_point(
    pairs: DataFrame, iters: int = 4, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999) over a directed edge list — the
    hub/authority member of the iterative-graph family next to
    :func:`pagerank_fixed_point` (reference anchor: the same join+agg-per-
    round Pregel shape; compare src/anomaly_detection/ has no graph code —
    this is §2.12 extension surface).

    Scores live on an integer lattice: h0 = 10^9 per source node, and each
    half-round renormalizes by the INTEGER scale factor
    ``score div greatest(1, total div 10^9)`` — every operand nonnegative
    BIGINT, so truncating division floors identically in both engines and
    the whole fixed point is partition-independent and replayable by
    unrolled SQL CTEs (the pagerank oracle discipline; float L2
    normalization would order-diverge).

    Scale shape per round: two hash joins (scores⋈edges on src, then on
    dst) and two map-side-combinable sums; the normalizer is a broadcast
    1-row aggregate, never a driver collect. Each half-round's raw sum
    frame is localCheckpointed BEFORE its normalizer broadcasts: the
    1-row aggregate and the normalized frame both consume the raw sums,
    and without the lineage cut each consumer re-executes the entire
    upstream chain — the same 2^depth re-expansion the oracle's
    MATERIALIZED CTEs prevent (measured: 4 rounds ran ~28 s at EVERY SF
    un-checkpointed, ~2 s with the cuts; score frames are node-count
    skinny, so the checkpoints are kilobytes).
    """
    if iters < 1:
        raise ValueError(f"hits_fixed_point requires iters >= 1, got {iters}")
    e = ckpt_coalesced(pairs.select(src, dst))
    parts_e = e.rdd.getNumPartitions()
    hubs = (
        e.select(F.col(src).alias("node")).distinct().select("node", F.lit(10**9).cast("bigint").alias("h"))
    )
    auths = None
    for _ in range(iters):
        a = (
            e.join(hubs, F.col(src) == F.col("node"))
            .groupBy(F.col(dst).alias("anode"))
            .agg(F.sum("h").alias("a"))
        )
        a = ckpt_capped(a, parts_e)
        sa = a.agg(F.sum("a").alias("sa"))
        auths = (
            a.crossJoin(F.broadcast(sa))
            .select(
                F.col("anode"),
                F.expr("a div greatest(1L, sa div 1000000000L)").alias("a"),
            )
        )
        h = (
            e.join(auths, F.col(dst) == F.col("anode"))
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        h = ckpt_capped(h, parts_e)
        sh = h.agg(F.sum("h").alias("sh"))
        hubs = (
            h.crossJoin(F.broadcast(sh))
            .select(
                "node",
                F.expr("h div greatest(1L, sh div 1000000000L)").alias("h"),
            )
        )
    hub_rows = hubs.select(
        F.lit("hub").alias("role"),
        "node",
        F.col("h").cast("bigint").alias("score_q"),
        (F.col("h").cast("double") / F.lit(1e9)).alias("score"),
    )
    auth_rows = auths.select(
        F.lit("auth").alias("role"),
        F.col("anode").alias("node"),
        F.col("a").cast("bigint").alias("score_q"),
        (F.col("a").cast("double") / F.lit(1e9)).alias("score"),
    )
    return hub_rows.unionByName(auth_rows)
