"""Deduplication operators: exact, fingerprint, n-gram Jaccard, MinHash+LSH,
SimHash — the scale path for 100 TB corpus dedup.

Design notes (why each shape survives 100× scale-up):
- Exact/fingerprint dedup is a hash-shuffle groupBy on the fingerprint — one
  shuffle, map-side combinable.
- N-gram Jaccard goes through an inverted index (explode shingle → join on
  shingle) rather than a cross join: cost ∝ Σ posting-list², never N².
- MinHash+LSH replaces the inverted index with banded signature buckets:
  candidates are pairs sharing a band key, then verified with exact Jaccard.
  Signature computation is per-row (no shuffle); bucketing is one groupBy.
- All hashing is the engine-defined polynomial fold (textops), so the DuckDB
  oracle reproduces results bit-exactly — no reliance on engine hash().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.rng import M
from .textops import fingerprint, poly_hash_sql_expr

N_HASHES = 16
N_BANDS = 4
BAND_ROWS = N_HASHES // N_BANDS


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


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document, exploded long form.

    `transform(sequence(...))` builds shingles inside codegen; explode gives
    the inverted-index layout (shingle, doc)."""
    toks = f"split({text_col}, ' ')"
    parts = ", ".join(f"{toks}[i + {k}]" for k in range(n))
    sh = f"array_distinct(transform(sequence(0, size({toks}) - {n}), i -> concat_ws(' ', {parts})))"
    return (
        df.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(F.col(id_col), F.explode(F.expr(sh)).alias("shingle"))
    )


def jaccard_pairs(
    sh: DataFrame, min_jaccard: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard over the inverted index.

    sizes: |A| per doc; intersections via self-join on shingle (d1 < d2);
    J = inter / (|A| + |B| - inter). Integer arithmetic → exact cross-engine.
    """
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
    return (
        inter.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("d1", "d2", "inter", "sz1", "sz2", "jaccard")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature (N_HASHES affine permutations over the
    polynomial shingle hash) + banded LSH keys. Entirely per-row codegen —
    zero shuffle until bucketing."""
    toks = f"split({text_col}, ' ')"
    parts = ", ".join(f"{toks}[i + {k}]" for k in range(3))
    sh = f"array_distinct(transform(sequence(0, size({toks}) - 3), i -> concat_ws(' ', {parts})))"
    sh_hashes = f"transform({sh}, s -> {poly_hash_sql_expr('s')})"
    sig = (
        f"transform(sequence(0, {N_HASHES - 1}), j -> "
        f"array_min(transform({sh_hashes}, h -> pmod((2*j + 3) * h + 5*j + 1, {M}L))))"
    )
    bands = (
        f"transform(sequence(0, {N_BANDS - 1}), b -> "
        f"array_join(transform(slice(sig, b * {BAND_ROWS} + 1, {BAND_ROWS}), x -> cast(x as string)), '-'))"
    )
    return (
        df.filter(F.size(F.split(F.col(text_col), " ")) >= 3)
        .select(F.col(id_col), F.expr(sig).alias("sig"))
        .select(F.col(id_col), F.posexplode(F.expr(bands)).alias("band", "band_key"))
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs sharing ≥1 band bucket."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame, min_jaccard: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """MinHash→LSH→exact-verify: the scalable near-dup join. Candidates from
    band buckets, then exact Jaccard only on candidates (semi-join pruned)."""
    bands = minhash_signatures(df, text_col, id_col)
    cands = lsh_candidate_pairs(bands, id_col)
    sh = shingles(df, 3, text_col, id_col)
    pruned = sh.join(
        F.broadcast(
            cands.select(F.col("d1").alias(id_col))
            .union(cands.select("d2"))
            .distinct()
        ),
        id_col,
        "left_semi",
    )
    exact = jaccard_pairs(pruned, min_jaccard, id_col)
    return exact.join(cands, ["d1", "d2"], "left_semi")


def simhash(df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash: token hashes → ±1 votes per bit → sign → packed int.

    Computed via explode(token)×bit long form + groupBy — at scale this is one
    map-side-combinable aggregation keyed by doc, no joins."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    t = df.select(F.col(id_col), toks).withColumn("h", F.expr(poly_hash_sql_expr("tok")))
    b = t.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    ).withColumn(
        "vote",
        F.when(F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("bit"))).cast("bigint") % 2 == 1, 1).otherwise(-1),
    )
    votes = b.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("bigint")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )
