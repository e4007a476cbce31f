"""Text-analysis operators for the training-data pipeline extensions:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All hot-path logic is JVM-side `pyspark.sql.functions` / SQL higher-order
functions — no Python UDFs — so whole-stage codegen applies and the same
expressions mirror 1:1 into the DuckDB oracle.

Cross-engine string hash: SQL engines disagree on builtin `hash()`, so we
define a polynomial character fold (31x + c mod 2^31-1) evaluated with
`aggregate`/`list_reduce` — exact integer arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import qround
from ..functions.rng import M

# Marker stopwords per language for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "un", "les"),
    "de": ("der", "die", "und", "ein", "ist"),
    "es": ("el", "los", "y", "una", "que"),
}
STOPWORDS = ("the", "a", "of", "and", "is")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (single-space split, mirroring string_split)."""
    return F.split(F.col(col), " ")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: str = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def marker_hits(lang: str, col: str = "text") -> Column:
    """Count of tokens that are marker stopwords of `lang`."""
    arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return F.expr(f"size(filter(split({col}, ' '), x -> x IN ({arr})))")


def predicted_lang(col: str = "text") -> Column:
    """Deterministic argmax over marker hits with fixed priority order
    en > fr > de > es; CJK presence short-circuits to 'zh'."""
    n = {lang: marker_hits(lang, col) for lang in LANG_MARKERS}
    has_cjk = F.expr(f"length(regexp_replace({col}, '[^\\\\u4e00-\\\\u9fff]', '')) > 0")
    return (
        F.when(has_cjk, F.lit("zh"))
        .when((n["en"] >= F.greatest(n["fr"], n["de"], n["es"])) & (n["en"] > 0), F.lit("en"))
        .when((n["fr"] >= F.greatest(n["de"], n["es"])) & (n["fr"] > 0), F.lit("fr"))
        .when((n["de"] >= n["es"]) & (n["de"] > 0), F.lit("de"))
        .when(n["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(col: str = "text") -> Column:
    """Composite quality: stopword ratio, length saturation, lexical diversity.

    q = 0.4·stop_ratio + 0.3·min(n_tokens/100, 1) + 0.3·distinct_ratio
    """
    nt = token_count(col).cast("double")
    arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop = F.expr(f"size(filter(split({col}, ' '), x -> x IN ({arr})))").cast("double")
    dr = distinct_token_count(col).cast("double")
    return (
        F.lit(0.4) * (stop / nt)
        + F.lit(0.3) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (dr / nt)
    )


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of the whitespace-collapsed, lower-cased text
    (both engines implement md5 identically on UTF-8 bytes)."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(col), " +", " ")))
    return F.md5(F.encode(normalized, "UTF-8"))


def poly_hash_sql_expr(token_expr: str) -> str:
    """Spark SQL string: polynomial char fold of a string expression. The
    empty string must hash to the bare seed — Spark's sequence(1, 0) is
    DESCENDING [1, 0] (not empty!), so without the guard an empty input
    would fold two out-of-range (ascii = 0) positions."""
    codes = f"transform(sequence(1, length({token_expr})), i -> ascii(substring({token_expr}, i, 1)))"
    return (
        f"(CASE WHEN length({token_expr}) = 0 THEN 7L "
        f"ELSE aggregate({codes}, 7L, (a, c) -> pmod(a * 31 + c, {M}L)) END)"
    )


def poly_hash_duck_expr(token_expr: str) -> str:
    """DuckDB mirror of :func:`poly_hash_sql_expr` (list_reduce left fold with
    an explicit seed element)."""
    codes = (
        f"list_transform(range(1, length({token_expr}) + 1), "
        f"i -> CAST(unicode(substr({token_expr}, i, 1)) AS BIGINT))"
    )
    return (
        f"list_reduce(list_concat([CAST(7 AS BIGINT)], {codes}), "
        f"(a, c) -> (a * 31 + c) % {M})"
    )


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("n_distinct_tokens", distinct_token_count(col))
        .withColumn("quality", qround(quality_score(col), 6))
        .withColumn("pred_lang", predicted_lang(col))
        .withColumn("fingerprint", fingerprint(col))
    )


# --- PII redaction -------------------------------------------------------
# Patterns are deliberately simple and portable (identical semantics under
# Java regex and RE2): lowercase character classes only, so the uppercase
# replacement tokens can never re-match a later pattern in the chain.
# Order matters: URL before EMAIL/IP (a URL may contain dots and digits that
# substrings of later patterns would otherwise claim).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("n_url", r"https?://[a-z0-9./_-]+", "<URL>"),
    ("n_email", r"[a-z0-9._-]+@[a-z0-9-]+(\.[a-z0-9-]+)+", "<EMAIL>"),
    ("n_ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("n_phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}", "<PHONE>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Sequentially redact every PII pattern (replace-all per step — the
    matched spans become inert uppercase tokens, so later patterns in the
    chain cannot partially re-match an earlier replacement)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-pattern match counts over the ORIGINAL text (aliased n_url,
    n_email, n_ip, n_phone) — the audit numbers a scrubbing pass reports."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).cast("bigint").alias(name)
        for name, pat, _ in PII_PATTERNS
    ]


def repetition_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition: duplicated-bigram ratio and the most
    frequent token's share — the scrape-artifact signals (boilerplate,
    stutter loops) a corpus quality gate thresholds on.

    All JVM-side array HOFs, embarrassingly parallel: bigrams via
    zip_with over shifted slices, per-token counts via a transform over the
    distinct set (O(distinct x len) per doc — bounded by document length,
    never corpus-sized). Ratios quantized at 1e-6 for cross-engine equality.
    """
    toks = f"split({col}, ' ')"
    n = f"size({toks})"
    bi = (
        f"zip_with(slice({toks}, 1, {n} - 1), slice({toks}, 2, {n} - 1), "
        "(a, b) -> concat(a, ' ', b))"
    )
    top = (
        f"array_max(transform(array_distinct({toks}), "
        f"t -> size(filter({toks}, x -> x = t))))"
    )
    q6 = "CAST(floor(({expr}) * 1000000.0D + 0.5D) AS DOUBLE) / CAST(1000000 AS DOUBLE)"
    rep = q6.format(
        expr=f"1.0 - CAST(size(array_distinct({bi})) AS DOUBLE) / CAST(size({bi}) AS DOUBLE)"
    )
    share = q6.format(expr=f"CAST({top} AS DOUBLE) / CAST({n} AS DOUBLE)")
    return df.select(
        F.col(id_col),
        F.expr(f"size({bi})").cast("bigint").alias("n_bigrams"),
        F.expr(f"size(array_distinct({bi}))").cast("bigint").alias("n_distinct_bigrams"),
        F.expr(rep).alias("rep_ratio"),
        F.expr(share).alias("top_tok_share"),
    )


def phrase_search(df: DataFrame, phrase: list[str], id_col: str = "doc_id") -> DataFrame:
    """Positional-index phrase search: documents containing the exact
    token sequence ``phrase``, with match count and first match position —
    the probe a positional inverted index answers (adjacent-position
    equi-joins over per-term posting lists).

    Scale shape: each term's postings are a pushed-down filter over the
    positional explosion (the scan reads only matching tokens); the
    adjacency join is an equi-join on (doc, pos+offset) — skewless keys,
    AQE-sized; the per-doc rollup is combinable. |phrase|−1 joins total,
    never a string scan of whole documents.
    """
    from .dedup import token_long

    tl = token_long(df, id_col=id_col)
    cur = tl.filter(F.col("tok") == phrase[0]).select(id_col, F.col("pos").alias("p0"))
    for i, term in enumerate(phrase[1:], start=1):
        nxt = tl.filter(F.col("tok") == term).select(
            id_col, (F.col("pos") - i).alias(f"_p{i}")
        )
        cur = cur.join(
            nxt, (cur[id_col] == nxt[id_col]) & (F.col("p0") == F.col(f"_p{i}"))
        ).select(cur[id_col].alias(id_col), "p0")
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("p0").cast("int").alias("first_pos"),
    )
