"""Corpus-preparation operators for LLM training-data pipelines: TF-IDF
term ranking, token-budget sequence packing, and deterministic stratified
sampling.

These extend the reference's data-processing surface (it stops at series
CSVs — src/data_processing/ has no corpus stage) with the operations a
large-scale pretraining pipeline runs between raw documents and training
batches. Each is expressed Spark-first and paired with an exact DuckDB
oracle in plans/queries_llmdata.py.

Scale notes per operator are inline; the common discipline:
- token counts use the same single-space split as operators/textops.py
  (established cross-engine parity);
- every nondeterministic-looking choice (shard assignment, sample ranking)
  is keyed by functions/rng.rng_draw so the oracle replays it exactly;
- nothing collects to the driver: packing is shard-parallel applyInPandas,
  sampling and TF-IDF are pure DataFrame plans.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import dsum, qround
from ..functions.rng import rng_draw

PACK_SALT = 71
SAMPLE_SALT = 83
DECON_SALT = 97
DECON_MOD = 20  # 1-in-20 docs form the held-out benchmark split


def decontaminate(docs: DataFrame, n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word-``n``-gram with a held-out benchmark split.

    The canonical pretraining hygiene pass (the reference has no corpus
    stage; this extends §2.12). The benchmark membership is the deterministic
    cross-engine draw ``rng_draw(doc_id, DECON_SALT) % DECON_MOD == 0`` so
    the oracle replays the split exactly.

    Scale shape: a real benchmark set (MMLU/GSM8K/…) is tiny relative to a
    100 TB corpus — at most ~1e6 distinct n-grams — so its hashed n-gram set
    is **broadcast** and the training side pays one explode + per-doc lead
    window + broadcast hash join + one groupBy(doc) shuffle. No sort, no
    self-join, no driver collect; the n-gram ids are 64-bit integers via the
    broadcast vocabulary dim (operators/dedup.py), so the hot path never
    re-touches characters.
    """
    from .dedup import ngram_hashes

    is_bench = F.pmod(rng_draw(id_col, salt=DECON_SALT), F.lit(DECON_MOD)) == 0
    bench = docs.filter(is_bench)
    train = docs.filter(~is_bench)
    bench_ng = ngram_hashes(bench, n=n, id_col=id_col).select("shingle").distinct()
    train_ng = ngram_hashes(train, n=n, id_col=id_col)
    hits = (
        train_ng.join(F.broadcast(bench_ng), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


HH_SALT = 103


def misra_gries(token_stream, k: int) -> dict[str, int]:
    """Textbook Misra-Gries frequent-items pass with ``k`` counters: est is
    an undercount, max error n/(k+1) over a stream of n tokens. Pure-Python
    so the oracle mirror can run the identical routine off-Spark."""
    counters: dict[str, int] = {}
    for tok in token_stream:
        if tok in counters:
            counters[tok] += 1
        elif len(counters) < k:
            counters[tok] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    docs: DataFrame, k: int = 8, n_shards: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frequent tokens via mergeable Misra-Gries summaries — the bounded-
    memory sketch complement to exact groupBy counting (HLL covers distincts,
    GK covers quantiles; this covers heavy hitters).

    Shape: documents shard deterministically (rng_draw % n_shards), each
    shard streams its token sequence through a k-counter MG pass inside a
    mapInPandas fold (state = one dict of ≤ k counters, O(k) memory per task
    regardless of shard size), and the ≤ k·n_shards partial counters merge
    with the standard reduce: sum per token, subtract the (k+1)-th largest
    merged weight, keep positives. Per Agarwal et al.'s mergeable-summaries
    result the merged estimate keeps the one-pass guarantee:
    est ≤ true and true − est ≤ n/(k+1).

    Output: each surviving candidate with its merged estimate, the exact
    count (second exact pass — cheap, and lets both engines adjudicate), the
    per-row error-bound check, and a global completeness flag (every token
    with true count > n/(k+1) must be in the candidate set). The global
    window in the reduce step orders ≤ k·n_shards rows — bounded by
    construction, never corpus-sized.
    """
    toks = docs.select(
        F.pmod(rng_draw(F.col(id_col), salt=HH_SALT), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(id_col),
        F.split(F.col("text"), " ").alias("toks"),
    )

    def mg_stream(batches):
        cur_shard: int | None = None
        counters: dict[str, int] = {}

        def flush():
            nonlocal counters
            if cur_shard is None:
                return None
            out = pd.DataFrame(
                {
                    "shard": [cur_shard] * len(counters),
                    "tok": list(counters.keys()),
                    "est": list(counters.values()),
                }
            )
            counters = {}
            return out

        for pdf in batches:
            if pdf.empty:
                continue
            for s, tl in zip(pdf["shard"].astype(int), pdf["toks"]):
                if s != cur_shard:
                    done = flush()
                    if done is not None and len(done):
                        yield done
                    cur_shard = s
                for tok in tl:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        dead = [key for key in counters if counters[key] == 1]
                        for key in counters:
                            counters[key] -= 1
                        for key in dead:
                            del counters[key]
            # state carries across Arrow batches within the partition
        tail = flush()
        if tail is not None and len(tail):
            yield tail

    partials = (
        toks.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .mapInPandas(mg_stream, schema="shard int, tok string, est long")
    )
    merged = partials.groupBy("tok").agg(F.sum("est").alias("est"))

    # MG merge-reduce over the tiny candidate union (≤ k·n_shards rows)
    cut_row = merged.agg(
        F.coalesce(
            F.element_at(F.sort_array(F.collect_list("est"), asc=False), k + 1),
            F.lit(0).cast("bigint"),
        ).alias("_cut")
    )
    cand = (
        merged.crossJoin(F.broadcast(cut_row))
        .withColumn("est", F.col("est") - F.col("_cut"))
        .filter(F.col("est") > 0)
        .select("tok", "est")
    )

    exact = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    totals = docs.agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("_n_tot")
    )
    bound = F.expr(f"_n_tot div {k + 1}")
    missing = (
        exact.crossJoin(F.broadcast(totals))
        .filter(F.col("n_exact") > bound)
        .join(F.broadcast(cand.select("tok")), "tok", "left_anti")
        .agg(F.count(F.lit(1)).alias("_n_missing"))
    )
    return (
        exact.join(F.broadcast(cand), "tok")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(missing))
        .select(
            "tok",
            F.col("est").cast("bigint").alias("est"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (
                (F.col("est") <= F.col("n_exact"))
                & ((F.col("n_exact") - F.col("est")) <= bound)
            ).alias("mg_ok"),
            (F.col("_n_missing") == 0).alias("complete"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = term frequency within the doc (single-space tokens), idf =
    ln(N / df) with df = number of docs containing the term. The score is
    quantized (qround, 6 digits) BEFORE ranking so Spark and the oracle
    rank identical values; ties break on term ascending (pure-ASCII corpus
    ⇒ identical binary collation in both engines).

    Scale shape: explode shuffles once on (doc_id, term) with map-side
    combine; document frequency is a second partial-combinable agg over the
    (already distinct) tf pairs; N rides along as a broadcast 1-row cross
    join (no driver action); the per-doc top-k is a WindowGroupLimit —
    bounded state per doc, no global sort.
    """
    term = F.explode(F.split(F.col("text"), " ")).alias("term")
    tf = (
        docs.select("doc_id", term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            qround(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", F.col("rnk").cast("int").alias("rnk"), "score")
    )


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("bin_id", T.IntegerType()),
    ]
)


def pack_documents(docs: DataFrame, budget: int = 256, n_shards: int = 8) -> DataFrame:
    """Greedy token-budget sequence packing: assign each document to a bin
    so consecutive docs share a context window of ``budget`` tokens — the
    packing pass an LLM pretraining pipeline runs before batching.

    Documents are sharded by a deterministic RNG draw of doc_id, ordered by
    doc_id within the shard, and packed greedily: a doc joins the current
    bin if it fits, else opens the next bin (an oversized doc gets a bin of
    its own). Greedy-sequential is the production choice — globally optimal
    bin packing is NP-hard and order-destroying, while sequential packing
    preserves corpus order within a shard and streams in one pass.

    Scale shape: packing is inherently sequential *within* a chain, so the
    operator makes the chain the unit of parallelism (``n_shards``
    independent chains) — but a chain is NOT the unit of memory. Shards are
    hash-repartitioned and sorted within partitions, and the fold runs as a
    STREAMING ``mapInPandas``: Arrow batches of skinny (doc_id, n_tok) ints
    arrive in (shard, doc_id) order and the fold carries (shard, bin, fill)
    across batch boundaries — O(one Arrow batch) memory per task no matter
    how many documents a shard holds (an ``applyInPandas`` group would
    materialize the whole shard). One shuffle; no text ever moves.
    """
    d = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tok"),
        F.pmod(rng_draw(F.col("doc_id"), salt=PACK_SALT), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def pack_stream(batches):
        # fold state survives across Arrow batches within the partition;
        # sortWithinPartitions guarantees (shard, doc_id) arrival order and
        # the state resets whenever the shard id changes
        cur_shard, bin_id, fill, first = None, 0, 0, True
        for pdf in batches:
            if pdf.empty:
                continue
            bins = []
            for s, t in zip(pdf["shard"].astype(int), pdf["n_tok"].astype(int)):
                if s != cur_shard:
                    cur_shard, bin_id, fill, first = s, 0, 0, True
                if first:
                    fill, first = t, False
                elif fill + t <= budget:
                    fill += t
                else:
                    bin_id += 1
                    fill = t
                bins.append(bin_id)
            out = pdf[["doc_id", "shard", "n_tok"]].copy()
            out["bin_id"] = pd.Series(bins, dtype="int32", index=pdf.index)
            yield out

    return (
        d.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(pack_stream, schema=_PACK_SCHEMA)
    )


def stratified_sample(
    docs: DataFrame, strata_col: str = "lang", quota: int = 30, salt: int = SAMPLE_SALT
) -> DataFrame:
    """Deterministic stratified sampling: keep (up to) ``quota`` documents
    per stratum, ranked by the cross-engine RNG draw of doc_id — exact
    per-class quotas for training-mix construction, reproducible across
    engines and runs (unlike ``DataFrame.sampleBy``, which is seeded but
    gives binomial, not exact, stratum sizes).

    Scale shape: one hash shuffle on the stratum key; the per-stratum
    row_number is a WindowGroupLimit (top-``quota`` per group, partial
    per-partition pruning under AQE) — skew-safe for any realistic number
    of strata because state per stratum is bounded by ``quota``."""
    draw = rng_draw(F.col("doc_id"), salt=salt)
    w = Window.partitionBy(strata_col).orderBy("draw", "doc_id")
    return (
        docs.select("doc_id", strata_col, draw.alias("draw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select("doc_id", strata_col, "draw")
    )


MIX_SALT = 109


def domain_mix(
    docs: DataFrame, budget: int = 200, strata_col: str = "source"
) -> DataFrame:
    """Sqrt-proportional domain mixing: build a training mix of ``budget``
    documents whose per-domain quotas follow sqrt(domain size) — the
    standard sublinear rebalancing that upweights small domains without
    letting one giant crawl dominate.

    Quota arithmetic is integer-exact cross-engine: each domain contributes
    q_i = floor(sqrt(n_i)*1e6 + 0.5) micro-units (one IEEE sqrt per domain,
    no float summation anywhere — the totals are exact BIGINT sums), and
    quota_i = max(1, (budget * q_i) div S). Selection within a domain is
    the cross-engine RNG ranking (same discipline as stratified_sample).

    Scale shape: domain stats are one map-side-combinable count, the quota
    table is tiny and broadcast, selection is one WindowGroupLimit per
    domain — no global sort, no driver loop."""
    stats = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_avail"))
    stats = stats.withColumn(
        "q", F.expr("CAST(floor(sqrt(CAST(n_avail AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)")
    )
    tot = stats.agg(F.sum("q").alias("S"))
    quotas = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            F.greatest(F.lit(1).cast("bigint"), F.expr(f"(CAST({budget} AS BIGINT) * q) div S")),
        )
        .select(strata_col, "n_avail", "quota")
    )
    w = Window.partitionBy(strata_col).orderBy(
        rng_draw(F.col("doc_id"), salt=MIX_SALT).asc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "doc_id", strata_col, F.row_number().over(w).alias("_rn")
    )
    return (
        ranked.join(F.broadcast(quotas), strata_col)
        .filter(F.col("_rn") <= F.col("quota"))
        .select("doc_id", strata_col, F.col("quota").cast("bigint").alias("quota"))
    )


CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row


def _cms_bucket(th, i: int, w: int):
    """Row-``i`` affine bucket of a token hash (same affine family as the
    MinHash permutations — integer-exact in both engines)."""
    from ..functions.rng import M as _M

    return F.pmod(F.pmod(th * (2 * i + 3) + (5 * i + 1), F.lit(_M)), F.lit(w))


def count_min_estimates(
    docs: DataFrame, d: int = CMS_D, w: int = CMS_W, probe_k: int = 20
) -> DataFrame:
    """Count-Min Sketch token frequencies — the mergeable point-frequency
    sketch that completes the sketch family (HLL distincts, GK quantiles,
    Misra-Gries heavy hitters): d·w bounded counters replace the unbounded
    per-token groupBy, and estimates only ever OVER-count (min over d rows;
    error ≤ n/w with probability 1−2^−d per the standard bound).

    Shape: token hashing is applied inline per instance (map-only — no
    vocabulary frame, no broadcast), the sketch build is ONE map-side-combinable
    groupBy over (row, bucket) — d·w cells regardless of corpus size, the
    definition of mergeable — and probing joins the tiny sketch broadcast
    against the probe tokens' buckets. Deterministic end to end, so the
    estimates themselves hash-verify against a full SQL replay.

    Output: (tok, n_exact, n_est) for the ``probe_k`` most frequent tokens
    (exact counts are the baseline the sketch is judged against).
    """
    from .textops import poly_hash_sql_expr

    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    hashed = toks.withColumn("th", F.expr(poly_hash_sql_expr("tok")))
    buckets = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _cms_bucket(F.col("th"), i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    cells = hashed.select(F.explode(buckets).alias("rb")).select(
        F.col("rb.i").alias("i"), F.col("rb.bucket").alias("bucket")
    )
    cms = cells.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = exact.orderBy(F.col("n_exact").desc(), F.col("tok").asc()).limit(probe_k)
    pb = (
        probes.withColumn("th", F.expr(poly_hash_sql_expr("tok")))
        .select("tok", "n_exact", F.explode(buckets).alias("rb"))
        .select("tok", "n_exact", F.col("rb.i").alias("i"), F.col("rb.bucket").alias("bucket"))
    )
    return (
        pb.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("c").alias("n_est"))
        .select(
            "tok",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_est").cast("bigint").alias("n_est"),
        )
    )


THETA_SALT = 127
THETA_K = 64


def theta_setops(
    docs: DataFrame, lang_a: str = "en", lang_b: str = "de", k: int = THETA_K
) -> DataFrame:
    """Theta/KMV sketch set algebra — the set-operation sketch that rounds
    out the mergeable family (HLL distincts, GK quantiles, Misra-Gries
    heavy hitters, Count-Min frequencies): estimate |A|, |B|, |A∪B| and
    |A∩B| of two token sets from two k-hash sketches, never from the full
    sets. The exclusive-theta convention, fixed identically in both
    engines:

    - sketch(S) = the ``k`` smallest DISTINCT scrambled token hashes of S;
    - saturated (|sketch| = k): theta = max(sketch), est = (k−1)·M/theta;
      unsaturated: theta = M, est = |sketch| (the sketch IS the set);
    - union: the k smallest of the two sketches' union — valid because the
      k smallest of (k-smallest(A) ∪ k-smallest(B)) ARE the k smallest of
      A∪B, the KMV merge property;
    - intersection: thmin = min(theta_A, theta_B); est =
      |{h ∈ sketch_A ∩ sketch_B : h < thmin}|·M/thmin.

    Scale shape: per-set distinct hashing is one map-side-combinable
    aggregate; each k-smallest is a distributed TakeOrdered (per-partition
    top-k, merged at the driver — k rows of state, never the vocabulary);
    every downstream set op runs on ≤ 2k-row frames via broadcast. Exact
    baselines (the columns the sketch is judged against) are plain
    distinct counts + one token equi-join. Deterministic end to end — the
    scrambled hash is the cross-engine RNG over the polynomial token hash —
    so even the estimates hash-verify.

    Output: (op, n_exact, n_est) for op ∈ card_a/card_b/union/intersect.
    """
    from ..functions.rng import M as RM
    from .textops import poly_hash_sql_expr

    def tok_hashes(lang: str) -> DataFrame:
        t = (
            docs.filter(F.col("lang") == lang)
            .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .filter(F.length("tok") > 0)
            .select("tok")
            .distinct()
        )
        return t.withColumn(
            "th", rng_draw(F.expr(poly_hash_sql_expr("tok")), salt=THETA_SALT)
        )

    ta, tb = tok_hashes(lang_a), tok_hashes(lang_b)
    ska = ta.select("th").distinct().orderBy("th").limit(k)
    skb = tb.select("th").distinct().orderBy("th").limit(k)
    sku = ska.union(skb).distinct().orderBy("th").limit(k)

    def stats(sk: DataFrame, cn: str, thn: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).cast("bigint").alias(cn),
            # unsaturated sketch: theta = M (the sketch is the whole set)
            F.when(F.count(F.lit(1)) < k, F.lit(RM))
            .otherwise(F.max("th"))
            .cast("bigint")
            .alias(thn),
        )

    bounds = (
        stats(ska, "ca", "tha")
        .crossJoin(stats(skb, "cb", "thb"))
        .crossJoin(stats(sku, "cu", "thu"))
    )
    thmin = F.least(F.col("tha"), F.col("thb"))
    common = (
        ska.join(skb, "th")
        .crossJoin(F.broadcast(bounds.select("tha", "thb")))
        .filter(F.col("th") < thmin)
        .agg(F.count(F.lit(1)).cast("bigint").alias("ci"))
    )

    ea = ta.agg(F.count(F.lit(1)).cast("bigint").alias("ea"))
    eb = tb.agg(F.count(F.lit(1)).cast("bigint").alias("eb"))
    ei = (
        ta.select("tok")
        .join(tb.select("tok"), "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ei"))
    )

    def est(cnt, theta):
        # single int64→double cast + one division: bit-exact in both engines
        return F.when(theta == F.lit(RM), cnt.cast("double")).otherwise(
            ((F.lit(k - 1) * F.lit(RM)).cast("double")) / theta.cast("double")
        )

    one = (
        bounds.crossJoin(common).crossJoin(ea).crossJoin(eb).crossJoin(ei)
    )
    rows = [
        one.select(
            F.lit("card_a").alias("op"),
            F.col("ea").alias("n_exact"),
            est(F.col("ca"), F.col("tha")).alias("n_est"),
        ),
        one.select(
            F.lit("card_b").alias("op"),
            F.col("eb").alias("n_exact"),
            est(F.col("cb"), F.col("thb")).alias("n_est"),
        ),
        one.select(
            F.lit("union").alias("op"),
            (F.col("ea") + F.col("eb") - F.col("ei")).alias("n_exact"),
            est(F.col("cu"), F.col("thu")).alias("n_est"),
        ),
        one.select(
            F.lit("intersect").alias("op"),
            F.col("ei").alias("n_exact"),
            F.when(thmin == F.lit(RM), F.col("ci").cast("double"))
            .otherwise(
                (F.col("ci") * F.lit(RM)).cast("double") / thmin.cast("double")
            )
            .alias("n_est"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


BM25_K1 = 1.2
BM25_B = 0.75
WSAMPLE_SALT = 131
WSAMPLE_CAP = 64


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10) -> DataFrame:
    """Okapi BM25 ranking of ``docs`` against a fixed query-term set —
    the retrieval scorer every RAG / dedup-adjacent corpus pipeline runs:
    score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Cross-engine discipline: same as TF-IDF (established parity) — the
    single libm call (ln) is applied to an identical double in both
    engines and the score is qround(6)-quantized BEFORE ranking; dl and
    avgdl come from the shared single-space tokenizer; ties break on
    doc_id.

    Scale shape: term rows are filtered to the |Q| query terms BEFORE the
    (doc, term) combine, so the shuffle carries only matching postings;
    df is a second combinable agg over those; N and avgdl ride along as
    one broadcast 1-row frame; final top-k is TakeOrdered (per-partition
    heaps), never a global sort.
    """
    q = [t for t in query_terms]
    term = F.explode(F.split(F.col("text"), " ")).alias("term")
    toks = docs.select("doc_id", term).filter(F.col("term").isin(q))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    dl = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("dfreq").cast("double")
    idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            qround(idf * tfd * F.lit(BM25_K1 + 1.0) / (tfd + norm), 9).alias("s"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        qround(F.sum("s"), 6).alias("score"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def weighted_sample(
    docs: DataFrame, k: int = 10, cap: int = WSAMPLE_CAP, salt: int = WSAMPLE_SALT
) -> DataFrame:
    """Deterministic weighted reservoir sample (A-ES surrogate): each doc
    gets the key ``max_{j=1..w} rng_draw(doc_id, j)`` with integer weight
    w = min(token_count, cap), and the sample is the top-``k`` docs by
    (key DESC, doc_id ASC). The max-of-w-uniforms key has exactly the
    A-ES ``u^(1/w)`` distribution, but stays on the integer lattice — no
    pow/log, so both engines agree bit-for-bit on every draw.

    Scale shape: the weight explosion is one row per (doc, j) bounded by
    cap·N rows — the same cost class as tokenization; the max is map-side
    combinable; top-k is TakeOrdered. Sampling is embarrassingly parallel
    (the RNG is a pure function of doc_id) — no stateful reservoir to
    serialize, which is the point at 100 TB: a true streaming reservoir
    is order-dependent, this spec is slicing-independent.
    """
    w = F.least(F.size(F.split(F.col("text"), " ")), F.lit(cap))
    weighted = docs.select(
        "doc_id", F.greatest(w, F.lit(1)).cast("int").alias("w")
    )
    drawn = weighted.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("j"),
    ).select("doc_id", "w", rng_draw("doc_id", "j", salt=salt).alias("draw"))
    keyed = drawn.groupBy("doc_id").agg(
        F.max("w").cast("int").alias("w"), F.max("draw").cast("bigint").alias("skey")
    )
    return keyed.orderBy(F.col("skey").desc(), F.col("doc_id").asc()).limit(k)


ZIPF_TOP_N = 1000


def zipf_fit(docs: DataFrame, top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Zipf's-law fit over the token frequency spectrum: OLS slope and
    intercept of ln(freq) against ln(rank) for the top-``top_n`` tokens —
    the corpus-health diagnostic (natural text sits near slope −1;
    boilerplate-heavy or synthetic corpora deviate).

    Scale shape: token counts are one combinable agg; the rank frame is
    the top-``top_n`` via TakeOrdered (per-partition heaps — the
    vocabulary never sees a global sort); everything after operates on a
    constant-size frame. The OLS sums go through the decimal-exact path
    (float sums of ln values are order-dependent); ln itself is the
    established cross-engine libm call, applied to identical integer-
    derived doubles.

    Output: one row (n_fit, slope, intercept).
    """
    freq = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    top = freq.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    ranked = top.withColumn("rk", F.row_number().over(w))
    x = F.log(F.col("rk").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fit"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    n = F.col("n_fit").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    intercept = F.col("sy") / n - slope * F.col("sx") / n
    return agg.select(
        "n_fit",
        qround(slope, 6).alias("slope"),
        qround(intercept, 6).alias("intercept"),
    )


PPL_TOP_K = 20


def bigram_perplexity_topk(docs: DataFrame, k: int = PPL_TOP_K) -> DataFrame:
    """Per-document bigram language-model surprisal — the CCNet-style
    perplexity filter: train add-one-smoothed bigram counts on the corpus
    itself, score each doc by its mean negative log-probability, and
    return the ``k`` most surprising (most likely machine-garbled) docs.

    score(D) = −(1/|D|) · Σ_{(w1,w2)∈D} tf · ln( (c(w1,w2)+1) / (c(w1)+V) )

    Cross-engine discipline: counts and V are exact integers; each ln is
    the established libm call on an identical double ratio, weighted by
    the per-doc term frequency BEFORE the decimal quantization (the
    grouped form — each distinct doc-bigram contributes one quantized
    term); scores qround(6) before ranking with the doc_id tiebreak.

    Scale shape: bigram formation is a JVM ``transform`` over the token
    array (no window, no self-join); the per-(doc, bigram) tf combine is
    the only full-size shuffle — corpus-level bigram counts then derive
    from that strictly smaller frame, and every downstream join carries
    distinct doc-bigrams, never instances; count joins are AQE-sized
    equi-joins (broadcast for real vocabularies); V rides as a broadcast
    1-row frame; top-k is TakeOrdered.
    """
    toks = F.split(F.col("text"), " ")
    # docs with <2 tokens have no bigrams and are excluded up front —
    # guarding the sequence() bound, which Spark evaluates DESCENDING
    # [1, 0] (not empty) when the upper bound underruns
    bi = (
        docs.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 1), "
                    "i -> struct(split(text, ' ')[i-1] AS w1, split(text, ' ')[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bgc = bi.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    bc = bgc.groupBy("w1", "w2").agg(F.sum("tf").cast("bigint").alias("c12"))
    uc = docs.select(F.explode(toks).alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    vocab = uc.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    nll = -F.log(
        (F.col("c12").cast("double") + F.lit(1.0))
        / (F.col("c1").cast("double") + F.col("v").cast("double"))
    )
    scored = (
        bgc.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            qround(
                dsum(F.col("tf").cast("double") * nll)
                / F.sum("tf").cast("double"),
                6,
            ).alias("avg_nll"),
        )
    )
    return scored.orderBy(F.col("avg_nll").desc(), F.col("doc_id").asc()).limit(k)


CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """RAG-style document chunking: overlapping token windows of ``size``
    tokens every ``stride`` tokens, each with a stable md5 fingerprint of
    its joined text — the chunk table an embedding/retrieval pipeline
    indexes instead of whole documents.

    Chunk count is ``1 + max(0, ceil((n − size) / stride))`` so every doc
    yields at least one chunk and the final chunk is allowed to be short
    — the integer formula (negated floor division) is engine-identical.

    Scale shape: chunk starts come from a JVM ``transform(sequence(...))``
    over the token array — one Generate per doc, no window, no join, no
    shuffle at all until a consumer aggregates; md5 is the JVM built-in
    on identical joined strings.
    """
    n = "size(split(text, ' '))"
    # ceil((n - size)/stride) via the negatives-safe floor division
    # (a - pmod(a, b)) div b — Spark's bare `div` truncates toward zero,
    # which undercounts the partial tail chunk for size < n < size+stride
    a = f"({size} - {n})"
    floordiv = f"(({a} - pmod({a}, {stride})) div {stride})"
    n_chunks = f"1 + greatest(0, -1 * {floordiv})"
    starts = f"transform(sequence(1, {n_chunks}), k -> 1 + ({stride} * (k - 1)))"
    chunk = (
        f"transform({starts}, s -> named_struct("
        f"'start_tok', s, "
        f"'n_tok', least({size}, {n} - s + 1), "
        f"'chunk_md5', md5(array_join(slice(split(text, ' '), s, {size}), ' '))))"
    )
    return (
        docs.filter(F.expr(n) >= 1)
        .select("doc_id", F.posexplode(F.expr(chunk)).alias("idx0", "c"))
        .select(
            "doc_id",
            (F.col("idx0") + 1).cast("int").alias("chunk_idx"),
            F.col("c.start_tok").cast("int").alias("start_tok"),
            F.col("c.n_tok").cast("int").alias("n_tok"),
            F.col("c.chunk_md5").alias("chunk_md5"),
        )
    )
