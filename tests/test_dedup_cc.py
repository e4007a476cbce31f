"""Connected-components label propagation: unit pins beyond the oracle
parity (which only sees the LSH graph's near-clique shape) — a path graph
forces multi-round propagation, and a singleton-free contract check."""

from __future__ import annotations

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
    connected_components,
)


def test_cc_components_and_representatives(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10)], "d1 long, d2 long"
    )
    got = {r["vertex"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_cc_path_graph_needs_multiple_rounds(spark):
    # 0-1-2-...-9: min label must walk the whole path — exercises the loop,
    # not just the first propagation step
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)], "d1 long, d2 long")
    got = {r["vertex"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(10)}


def test_cc_only_graph_vertices_labeled(spark):
    # vertices come from the pair graph; isolated docs are absent by contract
    pairs = spark.createDataFrame([(7, 3)], "d1 long, d2 long")
    got = sorted(r["vertex"] for r in connected_components(pairs).collect())
    assert got == [3, 7]


def test_cc_pointer_jumping_beats_linear_radius(spark):
    # A 40-vertex path has propagation radius 39; pointer jumping doubles
    # label reach per round, so max_iter=8 (< 39 but > log2(40)) must still
    # fully converge — the linear-propagation form could not.
    pairs = spark.createDataFrame([(i, i + 1) for i in range(39)], "d1 long, d2 long")
    got = {
        r["vertex"]: r["cluster"]
        for r in connected_components(pairs, max_iter=8).collect()
    }
    assert got == {i: 0 for i in range(40)}


def test_cc_warns_when_max_iter_exhausted(spark):
    import warnings

    pairs = spark.createDataFrame([(i, i + 1) for i in range(39)], "d1 long, d2 long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = {
            r["vertex"]: r["cluster"]
            for r in connected_components(pairs, max_iter=2).collect()
        }
    assert any("max_iter" in str(w.message) for w in caught)
    # partial labels are still monotone (never above the vertex id)
    assert all(c <= v for v, c in labels.items())


def test_pagerank_fixed_point_invariants(spark):
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        pagerank_fixed_point,
    )

    # star graph: hub connected to 4 leaves (both directions)
    pairs = [("h", x) for x in "abcd"]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs], "src string, dst string"
    )
    out = {r.node: r.rank_q for r in pagerank_fixed_point(edges, iters=5).collect()}
    assert set(out) == {"h", "a", "b", "c", "d"}
    # hub dominates; leaves are symmetric and identical by determinism
    assert out["h"] > out["a"]
    assert len({out[x] for x in "abcd"}) == 1
    # every rank positive; total bounded by the initial mass (floor losses only shrink it)
    assert all(v > 0 for v in out.values())
    assert sum(out.values()) <= 10**9


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant vertex: K4 has 4 triangles, each K4 vertex sits in
    3 of them, the pendant in none; duplicate/reversed input edges must not
    change anything (canonicalized + distinct)."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(4, 5)] + [(b, a) for a, b in k4], "u long, v long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_source_only_nodes_keep_base_rank(spark):
    # a -> b -> c: node 'a' has out-edges but no in-edges; it must keep
    # rank = base every round, not vanish from the rank vector
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    got = {r["node"]: r["rank_q"] for r in pagerank_fixed_point(edges, iters=3).collect()}
    assert set(got) == {"a", "b", "c"}
    base = (15 * 10**7) // 3
    assert got["a"] == base  # source-only: never receives mass
    assert got["b"] > base and got["c"] > base


def test_rolling_char_kgram_matches_direct_fold(spark):
    # the rolling-hash window algebra must equal a direct per-substring
    # polynomial fold at every position, across lengths and k values
    import random

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import M
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        char_kgram_hashes,
    )

    rng = random.Random(13)
    texts = [
        "".join(chr(rng.randrange(32, 127)) for _ in range(n)) for n in (5, 17, 64, 301)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for k in (3, 8, 32):
        got = {
            (r["doc_id"], r["pos"]): r["h"]
            for r in char_kgram_hashes(df, k=k).collect()
        }
        want = {}
        for did, t in enumerate(texts):
            for i in range(len(t) - k + 1):
                h = 0
                for ch in t[i : i + k]:
                    h = (h * 31 + ord(ch)) % M
                want[(did, i + 1)] = h
        assert got == want, f"k={k}"


def test_kgram_island_matches_sql_chain(spark):
    # the numpy-island hasher must be BIT-IDENTICAL to the SQL window chain
    # (same lattice, same modulus) row for row — including the edge shapes:
    # empty text, len < k, len == k, and a doc of repeated characters
    import random

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        char_kgram_hashes,
        char_kgram_hashes_np,
    )

    rng = random.Random(29)
    texts = [
        "",
        "ab",
        "x" * 8,
        "y" * 200,
        "".join(chr(rng.randrange(32, 127)) for _ in range(513)),
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for k in (3, 8, 32):
        sql_rows = {
            (r["doc_id"], r["pos"]): r["h"]
            for r in char_kgram_hashes(df, k=k).collect()
        }
        np_rows = {
            (r["doc_id"], r["pos"]): r["h"]
            for r in char_kgram_hashes_np(df, k=k).collect()
        }
        assert np_rows == sql_rows, f"k={k}"


def test_duplicate_spans_known_overlap(spark):
    # doc 1 and doc 2 share one verbatim 40-char span; doc 3 is unrelated
    shared = "The quick brown fox jumps over the lazy".ljust(40, "!")
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " tail A"),
            (2, "another beginning then " + shared + " end B"),
            (3, "completely different text with no forty char overlap at all here"),
        ],
        "doc_id long, text string",
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        duplicate_spans,
    )

    rows = duplicate_spans(df, k=32).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    # the MAXIMAL span includes the space on each side of the planted text
    # (" one_" vs "then_" and "_tail" vs "_end" share the flanking blanks):
    # 42 chars -> 42-32+1 = 11 consecutive k-grams, one island
    assert r["n_spans"] == 1 and r["n_kgrams"] == 11 and r["max_span_chars"] == 42


def test_remove_duplicate_spans_surgery_is_exact(spark):
    # doc 2 (the higher id) loses exactly the 42-char maximal shared run
    # (the planted 40 chars plus the flanking spaces); doc 1 keeps it;
    # doc 3 passes through untouched; doc 4 duplicates doc 1 entirely and
    # must come out empty (the empty-string hash = the bare seed 7).
    shared = "The quick brown fox jumps over the lazy".ljust(40, "!")
    t1 = "prefix one " + shared + " tail A"
    t2 = "another beginning then " + shared + " end B"
    t3 = "completely different text with no forty char overlap at all here"
    df = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (4, t1)], "doc_id long, text string"
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
        M,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    def phash(s: str) -> int:
        h = 7
        for ch in s:
            h = (h * 31 + ord(ch)) % M
        return h

    got = {r.doc_id: r for r in remove_duplicate_spans(df, k=32).collect()}
    assert got[1].n_removed == 0 and got[1].cleaned_hash == phash(t1)
    assert got[3].n_removed == 0 and got[3].cleaned_hash == phash(t3)
    # doc 2: the maximal run " <shared> " spans 42 chars starting at the
    # flanking space — splice the expected text manually
    s = t2.index(" " + shared)
    cleaned2 = t2[:s] + t2[s + 42 :]
    assert got[2].n_removed == 42 and got[2].n_after == len(cleaned2)
    assert got[2].cleaned_hash == phash(cleaned2)
    # doc 4 duplicates doc 1 verbatim: everything goes
    assert got[4].n_after == 0 and got[4].cleaned_hash == 7


def test_df_cap_drops_boilerplate_and_reports_it(spark):
    # 8 docs share the boilerplate trigram "all rights reserved" (df=8 >
    # cap=greatest(5, 8 div 100)=5) plus unique filler; df_capped_shingles
    # must drop exactly that shingle, jaccard_pairs must then see DISJOINT
    # filtered sets (no pair survives), and shingle_df_stats must report the
    # truncation — never silent.
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        df_capped_shingles,
        jaccard_pairs,
        shingle_df_stats,
        shingle_hashes,
    )

    rows = [
        (i, f"unique{i}a unique{i}b unique{i}c all rights reserved")
        for i in range(1, 9)
    ]
    sh = shingle_hashes(spark.createDataFrame(rows, "doc_id long, text string"))
    # raw: each doc has 4 trigrams; the "all rights reserved" one is shared
    raw_per_doc = {r.doc_id: r.n for r in sh.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert all(v == 4 for v in raw_per_doc.values())
    capped = df_capped_shingles(sh)
    capped_per_doc = {r.doc_id: r.n for r in capped.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert all(v == 3 for v in capped_per_doc.values()), "only the df=8 shingle may drop"
    # without the cap the shared trigram makes every pair J = 1/7 > 0.1 ...
    assert jaccard_pairs(sh, 0.1, df_capped=False).count() == 28
    # ... with it, the filtered sets are disjoint: no pairs at all
    assert jaccard_pairs(sh, 0.1).count() == 0
    st = shingle_df_stats(sh).collect()[0]
    assert st.n_docs == 8 and st.df_cap == 5 and st.n_hot == 1
    assert st.max_df == 8 and st.rows_dropped == 8 and st.rows_kept == 24


def test_kcore_peels_tail_and_keeps_clique(spark):
    # K5 on 1..5 (every degree 4) plus a pendant path 1-6-7: with k=3 the
    # path peels in round one and the clique survives intact.
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        kcore_peel,
    )

    clique = [(u, v) for u in range(1, 6) for v in range(u + 1, 6)]
    edges = spark.createDataFrame(clique + [(1, 6), (6, 7)], "u long, v long")
    got = {r.node: r.core_deg for r in kcore_peel(edges, k=3, rounds=8).collect()}
    assert got == {i: 4 for i in range(1, 6)}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # a 6-vertex path with k=2 peels only its endpoints each round — the
    # whole graph dies, but ONLY via the iterated cascade (round one alone
    # would leave 2-3-4-5 standing).
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        kcore_peel,
    )

    path = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], "u long, v long")
    assert kcore_peel(path, k=2, rounds=8).count() == 0
    one_round = kcore_peel(path, k=2, rounds=1)
    assert {r.node for r in one_round.collect()} == {2, 3, 4, 5}


def test_bfs_hops_distances_and_min_hub_attribution(spark):
    """Hand-built graph: hubs are the two highest-degree vertices; every
    reached node reports its true BFS distance and the SMALLEST hub id
    among those at that minimal distance (not a path accident)."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        bfs_hops,
    )

    # star around 1 (deg 4) and around 9 (deg 3), bridge 4-9, chain 9-6-7-8
    und = [(1, 2), (1, 3), (1, 4), (1, 5), (9, 4), (9, 6), (9, 10), (6, 7), (7, 8)]
    edges = spark.createDataFrame(
        und + [(v, u) for u, v in und], "src long, dst long"
    )
    got = {r.node: (r.hop, r.hub) for r in bfs_hops(edges, n_sources=2, rounds=4).collect()}
    # degrees: 1->4, 9->3 (4, 6, 10 — the bridge IS edge 9-4), 4->2, rest
    # lower; hubs = {1, 9}
    assert got[1] == (0, 1) and got[9] == (0, 9)
    # node 4 touches both hubs at hop 1 -> min hub id 1 wins the tie
    assert got[4] == (1, 1)
    assert got[2] == (1, 1) and got[6] == (1, 9) and got[10] == (1, 9)
    assert got[7] == (2, 9)
    assert got[8] == (3, 9)


def test_bfs_hops_round_cap_and_unreached(spark):
    """Vertices beyond the round budget stay unassigned; an isolated
    component with no hub never appears."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        bfs_hops,
    )

    chain = [(i, i + 1) for i in range(1, 8)]  # 1-2-...-8, hub = highest-degree
    iso = [(100, 101)]
    und = chain + iso
    edges = spark.createDataFrame(
        und + [(v, u) for u, v in und], "src long, dst long"
    )
    got = {r.node: r.hop for r in bfs_hops(edges, n_sources=1, rounds=2).collect()}
    # single hub = smallest id among max-degree (deg 2): node 2
    assert got == {2: 0, 1: 1, 3: 1, 4: 2}


def test_bfs_hops_partitioning_invariant(spark):
    """The min-hub attribution claim is schedule independence: the same
    random graph fed in 1 partition vs shuffled across 7 partitions must
    yield the identical (node, hop, hub) set."""
    import random

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        bfs_hops,
    )

    rng = random.Random(99)
    und = list({(rng.randrange(1, 60), rng.randrange(1, 60)) for _ in range(120)})
    und = [(u, v) for u, v in und if u != v]
    sym = und + [(v, u) for u, v in und]
    one = spark.createDataFrame(sym, "src long, dst long").coalesce(1)
    shuf = spark.createDataFrame(
        sorted(sym, key=lambda e: rng.random()), "src long, dst long"
    ).repartition(7)
    key = lambda df: {(r.node, r.hop, r.hub) for r in df.collect()}
    assert key(bfs_hops(one, n_sources=3, rounds=4)) == key(
        bfs_hops(shuf, n_sources=3, rounds=4)
    )


def test_lsh_candidate_pairs_lead_emit_matches_self_join(spark):
    """r16: the lead()-based sorted-neighborhood pair emit must produce the
    exact pair set of the rank self-join it replaced — including the
    bucket-cap truncation and the cross-bucket boundary (leads are
    partition-bounded). The reference below IS the pre-r16 join, run
    against the production builder on a frame with an over-cap bucket."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    rows = [
        # bucket A: 7 members (over cap=5 -> ids 6,7 truncated)
        *[(0, "A", i) for i in range(1, 8)],
        # bucket B: 3 members, one shared with A
        (0, "B", 2), (0, "B", 9), (0, "B", 10),
        # same key in another band: pairs dedup via distinct()
        (1, "A", 1), (1, "A", 2),
        # singleton bucket: no pairs
        (1, "C", 4),
    ]
    bands = spark.createDataFrame(rows, "band int, band_key string, doc_id long")
    cap, neigh = 5, 2

    got = {
        (r.d1, r.d2)
        for r in lsh_candidate_pairs(
            bands, bucket_cap=cap, neighborhood=neigh
        ).collect()
    }

    rk = F.row_number().over(W.partitionBy("band", "band_key").orderBy("doc_id"))
    ranked = bands.withColumn("_rk", rk).filter(F.col("_rk") <= cap)
    a, b = ranked.alias("a"), ranked.alias("b")
    ref = {
        (r.d1, r.d2)
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("b._rk") - F.col("a._rk")).between(1, neigh),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
        .collect()
    }
    assert got == ref
    assert (6, 7) not in got  # cap truncated ids 6 and 7 in bucket A
    assert all(d1 < d2 for d1, d2 in got)


def test_semantic_candidates_lead_matches_join(spark):
    """r16: semantic_candidates' lead()-based sorted-neighborhood emit must
    produce the exact (pair, payload) set of the rank/sequence-explode
    equi-join it replaced. The reference below IS the pre-r16 join, run on
    a frame with a cluster larger than the window (boundary nulls), a
    2-member cluster, and a singleton (no pairs)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        semantic_candidates,
    )

    rows = [
        # cluster 0: 5 members, window 3 -> rank gaps 4 never pair
        *[(i, [float(i), 1.0], 0, float(i)) for i in range(1, 6)],
        # cluster 1: tie on d2 broken by vec_id
        (10, [1.0, 2.0], 1, 7.0),
        (11, [2.0, 1.0], 1, 7.0),
        # cluster 2: singleton
        (20, [3.0, 3.0], 2, 0.5),
    ]
    v_all = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int, d2 double"
    )
    window = 3

    def key(df):
        return sorted(
            (r.d1, r.d2, tuple(r.ea), tuple(r.eb), r.sqa, r.sqb)
            for r in df.collect()
        )

    got = key(semantic_candidates(v_all, window=window))

    # pre-r16 reference: rank window + sequence-explode equi-join
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        dnorm_sq,
    )

    v = v_all.withColumn("sq", dnorm_sq()).filter(F.col("sq") > 0)
    rw = W.partitionBy("cluster").orderBy("d2", "vec_id")
    ranked = v.withColumn("rk", F.row_number().over(rw))
    a = ranked.select(
        "cluster", "rk",
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("sq").alias("sqa"),
    )
    b = ranked.select(
        "cluster", F.col("rk").alias("rkb"),
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        F.col("sq").alias("sqb"),
    )
    b_exp = (
        b.withColumn("_j", F.explode(F.sequence(F.lit(1), F.lit(window))))
        .withColumn("rk", F.col("rkb") - F.col("_j"))
        .filter(F.col("rk") >= 1)
        .drop("_j", "rkb")
    )
    ref = key(
        a.join(b_exp, ["cluster", "rk"]).select(
            F.least("va", "vb").alias("d1"),
            F.greatest("va", "vb").alias("d2"),
            "ea", "eb", "sqa", "sqb",
        )
    )
    assert got == ref and len(got) > 0
    # 5-member cluster with window 3: C(5,2) - (gap-4 pair) = 9 pairs,
    # 2-member cluster: 1 pair, singleton: 0
    assert len(got) == 10
