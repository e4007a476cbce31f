"""ANN quality: IVF top-k recall against the exact brute-force baseline."""

from __future__ import annotations

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, n_queries=30, k=5).collect()}
    approx = {(r.qid, r.nid) for r in ivf_topk(emb, n_queries=30, k=5, n_lists=8, n_probe=4).collect()}
    assert exact, "no exact pairs"
    recall = len(exact & approx) / len(exact)
    # probing half the cells should retain most true neighbors
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_ivf_degenerate_cell_count_keeps_rows(spark, sf_dir):
    # n_lists < n_probe: no row reaches fast-rank n_probe, so the windowed
    # kth threshold is NULL — it must behave as +inf (keep every cell), not
    # filter the query's candidate set to nothing (round-4 advice).
    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_topk(emb, n_queries=10, k=3, n_lists=2, n_probe=4).collect()
    qids = {r.qid for r in rows}
    assert len(qids) == 10, f"expected all 10 queries to keep results, got {sorted(qids)}"


def test_ivfpq_recall_vs_pq_and_bruteforce(spark, sf_dir):
    # IVF-PQ loses recall two ways: code quantization (shared with plain
    # PQ — the dominant loss at 8 subspaces × 16 codes: PQ alone measures
    # ~0.27 here) and cell probing. Its recall must therefore track plain
    # PQ's from below (probing may only shave a little more) and stay well
    # above chance (5/500 = 0.01).
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, n_queries=30, k=5).collect()}
    pq = {(r.qid, r.nid) for r in pq_topk(emb, n_queries=30, k=5).collect()}
    comp = {(r.qid, r.nid) for r in ivfpq_topk(emb, n_queries=30, k=5, n_lists=8, n_probe=4).collect()}
    r_pq = len(exact & pq) / len(exact)
    r_comp = len(exact & comp) / len(exact)
    assert r_comp >= 0.15, f"ivfpq recall {r_comp:.2f}"
    assert r_comp >= r_pq - 0.15, f"probing lost too much: pq {r_pq:.2f} vs ivfpq {r_comp:.2f}"


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    # int8 quantization perturbs each cosine by O(1/127) per component; the
    # quantized top-5 must still largely agree with the exact float top-5.
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        sq8_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, n_queries=30, k=5).collect()}
    quant = {(r.qid, r.nid) for r in sq8_topk(emb, n_queries=30, k=5).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"sq8 recall {recall:.2f}"


def test_kmeans_lloyd_matches_mirror_and_partitions(spark, sf_dir):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        kmeans_lloyd,
        kmeans_mirror,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.vec_id: (r.cluster, r.d2) for r in kmeans_lloyd(emb, k=4, iters=2).collect()}

    rows = sorted(
        (r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()
    )
    ids = [r[0] for r in rows]
    X = [r[1] for r in rows]
    _, expected = kmeans_mirror(ids, X, k=4, iters=2)
    assert got == expected
    # every vector assigned, clusters within range, >1 cluster used
    assert set(got) == set(ids)
    used = {c for c, _ in got.values()}
    assert used <= set(range(1, 5)) and len(used) > 1


def test_kmeans_mirror_vectorized_equals_scalar_reference():
    """The vectorized mirror must be BIT-identical to the original per-row
    scalar spec (same quantization, int64 sums, (d2, cell) tie-break)."""
    import numpy as np

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.similarity import (
        _mean_q6,
        _q6,
        kmeans_mirror,
    )

    def scalar_mirror(ids, X, k, iters):
        order = np.argsort(ids, kind="stable")
        Xd = np.asarray(X, dtype=np.float64)
        cents = [(i + 1, [_q6(v) for v in Xd[order[i]]]) for i in range(k)]
        qX = np.floor(Xd * 1e6 + 0.5).astype(np.int64)

        def d2i_row(x, c):
            d = x - np.asarray(c, dtype=np.float64)
            return int(np.floor(d * d * 1e6 + 0.5).astype(np.int64).sum())

        for _ in range(iters):
            assign = []
            for ridx in range(len(Xd)):
                best = None
                for cell, c in cents:
                    d2 = d2i_row(Xd[ridx], c)
                    if best is None or (d2, cell) < best:
                        best = (d2, cell)
                assign.append(best[1])
            assign = np.asarray(assign)
            new_cents = []
            for cell, c in cents:
                mask = assign == cell
                n = int(mask.sum())
                if n == 0:
                    new_cents.append((cell, c))
                    continue
                sums = qX[mask].sum(axis=0)
                new_cents.append((cell, [_mean_q6(int(s), n) for s in sums]))
            cents = new_cents
        result = {}
        for ridx in range(len(Xd)):
            best = None
            for cell, c in cents:
                d2 = d2i_row(Xd[ridx], c)
                if best is None or (d2, cell) < best:
                    best = (d2, cell)
            result[int(ids[ridx])] = (best[1], best[0] / 1e6)
        return cents, result

    rng = np.random.RandomState(17)
    for n, dim, k, iters in [(60, 8, 4, 3), (120, 16, 8, 2), (40, 5, 6, 4)]:
        X = rng.randn(n, dim).round(3)
        # duplicate rows force distance ties; equal rows force cell ties
        X[5] = X[6]
        ids = list(rng.permutation(n))
        want_c, want_a = scalar_mirror(ids, [list(r) for r in X], k, iters)
        got_c, got_a = kmeans_mirror(ids, [list(r) for r in X], k=k, iters=iters)
        assert got_c == want_c
        assert got_a == want_a
