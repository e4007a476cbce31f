from .registry import REGISTRY, QuerySpec, oracle_sql, queries, register, set_priority

# Import for side effect: each module registers its query specs.
from . import queries_relational  # noqa: E402,F401
from . import queries_timeseries  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_similarity  # noqa: E402,F401
from . import queries_forecast  # noqa: E402,F401
from . import queries_ml  # noqa: E402,F401
from . import queries_stream_mm  # noqa: E402,F401
from . import queries_relational2  # noqa: E402,F401
from . import queries_neural  # noqa: E402,F401
from . import queries_llmdata  # noqa: E402,F401
from . import queries_asof  # noqa: E402,F401

# The driver's correctness gate checks the FIRST 50 entries of queries().
# The ordering is DERIVED lazily on the first queries()/oracle_sql() call
# (plans/registry._ensure_priority → plans/priority.auto_priority):
# never-driver-green queries first, then queries whose import-closure
# touched a file changed since the last verdict commit, then everything
# else stalest-evidence-first — so the round-3 failure mode (a changed
# query hand-listed past position 50) cannot recur, and rotation alone
# bounds every query's evidence age. Lazy, not at import: the derivation
# runs git diffs + a taint fixpoint (~3 s), and forked Python workers
# import this package when an island closure references a plans helper —
# they must not pay the driver-side ordering cost.


def prepare(spark, sf_dir: str) -> dict[str, float]:
    """Warm every session-lifetime shared view memo for ``sf_dir`` and force
    materialization, returning {view_name: seconds}.

    A resident engine pays hot-view materialization once at startup, not
    inside whichever query happens to touch the view first. The bench calls
    this in an untimed setup step and reports the cost as its own line, so
    per-query timings measure the query's plan rather than first-toucher
    attribution (round-4 verdict: s_lsh_near_pairs billed 22.7 s in the
    driver bench vs 2.8 s isolated, purely the shared signature pass)."""
    import time

    from . import queries_ml, queries_similarity
    from .shared import bipartite_edges_df, copurchase_edges_df, hourly_df, prepared_df

    out: dict[str, float] = {}
    for name, build in (
        ("hourly", hourly_df),
        ("prepared", prepared_df),
        ("lsh_bands", queries_similarity._bands),
        ("lsh_near_pairs", queries_similarity._near_pairs_02),
        ("ml_embedded", queries_ml._embedded),
        ("copurchase_edges", copurchase_edges_df),
        ("bipartite_edges", bipartite_edges_df),
        ("pq_codebooks", queries_similarity._pq_books),
    ):
        t0 = time.time()
        built = build(spark, sf_dir)
        from pyspark.sql import DataFrame as _DF

        if isinstance(built, _DF):
            built.count()  # force the persist to materialize
        out[name] = round(time.time() - t0, 3)
    return out


__all__ = [
    "REGISTRY",
    "QuerySpec",
    "queries",
    "oracle_sql",
    "register",
    "set_priority",
    "prepare",
]
