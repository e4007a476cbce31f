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

# The driver's correctness gate checks the FIRST 50 entries of queries().
# The ordering is DERIVED each import (plans/priority.py): never-driver-green
# queries first, then queries whose import-closure touched a file changed
# since the last verdict commit, then everything else stalest-evidence-first
# — so the round-3 failure mode (a changed query hand-listed past position
# 50) cannot recur, and rotation alone bounds every query's evidence age.
from .priority import auto_priority  # noqa: E402

set_priority(auto_priority(list(REGISTRY)))

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "register", "set_priority"]
