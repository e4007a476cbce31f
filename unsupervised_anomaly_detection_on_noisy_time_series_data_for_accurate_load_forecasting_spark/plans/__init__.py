from .registry import REGISTRY, QuerySpec, oracle_sql, queries, register

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

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "register"]
