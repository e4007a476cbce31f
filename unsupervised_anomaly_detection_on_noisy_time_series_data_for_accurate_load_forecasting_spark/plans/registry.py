"""Query registry: every implemented operator ships as a named pair
(Spark callable, DuckDB oracle SQL) — the contract consumed by
``__spark_entry__.py`` and the driver's correctness gate.

Column-name discipline: the Spark DataFrame and the oracle SQL must produce
identical column names (the driver sorts columns by name before hashing).
Every computed column is therefore aliased on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None → driver runs a rows-only check. A zero-arg callable
    # defers oracle construction to oracle_sql() time — used by the numpy-
    # mirror oracles (ML queries whose expected output is computed by an
    # independent single-node replica and emitted as a VALUES table), which
    # are too expensive to build at import.
    oracle: str | Callable[[], str] | None
    tags: tuple[str, ...] = ()  # SURVEY.md §2 operator ids this query covers
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Explicit presentation order for queries()/oracle_sql(), decoupled from
# import/registration order. The driver's correctness gate hash-checks the
# FIRST 50 entries of queries() each round, so this list front-loads the
# queries most in need of fresh driver evidence (never-checked, changed this
# round) ahead of queries already driver-green in prior rounds. Names absent
# from the list follow in registration order.
#
# The ordering is computed LAZILY on the first queries()/oracle_sql() call,
# not at package import: deriving it runs git diffs plus a taint fixpoint
# (~3 s), and the plans package is imported by every forked Python worker
# whose mapInPandas closure references a plans-module helper — an import-
# time computation would bill those 3 s to whichever codec/ML island the
# worker first serves. Workers never call queries(), so they never pay it.
PRIORITY: list[str] = []
_PRIORITY_DERIVED = False


def set_priority(names: list[str]) -> None:
    global _PRIORITY_DERIVED
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise ValueError(f"priority names not registered: {unknown}")
    PRIORITY[:] = names
    _PRIORITY_DERIVED = True


def _ensure_priority() -> None:
    global _PRIORITY_DERIVED
    if _PRIORITY_DERIVED:
        return
    _PRIORITY_DERIVED = True  # set first: a failure degrades to registration order
    try:
        from .priority import auto_priority

        PRIORITY[:] = auto_priority(list(REGISTRY))
    except Exception:
        # Degrade to registration order for the FIRST caller too, not just
        # subsequent ones — an unreadable git tree or a taint-derivation bug
        # must not take down queries()/oracle_sql().
        PRIORITY[:] = []


def _ordered() -> list[QuerySpec]:
    _ensure_priority()
    prioritized = [REGISTRY[n] for n in PRIORITY]
    rest = [s for n, s in REGISTRY.items() if n not in set(PRIORITY)]
    return prioritized + rest


def register(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        s.name: (s.oracle() if callable(s.oracle) else s.oracle)
        for s in _ordered()
        if s.oracle is not None
    }
