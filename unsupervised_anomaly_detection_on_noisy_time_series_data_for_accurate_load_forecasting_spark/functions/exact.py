"""Bit-exact cross-engine aggregation helpers.

Floating-point sums are order-dependent, and Spark's shuffle order differs
from DuckDB's scan order, so ``sum(double)`` is not reproducible across
engines (or even across runs at different parallelism). The correctness gate
hash-compares values, so every oracle-checked aggregate goes through exact
DECIMAL arithmetic:

    double --cast--> DECIMAL(s=6) --exact sum--> DECIMAL --cast--> double

Both engines round the *exact* binary double to 6 decimal digits (ties are
impossible: x.0000005 has no finite binary expansion), sum exactly in decimal,
and convert the exact decimal result back to the nearest double — fully
deterministic regardless of partitioning, at any scale. This is also the right
100 TB answer: decimal sums are associative, so map-side partial aggregation
still applies.

Each helper has a ``*_sql`` twin emitting the equivalent DuckDB expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREC = 27  # 21 integer digits + 6 decimals; sum widens precision by 10 in both engines
_SCALE = 6


def dsum(col: Column | str) -> Column:
    """Deterministic sum of a double column (exact decimal internally)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{_SCALE})")).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def dec(col: Column | str) -> Column:
    """Cast to the exact decimal type — building block for windowed sums:
    ``F.sum(dec(c)).over(w).cast("double")`` mirrors ``DSUM_OVER_SQL``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PREC},{_SCALE})")


def dvar(col: Column | str, ddof: int = 1) -> Column:
    """Deterministic variance from exact moments.

    ``(sumsq - sum*sum/n) / (n - ddof)`` where sum and sumsq are decimal-exact
    and the final arithmetic is the *same* double expression in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = dsum(c)
    s2 = dsum(c * c)
    # try_divide: singleton groups (n == ddof) yield NULL instead of an ANSI
    # error; callers filter them out, so engines agree on every surviving row.
    return F.try_divide(s2 - s * s / n, n - F.lit(float(ddof)))


def dstd(col: Column | str, ddof: int = 1) -> Column:
    return F.sqrt(dvar(col, ddof))


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"


def dec_sql(expr: str) -> str:
    return f"CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))"


def dvar_sql(expr: str, ddof: int = 1) -> str:
    n = f"CAST(count({expr}) AS DOUBLE)"
    s = dsum_sql(expr)
    s2 = dsum_sql(f"({expr}) * ({expr})")
    return f"(({s2} - {s} * {s} / {n}) / ({n} - {float(ddof)}))"


def dstd_sql(expr: str, ddof: int = 1) -> str:
    return f"sqrt({dvar_sql(expr, ddof)})"
