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


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"
