"""Bit-exact cross-engine aggregation helpers.

Floating-point sums are order-dependent, and Spark's shuffle order differs
from DuckDB's scan order, so ``sum(double)`` is not reproducible across
engines (or even across runs at different parallelism). The correctness gate
hash-compares values, so every oracle-checked aggregate goes through exact
DECIMAL arithmetic:

    double --quantize--> DECIMAL(s=6) --exact sum--> DECIMAL --cast--> double

The quantization step is ``floor(x·1e6 + 0.5) / 1e6`` — pure double
arithmetic, bit-identical in every engine — *before* the decimal cast. A
naive ``CAST(x AS DECIMAL)`` is NOT engine-portable at ties: dyadic doubles
can land exactly on a decimal midpoint (0.0078125 = 2⁻⁷ is precisely
…125·10⁻⁷), and Spark rounds ties HALF_UP while DuckDB rounds half-even —
a one-ulp-of-decimal divergence that real data does hit at scale (seen at
sf0.1). ``floor`` has no tie mode at all, and its output is within ½ulp of
an exact 1e-6 multiple, so the subsequent cast is unambiguous in both
engines. Decimal sums stay associative, so map-side partial aggregation
still applies — the right 100 TB answer.

Domain note: Spark's ``floor(double)`` yields LONG, so the quantizer is
exact for |x| < ~9·10¹² (then x·1e6 < 2⁶³); larger magnitudes raise under
ANSI mode instead of silently diverging — widen ``_SCALE`` down if a table
ever carries such values.

Each helper has a ``*_sql`` twin emitting the equivalent DuckDB expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREC = 27  # 21 integer digits + 6 decimals; sum widens precision by 10 in both engines
_SCALE = 6
_Q = 10**_SCALE


def dsum(col: Column | str) -> Column:
    """Deterministic sum of a double column (exact decimal internally)."""
    return F.sum(dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def dec(col: Column | str) -> Column:
    """Tie-free quantization to the exact decimal type — building block for
    windowed sums: ``F.sum(dec(c)).over(w).cast("double")`` mirrors the
    ``dec_sql`` window form."""
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * F.lit(float(_Q)) + F.lit(0.5)) / F.lit(float(_Q))
    return q.cast(f"decimal({_PREC},{_SCALE})")


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


def qround(col: Column | str, digits: int) -> Column:
    """Tie-free engine-portable rounding to ``digits`` decimals:
    ``floor(x·10^d + 0.5) / 10^d``. Unlike ``F.round`` (BigDecimal HALF_UP)
    vs Python ``round`` / DuckDB double-round (half-even), ``floor`` has no
    tie mode, so dyadic doubles that land exactly on decimal midpoints
    (k/2^n with n > d·log2(10)) quantize identically in every engine.
    Exact for |x| < ~9·10^(18-d) (Spark's floor(double) yields LONG)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**digits))
    return F.floor(c * p + F.lit(0.5)) / p


def qround_sql(expr: str, digits: int) -> str:
    p = float(10**digits)
    return f"(floor(({expr}) * {p} + 0.5) / {p})"


def qround_py(x: float, digits: int) -> float:
    import math

    p = float(10**digits)
    return math.floor(x * p + 0.5) / p


_LIT_CACHE: dict[float, str] = {}
_LIT_CON = None


def _lit_con():
    global _LIT_CON
    if _LIT_CON is None:
        import duckdb

        _LIT_CON = duckdb.connect()
    return _LIT_CON


def lit_double(x: float) -> str:
    """Bit-exact SQL double expression, safe in BOTH Spark and DuckDB.

    Two traps make naive float embedding cross-engine-unsound:

    * **Bare decimal literals are DECIMAL, not DOUBLE**, in both Spark and
      DuckDB — ``CAST(0.1000000000000000055511151231257827 AS DOUBLE)``
      detours through fixed-point and loses bits (or overflows 38 digits).
    * **DuckDB's string→double parse is not correctly rounded**: it reads
      ``-360288.51238950004`` one ulp off (``…d545`` vs Python/Java's
      ``…d546``). Any oracle-SQL literal emitted as ``{x!r}`` risks a silent
      value shift whenever the misparse lands the wrong side of a 1e-6
      quantizer lattice boundary.

    So this helper emits ``CAST('<digits>' AS DOUBLE)`` — the string-parse
    path, which Java (Spark's side) correctly rounds by spec — choosing the
    first digit string that DuckDB *verifiably* parses back to the identical
    64 bits (one cached ``SELECT`` per distinct float, process-lifetime
    memo):

    1. ``repr(x)`` — shortest correctly-rounding form, almost always fine;
    2. the exact decimal expansion ``format(Decimal(x), 'f')`` — the value
       is exactly representable, so a parser that reads all digits needs no
       rounding at all.

    Raises if neither survives — loudly, instead of a silent one-ulp oracle
    skew. Pinned counterexample lives in tests/test_exact_quantizer.py.
    """
    if x != x:  # NaN
        return "CAST('NaN' AS DOUBLE)"
    if x in (float("inf"), float("-inf")):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    hit = _LIT_CACHE.get(x)
    # 0.0 == -0.0 hits the same cache slot; both digit strings parse
    # sign-exactly, and no oracle compares signed zeros, so it's harmless.
    if hit is not None:
        return hit
    from decimal import Decimal

    con = _lit_con()
    for s in (repr(x), format(Decimal(x), "f")):
        cand = f"CAST('{s}' AS DOUBLE)"
        try:
            got = con.execute(f"SELECT {cand}").fetchone()[0]
        except Exception:
            continue
        if got == x:
            _LIT_CACHE[x] = cand
            return cand
    raise ValueError(f"no DuckDB-bit-exact literal form found for {x!r}")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum({dec_sql(expr)}) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"


def dec_sql(expr: str) -> str:
    return (
        f"CAST(floor(({expr}) * {float(_Q)} + 0.5) / {float(_Q)} "
        f"AS DECIMAL({_PREC},{_SCALE}))"
    )


def dvar_sql(expr: str, ddof: int = 1) -> str:
    n = f"CAST(count({expr}) AS DOUBLE)"
    s = dsum_sql(expr)
    s2 = dsum_sql(f"({expr}) * ({expr})")
    return f"(({s2} - {s} * {s} / {n}) / ({n} - {float(ddof)}))"


def dstd_sql(expr: str, ddof: int = 1) -> str:
    return f"sqrt({dvar_sql(expr, ddof)})"
