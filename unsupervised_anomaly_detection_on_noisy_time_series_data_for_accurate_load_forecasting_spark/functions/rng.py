"""Deterministic hash-counter RNG (SURVEY.md §2 F8).

The reference draws from NumPy's Mersenne stream (synth_anomaly.py:80,98,
process_aemo.py:81) which no SQL engine reproduces. We therefore *define* the
randomness spec as a pure-integer Lehmer-style hash of the row's natural key —
identical in Spark and in the DuckDB oracle, and embarrassingly parallel
(no stateful stream ⇒ no cross-partition ordering dependency at 100 TB).

    mix   = fold over keys:  acc = (acc * 31 + key mod M) mod M
    draw  = murmur-style finalizer over mix:
            x ^= x >> 16;  x = (x·73244475) mod M
            x ^= x >> 13;  x = (x·73244475) mod M
            x ^= x >> 16;  x mod M
    u     = draw / M                     # uniform in [0, 1)

The finalizer must be NON-LINEAR: purely multiplicative scrambling (Lehmer
steps) is affine, so two salts yield streams that differ by a fixed offset
mod 1 — draws at different salts were perfectly correlated (e.g. every
contaminated day got the same anomaly type). The xor-shift steps break the
affine structure: empirically mean .502, σ .293, cross-salt correlation .009
over the test key grid. All intermediates stay < 2^58, so 64-bit integer
arithmetic is exact in both engines (no overflow under Spark ANSI mode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M = 2147483647  # 2^31 - 1 (prime)
A = 73244475  # odd finalizer multiplier (murmur-like avalanche)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rng_draw(*keys: Column | str, salt: int = 0) -> Column:
    """Integer draw in [0, M) as a deterministic function of the keys."""
    acc = F.lit(salt).cast("bigint")
    for k in keys:
        acc = F.pmod(acc * F.lit(31) + F.pmod(_col(k).cast("bigint"), F.lit(M)), F.lit(M))
    acc = acc.bitwiseXOR(F.shiftright(acc, 16))
    acc = F.pmod(acc * F.lit(A), F.lit(M))
    acc = acc.bitwiseXOR(F.shiftright(acc, 13))
    acc = F.pmod(acc * F.lit(A), F.lit(M))
    acc = acc.bitwiseXOR(F.shiftright(acc, 16))
    return F.pmod(acc, F.lit(M))


def rng_uniform(*keys: Column | str, salt: int = 0) -> Column:
    """Uniform double in [0, 1), deterministic per key tuple."""
    return rng_draw(*keys, salt=salt).cast("double") / F.lit(float(M))


def rng_draw_sql(*key_exprs: str, salt: int = 0, dialect: str = "duckdb") -> str:
    """SQL-text mirror of :func:`rng_draw`.

    Every reduction is spelled as a true pmod ``((x % M + M) % M)`` — plain
    ``%`` is a *remainder* in DuckDB (negative for negative operands), so a
    negative key (pre-1970 timestamp → negative epoch-day, signed id) would
    silently diverge from Spark's ``pmod`` instead of erroring. With the
    guard, both engines agree for ALL bigint keys. Dialects differ only in
    the xor spelling: DuckDB ``xor(a, b)`` (its ``^`` is power!), Spark
    ``(a ^ b)``. Shift ``>>`` parses in both."""
    xor = (lambda a, b: f"xor({a}, {b})") if dialect == "duckdb" else (lambda a, b: f"(({a}) ^ ({b}))")
    pmod = lambda x: f"((({x}) % {M} + {M}) % {M})"
    acc = f"CAST({salt} AS BIGINT)"
    for k in key_exprs:
        acc = pmod(f"({acc}) * 31 + {pmod(f'CAST(({k}) AS BIGINT)')}")
    acc = xor(acc, f"({acc}) >> 16")
    acc = pmod(f"({acc}) * {A}")
    acc = xor(acc, f"({acc}) >> 13")
    acc = pmod(f"({acc}) * {A}")
    acc = xor(acc, f"({acc}) >> 16")
    return pmod(acc)


def rng_uniform_sql(*key_exprs: str, salt: int = 0, dialect: str = "duckdb") -> str:
    return f"(CAST({rng_draw_sql(*key_exprs, salt=salt, dialect=dialect)} AS DOUBLE) / {float(M)})"


def rng_draw_np(keys, salt: int = 0):
    """Vectorized numpy mirror of :func:`rng_draw` for driver/oracle-side
    replication (e.g. the softpatch numpy mirror). ``keys`` is a sequence of
    int64 arrays (or scalars); returns an int64 array of draws in [0, M).
    All intermediates stay < 2^58, exact in int64."""
    import numpy as np

    arrs = [np.asarray(k, dtype=np.int64) for k in keys]
    acc = np.zeros(np.broadcast(*arrs).shape if len(arrs) > 1 else arrs[0].shape, dtype=np.int64) + np.int64(salt)
    for k in arrs:
        acc = (acc * np.int64(31) + ((k % M) + M) % M) % M
    acc = acc ^ (acc >> np.int64(16))
    acc = (acc * np.int64(A)) % M
    acc = acc ^ (acc >> np.int64(13))
    acc = (acc * np.int64(A)) % M
    acc = acc ^ (acc >> np.int64(16))
    return acc % M
