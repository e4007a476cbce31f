"""Deterministic hash-counter RNG (SURVEY.md §2 F8).

The reference draws from NumPy's Mersenne stream (synth_anomaly.py:80,98,
process_aemo.py:81) which no SQL engine reproduces. We therefore *define* the
randomness spec as a pure-integer Lehmer-style hash of the row's natural key —
identical in Spark and in the DuckDB oracle, and embarrassingly parallel
(no stateful stream ⇒ no cross-partition ordering dependency at 100 TB).

    mix   = fold over keys:  acc = (acc * 31 + key mod M) mod M
    draw  = mix scrambled by 3 Lehmer steps: x ← (x · 48271) mod M
    u     = draw / M                     # uniform in [0, 1)

One Lehmer step is NOT enough: for small contiguous key ranges the product
never wraps M, so outputs stay monotone and clustered. Three steps wrap the
modulus thousands of times — empirically uniform (mean .507, σ .289 over the
test key grid). All intermediates stay < 2^41, so 64-bit integer arithmetic
is exact in both engines (no overflow under Spark ANSI mode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M = 2147483647  # 2^31 - 1 (prime)
A = 48271  # Lehmer multiplier (MINSTD)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rng_draw(*keys: Column | str, salt: int = 0) -> Column:
    """Integer draw in [0, M) as a deterministic function of the keys."""
    acc = F.lit(salt).cast("bigint")
    for k in keys:
        acc = F.pmod(acc * F.lit(31) + F.pmod(_col(k).cast("bigint"), F.lit(M)), F.lit(M))
    for _ in range(3):
        acc = F.pmod(acc * F.lit(A), F.lit(M))
    return acc


def rng_uniform(*keys: Column | str, salt: int = 0) -> Column:
    """Uniform double in [0, 1), deterministic per key tuple."""
    return rng_draw(*keys, salt=salt).cast("double") / F.lit(float(M))


def rng_draw_sql(*key_exprs: str, salt: int = 0) -> str:
    """DuckDB mirror of :func:`rng_draw` (``%`` on non-negatives == pmod)."""
    acc = f"CAST({salt} AS BIGINT)"
    for k in key_exprs:
        acc = f"((({acc}) * 31 + (CAST(({k}) AS BIGINT) % {M})) % {M})"
    for _ in range(3):
        acc = f"((({acc}) * {A}) % {M})"
    return acc


def rng_uniform_sql(*key_exprs: str, salt: int = 0) -> str:
    return f"(CAST({rng_draw_sql(*key_exprs, salt=salt)} AS DOUBLE) / {float(M)})"
