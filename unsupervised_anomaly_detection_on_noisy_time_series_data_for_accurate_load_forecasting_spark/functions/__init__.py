from .exact import dsum, davg, dsum_sql, davg_sql
from .rng import rng_uniform, rng_uniform_sql

__all__ = ["dsum", "davg", "dsum_sql", "davg_sql", "rng_uniform", "rng_uniform_sql"]
