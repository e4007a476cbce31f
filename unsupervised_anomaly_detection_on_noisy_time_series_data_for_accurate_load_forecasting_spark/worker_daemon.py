"""Custom PySpark worker daemon: pre-import the heavy Python dependencies
ONCE in the daemon process so every forked worker inherits them via
copy-on-write (r15 optimization, guide §4.5 taken to the process level).

Python workers are forked from the daemon per task and, with
``spark.python.worker.reuse=true``, pooled afterwards — but any event that
drains the pool (worker exit, streaming query teardown, memory pressure)
makes the next Arrow-island stage pay a fresh ``import numpy/pandas/pyarrow
+ engine package`` in EVERY concurrently forked worker. Measured during
bench runs: the pure-Python codec islands (mm_png/mm_wav/...) ran 1.4 s
isolated but 5–15 s in-bench whenever they landed on a cold pool — 32
simultaneous cold imports, ~2–4 s each, serialized behind page-cache and
CPU contention, dwarfing the ~10 ms of actual per-task codec work.

Importing here moves that cost to one single import at daemon startup;
forks afterwards are ~ms regardless of pool state. The worker-side module
state is identical (same modules, same versions) — imports are idempotent
and Spark's worker protocol is unchanged; we delegate straight to the
stock ``pyspark.daemon`` manager loop.

Enabled via ``spark.python.daemon.module`` in session.get_spark (only
consulted on non-Windows, where the fork daemon is in use — the same
condition under which this optimization applies at all).
"""

from __future__ import annotations


def _preload() -> None:
    import importlib

    for mod in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyarrow.compute",
        "pyspark.sql.pandas.serializers",
        "pyspark.sql.pandas.types",
        # the engine package chain the Arrow islands reference (workers
        # import it when unpickling island closures by reference; the
        # plans modules only build SQL strings / register specs at import)
        __package__ + ".plans.queries_stream_mm",
    ):
        try:
            importlib.import_module(mod)
        except Exception:  # pragma: no cover - preload is best-effort
            pass


_preload()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
