"""M23: experiment grid runner (reference: run_parallel_experiments.py:14-94
fans a 20-row param grid over GPUs with ProcessPoolExecutor).

Spark-first shape: one SparkSession, one job per experiment, submitted
concurrently from driver threads into FAIR scheduler pools — the cluster
scheduler interleaves them instead of processes fighting over devices.
Results come back as plain dicts keyed by experiment name.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import SparkSession


def run_grid(
    spark: SparkSession,
    configs: dict[str, dict[str, Any]],
    fn: Callable[[SparkSession, dict[str, Any]], Any],
    max_concurrency: int = 4,
    pool: str = "experiments",
    log: Any | None = None,  # metrics_log.MetricsLog
    run_id: str = "grid0",
) -> dict[str, Any]:
    """Run `fn(spark, config)` for every named config, concurrently.

    Each thread tags its jobs with a scheduler pool + job group so the UI and
    cancellation work per-experiment. Exceptions are captured per experiment
    (one failing config doesn't sink the grid). With `log`, every
    experiment's params and numeric results land in the persisted
    experiment-metrics contract (the reference's per-run mlflow logging,
    run_parallel_experiments.py + pipeline.py:136-148)."""
    sc = spark.sparkContext

    def run_one(item: tuple[str, dict[str, Any]]) -> tuple[str, Any]:
        name, cfg = item
        sc.setLocalProperty("spark.scheduler.pool", pool)
        sc.setJobGroup(f"grid-{name}", f"experiment {name}", interruptOnCancel=True)
        try:
            return name, {"ok": True, "result": fn(spark, cfg)}
        except Exception as e:  # noqa: BLE001 - grid isolation by design
            return name, {"ok": False, "error": f"{type(e).__name__}: {e}"}
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_concurrency) as ex:
        results = dict(ex.map(run_one, configs.items()))
    if log is not None:
        for name, r in results.items():
            log.log_params(run_id, name, configs[name])
            if r["ok"] and isinstance(r["result"], dict):
                nums = {k: v for k, v in r["result"].items() if isinstance(v, (int, float))}
                if nums:
                    log.log_metrics(run_id, name, nums)
    return results
