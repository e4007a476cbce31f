"""Persisted experiment-metrics contract — the engine's MLflow analog.

The reference logs params + metrics at every pipeline stage
(/root/reference/src/pipeline.py:136-148, 275-287, 411-486 via
mlflow.log_params/log_metrics, plus a results.txt). Here the contract is a
columnar parquet log with two long tables:

    metrics(run_id, stage, metric, value DOUBLE)
    params (run_id, stage, param,  value STRING)

Append-mode parquet: each log call writes a small file; readers get the
whole history with one scan, filterable by run/stage (partition pruning on
run_id). No timestamps by design — the engine is deterministic end-to-end
and the log must be too; callers that want wall-clock put it in params.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

METRICS_COLS = "run_id string, stage string, metric string, value double"
PARAMS_COLS = "run_id string, stage string, param string, value string"


class MetricsLog:
    """Tiny append-only experiment log over a parquet directory pair."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    def log_metrics(self, run_id: str, stage: str, metrics: dict[str, float]) -> None:
        rows = [(run_id, stage, k, float(v)) for k, v in sorted(metrics.items())]
        df = self.spark.createDataFrame(rows, METRICS_COLS)
        df.repartition(1).write.mode("append").partitionBy("run_id").parquet(f"{self.path}/metrics")

    def log_params(self, run_id: str, stage: str, params: dict[str, object]) -> None:
        rows = [(run_id, stage, k, str(v)) for k, v in sorted(params.items())]
        df = self.spark.createDataFrame(rows, PARAMS_COLS)
        df.repartition(1).write.mode("append").partitionBy("run_id").parquet(f"{self.path}/params")

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/metrics")

    def params(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/params")

    def log_metrics_df(self, run_id: str, stage: str, df: DataFrame, key_cols: list[str]) -> None:
        """Log a small metrics DataFrame (e.g. a per-series metric table):
        each non-key numeric column becomes `stage/<keys>/<col>`. Collects —
        metric tables are by contract tiny aggregates."""
        rows = df.collect()
        out: dict[str, float] = {}
        for r in rows:
            key = "/".join(str(r[k]) for k in key_cols)
            for c in df.columns:
                if c in key_cols:
                    continue
                v = r[c]
                if isinstance(v, (int, float)) and v is not None:
                    out[f"{key}/{c}" if key else c] = float(v)
        self.log_metrics(run_id, stage, out)
