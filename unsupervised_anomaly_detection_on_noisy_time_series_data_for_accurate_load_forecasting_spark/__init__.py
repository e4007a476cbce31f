"""PySpark-native analytics engine with the data-processing capabilities of
MaherDissem/Unsupervised-anomaly-detection-on-noisy-time-series-data-for-accurate-load-forecasting.

Everything here is a fresh, Spark-first design: DataFrame/SQL logical plans
optimized by Catalyst, Pandas UDF islands only where built-ins cannot express
the semantics (sequential recurrences, Torch-style inference).

Layout
------
- ``session``    : SparkSession factory tuned for the target workload.
- ``sources``    : readers/writers (parquet test tables, CSV ingest contracts).
- ``functions``  : scalar/array building blocks incl. the deterministic
                   hash-counter RNG (SURVEY.md §2 F8) mirrored in oracle SQL.
- ``operators``  : relational, time-series, dedup, similarity, text operators.
- ``plans``      : query registry (Spark callable + DuckDB oracle SQL pairs)
                   and the end-to-end anomaly pipeline.
- ``streaming``  : Structured Streaming variants of the scoring path.
"""

__version__ = "0.1.0"
