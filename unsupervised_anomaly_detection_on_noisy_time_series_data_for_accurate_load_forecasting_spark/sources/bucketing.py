"""Bucketed table layout for co-located fact-fact joins.

At 100 TB the lineitem⋈orders shuffle dominates TPC-H-shaped plans. Writing
both tables bucketed by the join key (same bucket count) lets Catalyst plan a
sort-merge join with **zero Exchange** — each bucket pair joins locally.
This is the storage-side contract; `tests/test_bucketing.py` asserts the
shuffle-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (+sorted) managed table. Bucket count is the
    scale knob: pick so each bucket ≈ one task's worth of data."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # in-memory catalogs forget tables across sessions but the warehouse
    # files survive — clear the stale location too
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — Catalyst elides
    both exchanges when bucket specs line up."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    # MERGE hint: at real scale neither fact side broadcasts; the hint keeps
    # the test-SF plan on the same (shuffle-free, bucket-aligned) strategy.
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])


def write_partitioned(df: DataFrame, table: str, partition_col: str) -> None:
    """Persist hive-partitioned by ``partition_col`` — the layout contract
    that turns partition-column predicates into directory pruning: a filter
    on the column never reads the other partitions' files at all (visible
    as PartitionFilters in the scan node). The 100 TB discipline: partition
    by the always-filtered low-cardinality column (date, source, lang),
    bucket by the high-cardinality join key."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    df.write.mode("overwrite").partitionBy(partition_col).saveAsTable(table)
