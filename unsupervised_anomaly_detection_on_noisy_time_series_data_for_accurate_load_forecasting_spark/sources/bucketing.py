"""Bucketed table layout for co-located fact-fact joins.

At 100 TB the lineitem⋈orders shuffle dominates TPC-H-shaped plans. Writing
both tables bucketed by the join key (same bucket count) lets Catalyst plan a
sort-merge join with **zero Exchange** — each bucket pair joins locally.
This is the storage-side contract; `tests/test_bucketing.py` asserts the
shuffle-free plan.

Writes are IDEMPOTENT: each sink stamps a plan-fingerprint table property
(`graft.plan_key`, a hash of the analyzed input plan plus the layout spec)
and skips the rewrite when an identical table already exists — so building
the `sink_partition_prune` / `bucketed_join_revenue` plans repeatedly (tests,
explains, bench warm runs) does not rewrite warehouse state each time.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def _plan_key(df: DataFrame, *layout: object) -> str:
    """Fingerprint of the analyzed input plan + layout spec + SOURCE DATA
    identity. The analyzed plan string embeds the source paths, so the same
    table name fed from a different SF directory (or a changed upstream
    query) re-triggers the write. Two refinements keep the skip honest:

    - exprIds (``#123``) are stripped before hashing — they are session/
      counter dependent, so the raw plan string would make the skip fire
      unpredictably across sessions reading identical data;
    - the input files' (name, size, mtime) triples are folded in via
      ``df.inputFiles()`` — regenerating the source parquet at the SAME path
      changes the fingerprint, so a stale bucketed table can't silently keep
      serving bucketed-join queries."""
    import os
    import re

    plan = re.sub(r"#\d+", "#", df._jdf.queryExecution().analyzed().toString())
    from urllib.parse import urlparse

    ident = []
    for uri in sorted(df.inputFiles()):
        p = urlparse(uri).path
        try:
            st = os.stat(p)
            ident.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            ident.append(p)  # non-local / vanished: name-only identity
    return hashlib.sha256(
        (plan + "|" + repr(layout) + "|" + ";".join(ident)).encode()
    ).hexdigest()[:16]


def _existing_plan_key(spark: SparkSession, table: str) -> str | None:
    if not spark.catalog.tableExists(table):
        return None
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    return {r["key"]: r["value"] for r in rows}.get("graft.plan_key")


def _clear_stale(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry and its storage. Prefer the catalog-reported
    location; fall back to the default managed-table path only when the
    in-memory catalog has forgotten the table but its files survive."""
    import shutil
    from urllib.parse import urlparse

    loc = None
    if spark.catalog.tableExists(table):
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
            if r["col_name"].strip() == "Location":
                loc = urlparse(r["data_type"].strip()).path
                break
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc is None:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = f"{wh}/{table}"
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (+sorted) managed table. Bucket count is the
    scale knob: pick so each bucket ≈ one task's worth of data. No-op when
    the identical table (same input plan + layout) already exists."""
    spark = df.sparkSession
    key = _plan_key(df, "bucket", bucket_col, n_buckets, sort_col)
    if _existing_plan_key(spark, table) == key:
        return
    _clear_stale(spark, table)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('graft.plan_key'='{key}')")


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
    bucket by the high-cardinality join key. No-op when the identical table
    (same input plan + layout) already exists."""
    spark = df.sparkSession
    key = _plan_key(df, "partition", partition_col)
    if _existing_plan_key(spark, table) == key:
        return
    _clear_stale(spark, table)
    df.write.mode("overwrite").partitionBy(partition_col).saveAsTable(table)
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('graft.plan_key'='{key}')")
