"""Scale-technique evidence: bucketed joins elide exchanges; salted joins
spread hot keys; results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.skew import (
    salted_join,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    write_bucketed(orders, "ord_b", "o_orderkey", n_buckets=4, sort_col="o_orderkey")
    joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it is still a correct join
    expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expect


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = salted_join(li, parts, key="l_partkey", n_salts=4, salt_source="l_orderkey")
    plain = li.join(parts, "l_partkey")
    a = salted.groupBy("p_brand").agg(F.sum("l_quantity").alias("q")).collect()
    b = plain.groupBy("p_brand").agg(F.sum("l_quantity").alias("q")).collect()
    assert sorted((r.p_brand, round(r.q, 6)) for r in a) == sorted(
        (r.p_brand, round(r.q, 6)) for r in b
    )


def test_bloom_bitmap_prunes_without_false_negatives(spark, sf_dir):
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.relational import (
        bloom_filter_bitmap,
        bloom_might_contain,
        bloom_pruned_segment_revenue,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = bloom_filter_bitmap(seg, "c_custkey")

    pruned = orders.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain("o_custkey")
    )
    n_all, n_pruned = orders.count(), pruned.count()
    true_keys = {r.c_custkey for r in seg.collect()}
    n_true = orders.filter(F.col("o_custkey").isin(true_keys)).count()
    # no false negatives: every truly-joining order survives the filter
    assert n_pruned >= n_true
    # and the filter genuinely prunes (BUILDING is ~1/5 of customers)
    assert n_pruned < n_all

    got = {
        r.o_orderpriority: (r.n_orders, r.revenue)
        for r in bloom_pruned_segment_revenue(customer, orders).collect()
    }
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.exact import (
        dsum,
    )

    plain = (
        orders.join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("rev"))
    )
    expected = {r.o_orderpriority: (r.n, r.rev) for r in plain.collect()}
    assert got == expected


def test_zorder_files_cover_2d_tiles(spark, sf_dir):
    """Z-ordered layout: files must cover compact 2-D tiles, so (a) a box
    predicate on both dimensions intersects a minority of files, (b) EACH
    single-dimension predicate alone also prunes — the property no 1-D
    sort can give (the contrast layout sorts by custkey only: its date
    predicate must touch every file)."""
    import datetime

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        write_zordered,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    od = load_table(spark, sf_dir, "orders")
    write_zordered(od, "z_orders_test", "o_custkey", "o_orderdate", n_files=16)

    def file_stats(table_df):
        return table_df.select(
            "o_custkey", "o_orderdate", F.input_file_name().alias("f")
        ).groupBy("f").agg(
            F.min("o_custkey").alias("cx0"), F.max("o_custkey").alias("cx1"),
            F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1"),
        ).collect()

    stats = file_stats(spark.table("z_orders_test"))
    n = len(stats)
    assert n >= 8, f"expected a multi-file layout, got {n}"
    lo_d, hi_d = datetime.datetime(1997, 1, 1), datetime.datetime(1998, 7, 1)

    def hits(rows, ck=True, dt=True):
        out = []
        for s in rows:
            if ck and (s.cx1 < 300 or s.cx0 > 600):
                continue
            if dt and (s.d1 < lo_d or s.d0 >= hi_d):
                continue
            out.append(s)
        return len(out)

    assert hits(stats) <= n // 2, "2-D box must touch a minority of z-tiles"
    assert hits(stats, dt=False) < n, "custkey-only predicate must prune z-tiles"
    assert hits(stats, ck=False) < n, "date-only predicate must prune z-tiles"

    # contrast: 1-D custkey sort — date-only predicate cannot prune at all
    (
        od.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .saveAsTable("lin_orders_test")
    )
    lin = file_stats(spark.table("lin_orders_test"))
    assert hits(lin, ck=False) == len(lin), "1-D layout should NOT prune on date"
    spark.sql("DROP TABLE IF EXISTS lin_orders_test")


def test_zorder_write_is_idempotent(spark, sf_dir):
    """Re-invoking write_zordered with identical inputs must skip the
    rewrite (plan-key stamp), so warm bench/test runs don't churn the
    warehouse."""
    import os
    from urllib.parse import urlparse

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        write_zordered,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    od = load_table(spark, sf_dir, "orders")
    write_zordered(od, "z_orders_idem", "o_custkey", "o_orderdate", n_files=4)
    files = sorted(
        urlparse(u).path for u in spark.table("z_orders_idem").inputFiles()
    )
    mtimes = {f: os.stat(f).st_mtime_ns for f in files}
    write_zordered(od, "z_orders_idem", "o_custkey", "o_orderdate", n_files=4)
    assert {f: os.stat(f).st_mtime_ns for f in files} == mtimes, "rewrite happened"
    spark.sql("DROP TABLE IF EXISTS z_orders_idem")


def test_compact_partitions_rewrites_only_fragmented(spark, sf_dir):
    """Small-files compaction: a partitioned table whose 'en' partition was
    deliberately fragmented into many files compacts to the row-count
    target, other partitions stay byte-identical (file counts unchanged),
    and the table's data survives the rewrite exactly."""
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        compact_partitions,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    spark.sql("DROP TABLE IF EXISTS compact_docs")
    # fragment: 16 files per partition (micro-batch append simulation)
    docs.repartition(16).write.mode("overwrite").partitionBy("lang").saveAsTable(
        "compact_docs"
    )
    before = {
        r["lang"]: r["n"]
        for r in spark.table("compact_docs").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    stats = compact_partitions(spark, "compact_docs", target_rows_per_file=50_000)
    # stats key by the full partition spec ("lang=en"), not the bare value
    by_part = {spec.split("=", 1)[1]: (fb, fa, n) for spec, fb, fa, n in stats}
    assert by_part, "no partitions reported"
    for val, (fb, fa, n) in by_part.items():
        assert n == before[val]
        if fb > 1:
            assert fa < fb, f"{val}: {fb} files not compacted"
            assert fa == max(1, -(-n // 50_000))
    after = {
        r["lang"]: r["n"]
        for r in spark.table("compact_docs").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert after == before, "compaction changed the data"
    spark.sql("DROP TABLE IF EXISTS compact_docs")


def test_compact_partitions_multilevel_escaped_and_null_specs(spark):
    """The spec parser must handle what SHOW PARTITIONS really emits:
    multi-level specs (a=1/b=2), URL-escaped values (spaces → %20), and
    __HIVE_DEFAULT_PARTITION__ for NULL — each resolving to a typed column
    predicate that matches the partition's actual rows (the old
    string-interpolated WHERE silently matched 0 rows for all three)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        compact_partitions,
    )

    spark.sql("DROP TABLE IF EXISTS compact_tricky")
    rows = []
    for i in range(40):
        rows.append(Row(x=i, region=1, city="new york"))
        rows.append(Row(x=i, region=2, city=None))
    (
        spark.createDataFrame(rows)
        .repartition(8)
        .write.mode("overwrite")
        .partitionBy("region", "city")
        .saveAsTable("compact_tricky")
    )
    before = {
        (r["region"], r["city"]): r["n"]
        for r in spark.table("compact_tricky")
        .groupBy("region", "city")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stats = compact_partitions(spark, "compact_tricky", target_rows_per_file=50_000)
    assert len(stats) == len(before) == 2
    for spec, fb, fa, n in stats:
        assert n > 0, f"{spec}: predicate matched 0 rows"
        assert fb >= 1
        if fb > 1:
            assert fa == 1, f"{spec}: not compacted ({fb}->{fa})"
    total_after = spark.table("compact_tricky").count()
    assert total_after == sum(before.values())
    # the escaped-space and NULL partitions each kept their exact rows
    assert spark.table("compact_tricky").where(F.col("city") == "new york").count() == 40
    assert spark.table("compact_tricky").where(F.col("city").isNull()).count() == 40
    spark.sql("DROP TABLE IF EXISTS compact_tricky")


def test_expire_old_partitions_drops_below_cutoff_only(spark, sf_dir):
    """Retention: partitions strictly below the cutoff are dropped as whole
    directories (metadata delete, no rewrite), newer partitions and their
    rows survive untouched, and the report accounts every dropped row."""
    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        expire_old_partitions,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    od = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    spark.sql("DROP TABLE IF EXISTS retain_orders")
    od.write.mode("overwrite").partitionBy("o_month").saveAsTable("retain_orders")
    before = {
        r["o_month"]: r["n"]
        for r in spark.table("retain_orders").groupBy("o_month").agg(F.count("*").alias("n")).collect()
    }
    cutoff = sorted(before)[len(before) // 2]
    stats = expire_old_partitions(spark, "retain_orders", "o_month", cutoff)
    dropped = {spec.split("=", 1)[1]: n for spec, n in stats}
    assert dropped, "nothing dropped"
    assert all(m < cutoff for m in dropped)
    assert all(dropped[m] == before[m] for m in dropped)
    after = {
        r["o_month"]: r["n"]
        for r in spark.table("retain_orders").groupBy("o_month").agg(F.count("*").alias("n")).collect()
    }
    assert after == {m: n for m, n in before.items() if m >= cutoff}
    spark.sql("DROP TABLE IF EXISTS retain_orders")


def test_expire_old_partitions_exact_spec_null_and_quote_levels(spark):
    """The DROP spec must name the EXACT partition: a NULL second level is
    addressed by its catalog literal (a partial spec would silently drop
    every sibling under the same day), and a value containing a single
    quote is escaped, not interpolated raw into the ALTER statement."""
    spark.sql("DROP TABLE IF EXISTS retain_tricky")
    df = spark.createDataFrame(
        [
            ("2024-01-01", None, 1),
            ("2024-01-01", "a'b", 2),
            ("2024-01-01", "keep", 3),
            ("2024-06-01", None, 4),
            ("2024-06-01", "a'b", 5),
        ],
        "day string, city string, v int",
    )
    df.write.mode("overwrite").partitionBy("day", "city").saveAsTable("retain_tricky")

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.bucketing import (
        expire_old_partitions,
    )

    stats = expire_old_partitions(spark, "retain_tricky", "day", "2024-03-01")
    # each dropped spec accounted exactly one row; the 2024-06 siblings
    # (including the NULL and quoted cities) survive untouched
    assert sorted(stats) == [
        ("day=2024-01-01/city=__HIVE_DEFAULT_PARTITION__", 1),
        ("day=2024-01-01/city=a%27b", 1),
        ("day=2024-01-01/city=keep", 1),
    ]
    left = {(r["day"], r["city"]) for r in spark.table("retain_tricky").collect()}
    assert left == {("2024-06-01", None), ("2024-06-01", "a'b")}
    spark.sql("DROP TABLE IF EXISTS retain_tricky")
