"""r16 adjudication probe (r15 verdict §5/#10): how many bytes do the
session-lifetime pinned views hold after prepare(), and at what storage
level? Prints one line per cached RDD/InMemoryRelation plus totals, so the
shared-view memory budget is a measured number instead of a guess.

Usage: python tools/storage_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark import (
        plans as _plans,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.session import (
        get_spark,
    )

    spark = get_spark("storage_probe")
    t0 = time.time()
    _plans.prepare(spark, sf_dir)
    print(f"prepare: {time.time() - t0:.2f}s", flush=True)

    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    tot_mem = tot_disk = 0
    rows = []
    for info in infos:
        mem = info.memSize()
        disk = info.diskSize()
        tot_mem += mem
        tot_disk += disk
        rows.append((mem, disk, info.numCachedPartitions(), info.name(), str(info.storageLevel())))
    for mem, disk, nparts, name, lvl in sorted(rows, reverse=True):
        print(f"{mem/1e6:10.1f} MB mem {disk/1e6:8.1f} MB disk {nparts:4d} parts {lvl:<40s} {name[:100]}")
    print(f"TOTAL: {tot_mem/1e6:.1f} MB mem, {tot_disk/1e6:.1f} MB disk, {len(rows)} cached frames")
    mx = sc._jsc.sc().getExecutorMemoryStatus()
    print("executor memory status:", mx)


if __name__ == "__main__":
    main()
