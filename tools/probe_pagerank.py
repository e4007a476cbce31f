"""r16: split g_pagerank's wall into construction (eager checkpoints +
counts in pagerank_fixed_point setup) vs execution (the 5-round lineage
drain at collect), per rep — isolates where the first-call cost lives.

Usage: python tools/probe_pagerank.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import __spark_entry__ as entry_mod
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark import (
        plans as _plans,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.session import (
        get_spark,
    )

    spark = get_spark("probe_pagerank")
    t0 = time.time()
    _plans.prepare(spark, sf_dir)
    print(f"prepare: {time.time() - t0:.2f}s", flush=True)
    fn = entry_mod.queries()["g_pagerank"]
    for r in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        n = len(df.collect())
        t2 = time.time()
        print(
            f"rep{r}: construct={t1-t0:.3f}s drain={t2-t1:.3f}s total={t2-t0:.3f}s rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
