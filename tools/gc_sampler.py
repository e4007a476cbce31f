"""Sample JVM GC + RSS for a running bench/check process (r15 aging probe).

Usage: python tools/gc_sampler.py <java_pid> <out.log> [interval_sec]

Writes one line per tick: wallclock, jstat -gcutil columns (S0 S1 E O M CCS
YGC YGCT FGC FGCT GCT), java RSS MB, total python-worker RSS MB, load1.
Stops when the target pid exits.
"""

from __future__ import annotations

import subprocess
import sys
import time


def rss_mb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
    except OSError:
        return -1
    return -1


def py_workers_rss() -> tuple[int, int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,rss,cmd"], capture_output=True, text=True
    ).stdout
    n, tot = 0, 0
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.worker" in line:
            parts = line.split(None, 2)
            n += 1
            tot += int(parts[1]) // 1024
    return n, tot


def main() -> None:
    pid = int(sys.argv[1])
    out_path = sys.argv[2]
    interval = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    with open(out_path, "w") as out:
        out.write("ts S0 S1 E O M CCS YGC YGCT FGC FGCT GCT java_rss_mb n_py py_rss_mb load1\n")
        while True:
            try:
                with open(f"/proc/{pid}/stat"):
                    pass
            except OSError:
                break
            gc = subprocess.run(
                ["jstat", "-gcutil", str(pid)], capture_output=True, text=True
            ).stdout.strip().splitlines()
            cols = gc[-1].split() if len(gc) >= 2 else ["-"] * 11
            n, tot = py_workers_rss()
            load1 = open("/proc/loadavg").read().split()[0]
            out.write(
                time.strftime("%H:%M:%S")
                + " " + " ".join(cols[:11])
                + f" {rss_mb(pid)} {n} {tot} {load1}\n"
            )
            out.flush()
            time.sleep(interval)


if __name__ == "__main__":
    main()
