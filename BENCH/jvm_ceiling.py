#!/usr/bin/env python3
"""Single-JVM scaling ceiling probe (companion to host_ceiling.py).

host_ceiling.py measures what SEPARATE numpy processes can scale to on
this host (cpu 0.927 / decode 0.674 efficiency at 8->32).  This probe
measures the ceiling for ONE Spark JVM — the shape every pure-JVM
(non-Python-worker) engine query runs in under local[N]: a shuffle-free
whole-stage-codegen hash aggregation over spark.range, zero Python,
zero I/O.  Whatever this prints is the best any JVM-side operator can
possibly do on this box; operators at this number are engine-optimal.

Usage: python3 BENCH/jvm_ceiling.py [rows]
Prints one JSON line {"2": s, "8": s, "32": s, "speedup": {...}}.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %r)
from pyspark.sql import functions as F
from pbf2json_spark.plans.session import build_session
c = int(sys.argv[1]); rows = int(sys.argv[2])
spark = build_session(app_name=f"jvmceil{c}", cores=c,
                      shuffle_partitions=2 * c)
spark.sparkContext.setLogLevel("ERROR")
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    spark.range(0, rows, 1, 2 * c).select(
        F.sum(F.xxhash64("id") %% 1000).alias("s")).collect()
    best = min(best, time.perf_counter() - t0)
print(best)
spark.stop()
""" % (REPO,)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000_000
    out = {}
    for c in (2, 8, 32):
        r = subprocess.run([sys.executable, "-c", CHILD, str(c), str(rows)],
                           capture_output=True, text=True, check=True)
        out[str(c)] = round(float(r.stdout.strip().splitlines()[-1]), 3)
    out["speedup"] = {"2->8": round(out["2"] / out["8"], 2),
                      "8->32": round(out["8"] / out["32"], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
