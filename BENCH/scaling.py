#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json:2,14).

No real cluster exists in this sandbox, so the N vs 4N executor
comparison is evidenced as local[8] vs local[32] on the same host and
the same input (the driver-sanctioned stand-in — see the round prompt
and BASELINE.md).  Runs bench.py at both parallelism levels, computes
throughput at each plus scaling efficiency, and writes
BENCH/BASELINE.md.

Usage: python3 BENCH/scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPATIAL = ("attach_geo", "pip", "knn", "tile_assignment")


def run_bench(cpus: int, n_images: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_N_IMAGES=str(n_images),
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        r = run_bench(cpus, n_images, sf_dir)
        r["wall"] = round(time.time() - t0, 1)
        results[cpus] = r
        print(f"local[{cpus}]: {json.dumps(r)}", flush=True)

    def spatial_sec(r):
        return sum(r["queries"][q] for q in SPATIAL)

    s8, s32 = spatial_sec(results[8]), spatial_sec(results[32])
    thr8 = 3 * n_images / s8
    thr32 = 3 * n_images / s32
    eff = (thr32 / thr8) / 4.0

    md = f"""# BENCH/BASELINE.md — measured engine numbers

Target metric (BASELINE.json:2,14): spatial-join + tile-assignment
rows/sec with throughput scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence: the same job, same input, at local[8]
vs local[32] on this 32-core/125 GB host (the N vs 4N stand-in the
round prompt prescribes — no real cluster exists here).

Input: {n_images:,} synthetic images (exact hinted schema), zipfian
hotspot geo distribution; driver tables at `{sf_dir}`.

| parallelism | spatial suite sec (attach+PIP+kNN+tile) | spatial rows/sec | full-suite sec |
|---|---|---|---|
| local[8]  | {s8:.1f} | {thr8:,.0f} | {results[8]['value']:.1f} |
| local[32] | {s32:.1f} | {thr32:,.0f} | {results[32]['value']:.1f} |

**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.2f}**
(target >= 0.8).

Per-query seconds:

| query | local[8] | local[32] |
|---|---|---|
"""
    for q in results[8]["queries"]:
        md += (f"| {q} | {results[8]['queries'][q]:.2f} "
               f"| {results[32]['queries'][q]:.2f} |\n")
    md += f"""
Raw JSON:

```
local[8]:  {json.dumps(results[8])}
local[32]: {json.dumps(results[32])}
```

Reference comparison: pelias/pbf2json publishes no benchmark numbers
(see repo BASELINE.md); its e2e corpus is a 40 MB PBF processed in
three single-process passes.  This engine's single-node throughput at
the same data scale is measured above; correctness parity with the
reference is pinned by tests/test_denormalize.py (row-for-row vs the
pure-Python oracle for all 7 reference query shapes).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3),
                      "thr8": round(thr8), "thr32": round(thr32)}))


if __name__ == "__main__":
    main()
