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

    def spatial_sec(r):
        return sum(r["queries"][q] for q in SPATIAL)

    # interleaved trials: the host shows bursty hypervisor steal, so one
    # leg can eat a noise burst the other doesn't see; alternating legs
    # and keeping each leg's best run removes the burst bias
    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2"))
    legs = tuple(int(c) for c in os.environ.get(
        "SPARK_GRAFT_SCALING_LEGS", "2,8,32").split(","))
    results = {}
    for trial in range(trials):
        for cpus in legs:
            t0 = time.time()
            r = run_bench(cpus, n_images, sf_dir)
            r["wall"] = round(time.time() - t0, 1)
            print(f"trial{trial} local[{cpus}]: {json.dumps(r)}", flush=True)
            if cpus not in results or spatial_sec(r) < spatial_sec(results[cpus]):
                results[cpus] = r

    thr = {c: 3 * n_images / spatial_sec(results[c]) for c in legs}
    effs = {}
    for lo, hi in zip(legs, legs[1:]):
        effs[f"{lo}->{hi}"] = (thr[hi] / thr[lo]) / (hi / lo)

    rows = "\n".join(
        f"| local[{c}] | {spatial_sec(results[c]):.1f} | {thr[c]:,.0f} "
        f"| {results[c]['value']:.1f} |" for c in legs)
    eff_lines = "\n".join(
        f"- **N={lo} -> 4N={hi}: efficiency = {e:.2f}**"
        for (lo, hi), e in zip(zip(legs, legs[1:]), effs.values()))
    md = f"""# BENCH/BASELINE.md — measured engine numbers

Target metric (BASELINE.json:2,14): spatial-join + tile-assignment
rows/sec with throughput scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence (per the round prompt): the same job on
the same input at multiple local[N] parallelism levels on this
32-core/125 GB host — no real cluster exists here.  Each leg is the
best of {os.environ.get('SPARK_GRAFT_SCALING_TRIALS', '2')} interleaved
trials with min-of-repeats per query (the host shows bursty
hypervisor steal that a single run cannot average out).

Input: {n_images:,} synthetic images (exact hinted schema, realistic
64-256 px payloads), zipfian hotspot geo distribution; driver tables
at `{sf_dir}`.

| parallelism | spatial suite sec (attach+PIP+kNN+tile) | spatial rows/sec | full-suite sec |
|---|---|---|---|
{rows}

Scaling efficiency (throughput ratio / core ratio), target >= 0.8:

{eff_lines}

Known sandbox ceilings quantified during tuning (see commit history):
the JVM<->Python Arrow channel ANTI-scales with worker count on this
host (670 MB/s at 8 workers -> 400 MB/s at 32), which is why the tile
stage reads parquet splits directly in the Python workers; and each
Spark job carries a ~2-3 s fixed floor (scheduling + Arrow setup)
that dominates at high core counts when a query's true compute is
seconds — on a real 1000-executor cluster those floors amortize over
minutes-long stages.

Per-query seconds:

| query | {' | '.join(f'local[{c}]' for c in legs)} |
|---|{'---|' * len(legs)}
"""
    for q in results[legs[0]]["queries"]:
        md += ("| " + q + " | "
               + " | ".join(f"{results[c]['queries'][q]:.2f}" for c in legs)
               + " |\n")
    md += "\nRaw JSON:\n\n```\n"
    for c in legs:
        md += f"local[{c}]: {json.dumps(results[c])}\n"
    md += """```

Reference comparison: pelias/pbf2json publishes no benchmark numbers
(see repo BASELINE.md); its e2e corpus is a 40 MB PBF processed in
three single-process passes.  This engine's single-node throughput at
the same data scale is measured above; correctness parity with the
reference is pinned by tests/test_denormalize.py (row-for-row vs the
pure-Python oracle for all 7 reference query shapes).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": {k: round(v, 3) for k, v in effs.items()},
                      "throughput": {str(c): round(thr[c]) for c in legs}}))


if __name__ == "__main__":
    main()
