#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json:2,14).

No real cluster exists in this sandbox, so the N vs 4N executor
comparison is evidenced as the same job, same input, at multiple
local[N] parallelism levels on this host (the driver-sanctioned
stand-in — see the round prompt and BASELINE.md).  Two practical
facts shape the report:

1. Per-query per-job floors (scheduling + Arrow setup, ~0.3-2 s)
   poison small inputs, so the scaling legs run at a size where
   compute dominates (tile/knn walls >= ~10 s at the small leg).
2. The HOST itself does not deliver 4x from 8->32 vCPUs even for
   embarrassingly-parallel Spark-free numpy (BENCH/host_ceiling.py
   measures ~0.65-0.7 cpu / ~0.6 decode) — hypervisor behavior at
   full occupancy, not engine overhead.  The report therefore shows
   raw efficiency per leg pair AND efficiency relative to the host
   ceiling, with 2->8 (where the host CAN scale ~1.0) as the primary
   N->4N evidence.

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
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_KNN_QUERIES", "10000")

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

    # host ceiling calibration (runs after the legs so the decode probe
    # can reuse the generated image parquet)
    ceil_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "host_ceiling.py")],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ,
                 SPARK_GRAFT_SCALING_LEGS=",".join(map(str, legs))))
    ceiling = json.loads(ceil_out.stdout.strip().splitlines()[-1])
    print(f"host ceiling: {json.dumps(ceiling)}", flush=True)

    thr = {c: 3 * n_images / spatial_sec(results[c]) for c in legs}
    effs, rels = {}, {}
    for lo, hi in zip(legs, legs[1:]):
        key = f"{lo}->{hi}"
        effs[key] = (thr[hi] / thr[lo]) / (hi / lo)
        cap = ceiling.get("eff", {}).get("cpu", {}).get(key)
        rels[key] = effs[key] / cap if cap else None

    rows = "\n".join(
        f"| local[{c}] | {spatial_sec(results[c]):.1f} | {thr[c]:,.0f} "
        f"| {results[c]['value']:.1f} |" for c in legs)
    eff_lines = "\n".join(
        f"- **N={lo} -> 4N={hi}: efficiency = {effs[k]:.2f}** "
        f"(host cpu ceiling {ceiling.get('eff', {}).get('cpu', {}).get(k, '-')}, "
        f"decode ceiling {ceiling.get('eff', {}).get('decode', {}).get(k, '-')}; "
        f"relative-to-ceiling = "
        f"{('%.2f' % rels[k]) if rels[k] else '-'})"
        for k, (lo, hi) in zip(effs, zip(legs, legs[1:])))
    md = f"""# BENCH/BASELINE.md — measured engine numbers

Target metric (BASELINE.json:2,14): spatial-join + tile-assignment
rows/sec with throughput scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence (per the round prompt): the same job on
the same input at multiple local[N] parallelism levels on this
32-core/125 GB host — no real cluster exists here.  Each leg is the
best of {trials} interleaved trials with min-of-repeats per query
(the host shows bursty hypervisor steal that a single run cannot
average out).

Input: {n_images:,} synthetic images (exact hinted schema, realistic
64-256 px payloads), zipfian hotspot geo distribution,
{os.environ['SPARK_GRAFT_KNN_QUERIES']} kNN queries; driver tables at
`{sf_dir}`.  Sizes chosen so per-job floors are <10% of each spatial
query's wall at the smallest leg (VERDICT r1 #9).

| parallelism | spatial suite sec (attach+PIP+kNN+tile) | spatial rows/sec | full-suite sec |
|---|---|---|---|
{rows}

Scaling efficiency (throughput ratio / core ratio), target >= 0.8:

{eff_lines}

**Host ceiling** (BENCH/host_ceiling.py — embarrassingly-parallel,
Spark-free numpy on this host; reproduces in ~1 min):
`{json.dumps(ceiling.get('eff', {}))}`.
The 8->32 rung is capped by the HOST at ~0.65-0.7 even for perfect
engines (hypervisor behavior at full vCPU occupancy), so the primary
N->4N evidence is the 2->8 rung, where the host scales ~1.0 and the
measured engine efficiency is attributable to the plan.  A real
1000-executor cluster does not share this single-box ceiling; the
plan-level properties that transfer are the ones audited per operator
(no driver collects in hot paths, partial top-k, bucketed joins,
map-side partial aggregation).

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
    md += f"host_ceiling: {json.dumps(ceiling)}\n"
    md += """```

Reference comparison: pelias/pbf2json publishes no benchmark numbers
(see repo BASELINE.md); its e2e corpus is a 40 MB PBF processed in
three single-process passes.  This engine's single-node throughput at
the same data scale is measured above; correctness parity with the
reference is pinned by tests/test_denormalize.py (row-for-row vs the
pure-Python oracle for all 7 reference query shapes).
"""
    # regenerate the measured core but PRESERVE the appendix: every
    # '## ' section (round-over-round notes, scale legs, root-causes)
    # appended after the generated tables survives a refresh
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    appendix = ""
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n## ")
        if idx >= 0:
            appendix = old[idx:]
    with open(path, "w") as f:
        f.write(md + appendix)
    print(json.dumps({"efficiency": {k: round(v, 3) for k, v in effs.items()},
                      "relative_to_ceiling": {k: (round(v, 3) if v else None)
                                              for k, v in rels.items()},
                      "throughput": {str(c): round(thr[c]) for c in legs}}))


if __name__ == "__main__":
    main()
