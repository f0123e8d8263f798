#!/usr/bin/env python3
"""Scale/shape leg for dedup_groups (VERDICT r3 item 6).

Builds a 10^6-edge duplicate graph with BOTH adversarial shapes at
once — long chains (the diameter case: min-label propagation needs
`chain length` rounds) and high-fan stars (the hot-template case: any
collect_list-based grouping materializes a 10^5-element array) — and
runs the alternating large-star/small-star contraction, recording:

- rounds vs the O(log n) bound (2*log2(n) + 2),
- wall-clock,
- persistent-RDD stability (the deterministic per-round block release
  must keep the count flat: one live checkpoint per round, not a
  growing set),
- component-count + representative correctness (each chain/star has a
  known min id),
- a min-label-propagation STRAWMAN priced per round on the same graph
  (run for a few rounds only; it provably needs `chain length` rounds
  to converge, so wall = per-round cost x 10^5 by construction).

Usage: python3 BENCH/dedup_groups_scale.py [cpus] [chains] [chain_len]
       [stars] [fan]
Defaults: 8 cpus, 5 chains x 100_000, 5 stars x 100_000 fan
          (= 999_995 edges, ~1.0M nodes).
Prints one JSON line.
"""

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    chain_len = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    n_stars = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    fan = int(sys.argv[5]) if len(sys.argv) > 5 else 100_000

    from pyspark.sql import functions as F

    from pbf2json_spark.operators.dedup import dedup_groups
    from pbf2json_spark.plans.session import build_session

    spark = build_session(app_name=f"dedup-groups-scale[{cpus}]",
                          cores=cpus)
    # ids: chain c occupies [c*chain_len, (c+1)*chain_len); star s
    # occupies [star_base + s*(fan+1), ...] with the center first
    star_base = n_chains * chain_len
    chains = (spark.range(n_chains * chain_len)
              .filter((F.col("id") % chain_len) != chain_len - 1)
              .select(F.col("id").alias("doc_a"),
                      (F.col("id") + 1).alias("doc_b")))
    stars = (spark.range(n_stars * fan)
             .select(
                 (F.lit(star_base)
                  + (F.col("id") / fan).cast("long") * (fan + 1))
                 .alias("doc_a"),
                 (F.lit(star_base)
                  + (F.col("id") / fan).cast("long") * (fan + 1)
                  + F.col("id") % fan + 1).alias("doc_b")))
    pairs = chains.unionByName(stars)
    n_edges = pairs.count()
    n_nodes = n_chains * chain_len + n_stars * (fan + 1)

    jsc = spark.sparkContext._jsc.sc()
    stats = {}
    t0 = time.perf_counter()
    out = dedup_groups(pairs, stats=stats)
    n_out = out.count()
    wall = time.perf_counter() - t0
    rdd_after = jsc.getPersistentRDDs().size()

    # correctness: component count and representatives
    comps = out.groupBy("group_rep").count()
    n_comps = comps.count()
    want_comps = n_chains + n_stars
    reps = sorted(r["group_rep"] for r in comps.select("group_rep").collect())
    want_reps = sorted(
        [c * chain_len for c in range(n_chains)]
        + [star_base + s * (fan + 1) for s in range(n_stars)])
    bound = 2 * math.ceil(math.log2(n_nodes)) + 2

    # strawman: min-label propagation priced per round (NOT run to
    # convergence — it needs `chain_len` rounds on the chain)
    sym = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")) \
        .union(pairs.select(F.col("doc_b").alias("u"),
                            F.col("doc_a").alias("v")))
    labels = sym.select("u").distinct().select(
        "u", F.col("u").alias("lbl"))
    lp_rounds = 3
    t0 = time.perf_counter()
    for _ in range(lp_rounds):
        labels = (sym.join(labels, "u")
                  .groupBy(F.col("v").alias("u"))
                  .agg(F.min("lbl").alias("nbr"))
                  .join(labels, "u", "full")
                  .select(F.coalesce("u", "u").alias("u"),
                          F.least(F.coalesce("nbr", F.col("lbl")),
                                  F.coalesce("lbl", F.col("nbr")))
                          .alias("lbl"))
                  .localCheckpoint(eager=True))
    lp_per_round = (time.perf_counter() - t0) / lp_rounds
    lp_projected = lp_per_round * chain_len

    print(json.dumps({
        "cpus": cpus, "edges": int(n_edges), "nodes": int(n_nodes),
        "rows_out": int(n_out),
        "rounds": stats.get("rounds"), "round_bound": bound,
        "wall_sec": round(wall, 2),
        "persistent_rdds_after": int(rdd_after),
        "components": int(n_comps), "components_want": want_comps,
        "reps_correct": reps == want_reps,
        "label_prop_per_round_sec": round(lp_per_round, 2),
        "label_prop_projected_sec": round(lp_projected, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
