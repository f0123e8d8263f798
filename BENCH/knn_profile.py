#!/usr/bin/env python3
"""Per-phase kNN timing decomposition at the scaling-bench config
(60k points / 10k queries by default) for one local[N] level.

Usage: python3 BENCH/knn_profile.py [cpus] [n_images] [n_queries]
Prints one JSON line with the knn() trace dict + total.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    from pbf2json_spark.operators.spatial import attach_geo, knn
    from pbf2json_spark.plans.session import (build_session,
                                              warm_python_workers)
    from pbf2json_spark.sources.synth import images_df, knn_queries_df

    spark = build_session(app_name=f"knn-profile[{cpus}]", cores=cpus,
                          shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    img_path = f"/tmp/bench_images_{n_images}_64x128x256"
    if os.path.exists(img_path):
        images = spark.read.parquet(img_path)
    else:
        images = images_df(spark, n_images, partitions=128,
                           dims=(64, 128, 256))
    geo = attach_geo(images.select("image_id", "phash"),
                     res_list=(9, 12)).persist()
    geo.count()
    queries = knn_queries_df(spark, n_queries, k=10)

    reps = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    best, best_trace = float("inf"), {}
    for _ in range(reps):
        trace = {}
        t0 = time.perf_counter()
        n = knn(geo, queries, k=10, res=12, initial_ring=2,
                trace=trace).count()
        wall = time.perf_counter() - t0
        if wall < best:
            best, best_trace = wall, trace
    print(json.dumps({"cpus": cpus, "n_images": n_images,
                      "n_queries": n_queries, "rows": n,
                      "wall": round(best, 3), "trace": best_trace}))
    spark.stop()


if __name__ == "__main__":
    main()
