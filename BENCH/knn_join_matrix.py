#!/usr/bin/env python3
"""One-off (ladder spacing x margin) matrix for knn_join start-level
tuning.  Usage: python3 BENCH/knn_join_matrix.py <n> <cpus> <spacing> <margin>
Runs ONE variant per process (fresh JVM) and prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pts = int(sys.argv[1])
    cpus = int(sys.argv[2])
    spacing = int(sys.argv[3])
    margin = float(sys.argv[4])
    k = 4

    import numpy as np
    import pandas as pd

    from pbf2json_spark.functions import imagecodec as ic
    from pbf2json_spark.operators.spatial import knn_join
    from pbf2json_spark.plans.session import (build_session,
                                              warm_python_workers)

    spark = build_session(app_name=f"knnj-mx-{cpus}", cores=cpus,
                          shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    def gen(batches):
        for pdf in batches:
            seqs = pdf["id"].to_numpy(np.uint64)
            ph = ic.splitmix64(seqs).astype(np.int64)
            lat, lon = ic.geotag_from_phash(ph)
            yield pd.DataFrame({
                "point_id": [f"p{int(s):09d}" for s in seqs],
                "lat": lat, "lon": lon})

    geo = spark.range(0, n_pts, numPartitions=4 * cpus) \
        .mapInPandas(gen, "point_id string, lat double, lon double") \
        .persist()
    geo.count()

    pts = geo.selectExpr("point_id as right_id", "lat", "lon")
    left = geo.selectExpr("point_id as left_id", "lat", "lon")
    levels = tuple(range(16, 3, -spacing))

    t0 = time.perf_counter()
    tr = {}
    out = knn_join(left, pts, k=k, exclude_self=True, trace=tr,
                   levels=levels, margin=margin)
    n_out = out.count()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "n": n_pts, "cpus": cpus, "spacing": spacing, "margin": margin,
        "wall": round(wall, 2), "out_rows": n_out, "trace": tr}))
    spark.stop()


if __name__ == "__main__":
    main()
