#!/usr/bin/env python3
"""knn_join at corpus scale on zipfian geo data (r5).

The operator's survival property is DENSITY-AWARE per-row levels: on
the bench geo distribution ~80% of points sit in 5 city-size hotspots,
so a single global join level would hand every hotspot row a candidate
window proportional to hotspot occupancy (candidate volume ~
occupancy^2 per hot cell — the classic kNN-join skew killer; the
single-level prototype spilled the disk dry at 300k).  With per-row
levels the expected window is ~margin*k rows at every density.

Input: points synthesized directly from the SAME geotag derivation the
images table uses (geotag_from_phash over splitmix64 hashes — identical
zipfian hotspot shape), because the join never reads image bytes and a
600k-image parquet cache costs 42 GB of disk for nothing.

Runs the full self-join (every point's k nearest OTHER points) at N
points on local[cpus].  Usage: python3 BENCH/knn_join_scale.py [n] [cpus]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(os.environ.get("SPARK_GRAFT_KNN_JOIN_K", "4"))

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pbf2json_spark.functions import imagecodec as ic
    from pbf2json_spark.operators.spatial import knn_join
    from pbf2json_spark.plans.session import (build_session, ship_package,
                                              warm_python_workers)

    # >= 4.8M points needs headroom past the 8g default: the 9.6M leg's
    # candidate-join tasks hit GCLocker retry walls (268 MB single
    # allocations) and died.  Heap is a leg parameter, not an engine
    # default — a real cluster sizes executors to the data.
    # heap/GC/executor-memory ops settings now come from
    # build_session(profile='corpus') (VERDICT r6 #4); the env knobs
    # (SPARK_GRAFT_DRIVER_MEM / _EXEC_MEM / _CLUSTER_DRIVER_MEM) keep
    # working through the profile.
    # SPARK_GRAFT_MASTER=local-cluster[4,8,12288] runs the SAME leg as
    # N separate executor JVMs (true serialized shuffle over sockets,
    # per-executor heaps) — the literal "N executors vs 4N executors"
    # shape of the scaling criterion, and the control for the
    # single-JVM shared-heap artifact: a local[32] leg shares one
    # allocator/GC across 32 tasks, while 4x8-core executors at the
    # same per-core heap do not.  `cpus` then only sizes shuffle
    # partitions and input splits.
    master = os.environ.get("SPARK_GRAFT_MASTER")
    # 1-min periodic driver GC: shuffle files are only deleted when the
    # driver GC collects the dereferenced shuffle dependencies
    # (ContextCleaner); with a 48g heap the default 30-min interval lets
    # ~50 GB of dead probe/round shuffle files pile up on this sandbox's
    # 57 GB scratch during a 9.6M leg.  On a real cluster the same flag
    # bounds executor scratch on long-lived multi-round jobs.
    extra = {}
    # SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — ad-hoc conf overrides for
    # A/B experiments (e.g. AQE granularity under local-cluster)
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            ck, cv = kv.split("=", 1)
            extra[ck.strip()] = cv.strip()
    spark = build_session(app_name=f"knn-join-{cpus}", cores=cpus,
                          shuffle_partitions=2 * cpus,
                          master=master, extra=extra,
                          profile="corpus")
    spark.sparkContext.setLogLevel(
        os.environ.get("SPARK_GRAFT_LOG_LEVEL", "ERROR"))
    if master:
        ship_package(spark)  # executors are separate JVMs
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
    geo.count()  # materialize input outside the timed window

    pts = geo.selectExpr("point_id as right_id", "lat", "lon")
    left = geo.selectExpr("point_id as left_id", "lat", "lon")

    t0 = time.perf_counter()
    tr = {}

    # progress heartbeat: knn_join fills `tr` in place per phase; a
    # 9.6M leg runs ~10-25 min with nothing printed otherwise
    import threading
    stop_hb = threading.Event()

    def _hb():
        while not stop_hb.wait(60):
            print(f"# t={time.perf_counter()-t0:7.1f}s trace={tr}",
                  file=sys.stderr, flush=True)

    threading.Thread(target=_hb, daemon=True).start()
    out = knn_join(left, pts, k=k, exclude_self=True, trace=tr)
    n_out = out.count()
    stop_hb.set()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "knn_join self-join wall seconds",
        "value": round(wall, 2), "unit": "sec",
        "n_points": n_pts, "k": k, "cpus": cpus,
        "out_rows": n_out,
        "left_rows_per_sec": int(n_pts / wall),
        "trace": tr,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
