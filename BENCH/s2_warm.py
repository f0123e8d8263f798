#!/usr/bin/env python3
"""Warm-session s2 vs equirect gate cost (VERDICT r4 next-round #5).

The s2 families pay a ~0.4-1 s fixed janino compile per COLD query
(fresh exprIds defeat the codegen source cache — BENCH/BASELINE.md
codec section).  The session-level answer is attach-once: derive the
cell + fst columns ONCE (Engine.attach_s2 / with_s2_cell(keep_fst=True)
+ persist), then every later query reuses the materialized columns and
compiles only its own small stages.

This script measures, in ONE session at the sf0.01 gate scale:
  - cold:  per-call q_pip_rect{,_s2} / q_knn_geo{,_s2} (fresh frame and
           key build per call — the interactive worst case);
  - warm:  the same PIP/kNN over PRE-ATTACHED, persisted key columns
           (equirect cell via the pandas-udf attach, s2 via attach_s2),
           median of `reps` calls each.

Output: one JSON line with medians and the warm s2/equirect ratios.
Usage: python3 BENCH/s2_warm.py [reps=5]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return time.perf_counter() - t0, n


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from pbf2json_spark import Engine
    from pbf2json_spark.functions.cellsql import with_s2_cell
    from pbf2json_spark.operators.spatial import knn, point_in_polygon
    from pbf2json_spark.plans.session import build_session

    spark = build_session(app_name="s2-warm", cores=8,
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    q = e.queries()

    out = {"sf_dir": SF_DIR, "reps": reps, "cold": {}, "warm": {}}

    # --- cold: the driver-gate path, fresh key build per call ----------
    for name in ("q_pip_rect", "q_pip_rect_s2", "q_knn_geo",
                 "q_knn_geo_s2"):
        ts = []
        for _ in range(reps):
            t, _n = timed(lambda: q[name](spark, SF_DIR).count())
            ts.append(t)
        out["cold"][name] = round(statistics.median(ts), 3)

    # --- warm: attach-once, persisted key columns ----------------------
    pts = e._customer_points(spark, SF_DIR)
    eq = pts.withColumn("cell_r9", e._cell_udf(9)("lat", "lon")) \
            .withColumn("cell_r12", e._cell_udf(12)("lat", "lon")) \
            .persist()
    eq.count()
    s2 = eng.attach_s2(pts, level=9, out_col="s2_l9")
    s2 = with_s2_cell(s2, "lat", "lon", 8, "s2_l8")  # reuses fst
    s2.persist().count()

    polys = e._wrap_polys(spark).unionByName(spark.createDataFrame(
        [(pid, [a, b, b, a, a], [c, c, d, d, c], {})
         for pid, (a, b, c, d) in e.RECTS.items()],
        schema="poly_id string, ring_lats array<double>, "
               "ring_lons array<double>, tags map<string,string>"))
    queries = spark.createDataFrame(
        e.KNN_QUERIES, schema="query_id string, lat double, lon double")

    jobs = {
        "pip_eq": lambda: point_in_polygon(
            eq, polys, res=9, point_id="point_id").count(),
        "pip_s2": lambda: point_in_polygon(
            s2, polys, res=8, point_id="point_id", family="s2").count(),
        "knn_eq": lambda: knn(eq, queries, k=e.KNN_K, res=12,
                              initial_ring=2, point_id="point_id").count(),
        "knn_s2": lambda: knn(s2, queries, k=e.KNN_K, res=12,
                              initial_ring=2, point_id="point_id",
                              family="s2").count(),
    }
    for name, fn in jobs.items():
        fn()  # first call absorbs one-time plan/codegen for this shape
        ts = []
        for _ in range(reps):
            t, _n = timed(fn)
            ts.append(t)
        out["warm"][name] = round(statistics.median(ts), 3)

    out["warm_ratio_pip"] = round(out["warm"]["pip_s2"]
                                  / out["warm"]["pip_eq"], 3)
    out["warm_ratio_knn"] = round(out["warm"]["knn_s2"]
                                  / out["warm"]["knn_eq"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
