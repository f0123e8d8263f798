#!/usr/bin/env python3
"""Scale leg for the text-dedup floor claims (VERDICT r2 item 8).

q_minhash_lsh is ~flat 2->32 at sf0.1 (5k docs): that run is per-job
floor, not a scaling ceiling.  This script builds a deterministic 10x
documents table (each sf0.1 doc expanded into 10 variants whose texts
share a prefix but diverge per variant, so shingle/signature work is
real and the LSH join has genuine near-dup structure) and times
minhash_lsh_pairs at one local[N] level.

Usage: python3 BENCH/minhash_scale.py [cpus] [mult] [lenx]
`lenx` repeats each text lenx times (whitespace-joined), scaling the
per-doc shingle/signature/verify compute without changing the pair
structure — the lever that moves the job from floor-bound to
compute-bound.  Prints one JSON line {cpus, docs, pairs, wall}.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    lenx = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from pbf2json_spark.operators.dedup import minhash_lsh_pairs
    from pbf2json_spark.plans.session import (build_session,
                                              warm_python_workers)

    spark = build_session(app_name=f"minhash-scale[{cpus}]", cores=cpus,
                          shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    path = f"/tmp/bench_docs_{mult}x_{lenx}L.parquet"
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        variants = spark.range(mult).select(
            F.col("id").cast("int").alias("variant"))
        # variant 0 keeps the original text (original near-dup pairs
        # survive); others append a deterministic divergent tail so
        # each variant's shingle set differs but stays ~similar
        long_text = F.concat_ws(" ", *([F.col("text")] * lenx)) \
            if lenx > 1 else F.col("text")
        big = (docs.crossJoin(variants).select(
            F.concat_ws("_", "doc_id", "variant").alias("doc_id"),
            F.when(F.col("variant") == 0, long_text).otherwise(
                F.concat(long_text, F.lit(" variant token "),
                         F.sha2(F.concat_ws("_", "doc_id", "variant"),
                                256))).alias("text")))
        big.repartition(64).write.mode("overwrite").parquet(path)

    docs = spark.read.parquet(path)
    n_docs = docs.count()
    reps = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    best = float("inf")
    pairs = -1
    for _ in range(reps):
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(docs, tau=0.5).count()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"cpus": cpus, "docs": n_docs, "pairs": pairs,
                      "wall": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
