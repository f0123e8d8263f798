#!/usr/bin/env python3
"""Cluster entry point: the reference CLI as a spark-submit job.

    spark-submit --master <cluster> \
        --py-files pbf2json_spark.zip \
        scripts/pipeline_job.py \
        --nodes s3://bucket/nodes --ways .../ways --relations .../rels \
        --tags "building,shop" [--waynodes] [--salt-hot-refs 32] \
        --out s3://bucket/out_ndjson

Reads the three OSM tables (parquet), runs the full denormalization
(matched nodes + ways + relations), and writes one JSON line per
element — the reference's NDJSON contract (pbf2json <tags> file.pbf >
out.ndjson).  No master/memory is hardcoded: spark-submit provides
them, exactly as the north rule's multi-executor runs require.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", required=True)
    ap.add_argument("--ways", required=True)
    ap.add_argument("--relations", required=True)
    ap.add_argument("--tags", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--waynodes", action="store_true")
    ap.add_argument("--salt-hot-refs", type=int, default=0)
    ap.add_argument("--loose", action="store_true",
                    help="disable strict reference parity quirks")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pbf2json_spark import Engine

    spark = SparkSession.builder.appName("pbf2json-spark").getOrCreate()
    eng = Engine(spark)
    out = eng.run(spark.read.parquet(args.nodes),
                  spark.read.parquet(args.ways),
                  spark.read.parquet(args.relations),
                  args.tags, waynodes=args.waynodes,
                  strict_parity=not args.loose,
                  salt_hot_refs=args.salt_hot_refs)
    out.select("json").write.mode("overwrite").text(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
