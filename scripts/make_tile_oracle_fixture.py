#!/usr/bin/env python3
"""(Re)generate the q_tile_assignment oracle fixture: the Spark-free
blocks twin (sources/synth.gen_tile_blocks_pdf) materialized to parquet
at the driver's correctness-gate scale (sf0.01 -> 1000 images, grid=4,
res=12).  tests/test_spatial.py pins that this file matches both a
fresh twin run and Spark's image_blocks output, so drift between the
committed fixture and the operator fails CI-style."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbf2json_spark.sources.synth import gen_tile_blocks_pdf  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "tile_blocks_1000.parquet")
N, GRID, RES = 1000, 4, 12

if __name__ == "__main__":
    pdf = gen_tile_blocks_pdf(N, grid=GRID, res=RES)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {OUT}")
