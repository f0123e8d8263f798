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

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")
GRID, RES = 4, 12
# 1000 = the driver gate scale (sf0.01); 10000 = the sf0.1 sweep scale
SIZES = (1000, 10000)

if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or list(SIZES)
    os.makedirs(FIXDIR, exist_ok=True)
    for n in sizes:
        pdf = gen_tile_blocks_pdf(n, grid=GRID, res=RES)
        out = os.path.join(FIXDIR, f"tile_blocks_{n}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {len(pdf)} rows -> {out}")
