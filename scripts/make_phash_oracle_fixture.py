#!/usr/bin/env python3
"""(Re)generate the q_phash_near_dup oracle fixture: the Spark-free
phash twin (sources/synth.gen_phash_pdf) materialized to parquet at the
driver's correctness-gate scales.  Each row is (image_id, phash) with
phash recomputed from the DECODED bytes, plus a perturbed 'dup'-prefixed
copy of every 7th image (synth.perturb_pixels).  tests/test_imagecodec.py
pins that this file matches both a fresh twin run and the Spark
phash_images output, so drift between the committed fixture and the
operator fails CI-style."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbf2json_spark.sources.synth import gen_phash_pdf  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")
# 1000 = the driver gate scale (sf0.01); 10000 = the sf0.1 sweep scale
SIZES = (1000, 10000)

if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or list(SIZES)
    os.makedirs(FIXDIR, exist_ok=True)
    for n in sizes:
        pdf = gen_phash_pdf(n)
        out = os.path.join(FIXDIR, f"phash_{n}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {len(pdf)} rows -> {out}")
