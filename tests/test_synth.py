"""Generator determinism + invariants, incl. the Spark-side distributed
images generator (exact hinted shape, BASELINE.json:15)."""

import numpy as np
import pandas as pd

from pbf2json_spark.functions import imagecodec as ic
from pbf2json_spark.sources import synth


def test_images_deterministic():
    a = synth.gen_images_pdf(20)
    b = synth.gen_images_pdf(20)
    assert a.equals(b)


def test_images_rows_satisfy_invariants():
    pdf = synth.gen_images_pdf(30)
    assert list(pdf.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    for r in pdf.itertuples():
        px = ic.decode_image(r.bytes)
        assert px.shape == (r.h, r.w, 3)
        src = ic.gen_pixels(int(r.image_id[3:]), r.w, r.h)
        if r.fmt in ("raw", "rle"):
            assert np.array_equal(px, src)          # lossless: exact
        else:
            assert ic.psnr(src, px) >= 40.0          # lossy: PSNR >= 40 dB
        assert r.phash == ic.phash64(src)
        assert r.caption == synth.caption_for(int(r.image_id[3:]))


def test_osm_tables_guarantees():
    nodes, ways, rels = synth.gen_osm_tables(2000, 400, 60)
    node_ids = set(nodes["id"])
    # ~1% missing refs exist
    missing = sum(any(r >= synth.MISSING_ID_BASE for r in refs) for refs in ways["refs"])
    assert missing >= 1
    # closed and open ways both present
    closed = sum(1 for refs in ways["refs"] if len(refs) > 2 and refs[0] == refs[-1])
    assert 0 < closed < len(ways)
    # all non-missing refs resolve
    for refs in ways["refs"][:50]:
        for r in refs:
            assert r in node_ids or r >= synth.MISSING_ID_BASE
    # zero-way relations and admin_centre members exist
    n_zero_way = sum(1 for ms in rels["members"]
                     if not any(m["type"] == 1 for m in ms))
    assert n_zero_way >= 1
    n_admin = sum(1 for ms in rels["members"]
                  if any(m["type"] == 0 and m["role"] == "admin_centre" for m in ms))
    assert n_admin >= 1
    # entrance nodes exist
    assert (nodes["tags"].apply(lambda t: "entrance" in t)).sum() > 0
    # the 7 reference tag-query shapes are all non-empty over ways+nodes
    all_tags = pd.concat([nodes["tags"], ways["tags"]])
    def count(pred):
        return sum(1 for t in all_tags if pred(t))
    assert count(lambda t: "building" in t) > 0
    assert count(lambda t: "shop" in t) > 0
    assert count(lambda t: "addr:housenumber" in t) > 0
    assert count(lambda t: "addr:housenumber" in t and "addr:street" in t) > 0
    assert count(lambda t: ("highway" in t and "name" in t) or
                           ("waterway" in t and "name" in t)) > 0
    assert count(lambda t: t.get("amenity") == "toilets") > 0
    assert count(lambda t: t.get("amenity") in ("toilets", "kindergarten")) > 0


def test_images_df_distributed_matches_local(spark):
    df = synth.images_df(spark, 64, partitions=4)
    got = df.orderBy("image_id").toPandas()
    want = synth.gen_images_pdf(64)
    assert got["image_id"].tolist() == want["image_id"].tolist()
    assert got["phash"].tolist() == want["phash"].tolist()
    assert got["caption"].tolist() == want["caption"].tolist()
    assert [bytes(b) for b in got["bytes"]] == [bytes(b) for b in want["bytes"]]


def test_osm_df_schemas(spark):
    nodes, ways, rels = synth.osm_tables_df(spark, 300, 60, 12)
    assert nodes.count() == 300
    assert ways.count() == 60
    assert rels.count() == 12
    assert dict(nodes.dtypes)["tags"] == "map<string,string>"
    assert dict(ways.dtypes)["refs"] == "array<bigint>"
    assert "array<struct<type:tinyint,ref:bigint,role:string>>" == dict(rels.dtypes)["members"]
