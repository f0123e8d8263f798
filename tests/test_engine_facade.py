"""Engine facade (the public API a reference user switches to)."""

from pbf2json_spark import Engine
from pbf2json_spark.sources import synth


def test_engine_runs_reference_pipeline(spark):
    eng = Engine(spark)
    nodes, ways, rels = synth.osm_tables_df(spark, 600, 120, 20)
    out = eng.run(nodes, ways, rels, "building")
    rows = out.collect()
    assert rows
    assert set(out.columns) == {"gid", "json"}
    # NDJSON contract: each line parses and is gid-consistent
    import json
    for r in rows[:20]:
        d = json.loads(r.json)
        assert r.gid == f"{d['type']}:{d['id']}"


def test_engine_spatial_surface(spark):
    eng = Engine(spark)
    imgs = synth.images_df(spark, 200, partitions=2)
    geo = eng.attach_geo(imgs, res_list=(9, 12))
    polys = synth.polygons_df(spark, 6)
    assert eng.point_in_polygon(geo, polys).count() >= 0
    q = synth.knn_queries_df(spark, 5, k=3)
    nn = eng.knn(geo, q, k=3)
    assert nn.count() == 15
    assert eng.tile_assignment(imgs).count() > 0
