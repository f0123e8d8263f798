"""Pin output SHAPE/PRECISION conventions against the reference's real
golden fixtures (/root/reference/test/fixtures/*.json — produced by a
real pbf2json run in end-to-end.js; the 40 MB PBF input itself is not
available offline, so row-for-row replay is impossible, but the
conventions those files encode are directly checkable):

- gid == type + ':' + id  (end-to-end.js:28)
- node records: raw float lat/lon (NOT 7-decimal quantized), keys
  {id, type, lat, lon, tags}
- way/relation records: centroid lat/lon as strings with EXACTLY 7
  decimals; optional centroid 'type' from a closed set; bounds keys
  exactly {n, s, e, w}, same precision; 'type' key omitted (never
  null/empty) when there is no special centroid kind

The same assertions then run against THIS engine's run_pipeline JSON
output over the synthetic corpus — every convention the reference's
goldens exhibit must hold for our records too."""

import glob
import json
import re

import pytest

from pbf2json_spark.operators.denormalize import run_pipeline
from pbf2json_spark.sources.synth import osm_tables_df

FIXTURE_GLOB = "/root/reference/test/fixtures/*.json"
P7 = re.compile(r"^-?\d+\.\d{7}$")
CENTROID_KEYS = {"lat", "lon", "type", "entrance", "wheelchair"}
CTYPES = {"entrance", "admin_centre"}  # pbf2json.go:367, centroid type tags


def _check_record(rec, source):
    assert rec["gid"] == f"{rec['type']}:{rec['id']}", (source, rec["gid"])
    if rec["type"] == "node":
        assert isinstance(rec["lat"], float), (source, rec)
        assert isinstance(rec["lon"], float), (source, rec)
        assert "centroid" not in rec and "bounds" not in rec
    else:
        c = rec["centroid"]
        assert P7.match(c["lat"]) and P7.match(c["lon"]), (source, c)
        assert set(c) <= CENTROID_KEYS, (source, set(c))
        if "type" in c:
            assert c["type"] in CTYPES, (source, c["type"])
        b = rec["bounds"]
        assert set(b) == {"n", "s", "e", "w"}, (source, set(b))
        assert all(P7.match(v) for v in b.values()), (source, b)
    assert isinstance(rec["tags"], dict)
    for k, v in rec["tags"].items():
        assert v is not None, (source, k)


@pytest.mark.parametrize("path", sorted(glob.glob(FIXTURE_GLOB)))
def test_reference_fixture_conventions(path):
    """The reference's own goldens satisfy the conventions we pin."""
    data = json.load(open(path))
    assert data, path
    for gid, rec in data.items():
        assert gid == rec["gid"]
        _check_record(rec, path)


def test_engine_output_matches_fixture_conventions(spark):
    """Our pipeline's JSON rows obey the identical shape conventions."""
    nodes, ways, rels = osm_tables_df(spark, 800, 160, 40)
    rows = run_pipeline(nodes, ways, rels, "building,shop").collect()
    assert rows
    seen_types = set()
    for r in rows:
        rec = json.loads(r.json)
        rec["gid"] = r.gid  # the sink key, like end-to-end.js:28
        _check_record(rec, "engine")
        seen_types.add(rec["type"])
    assert seen_types == {"node", "way", "relation"}
