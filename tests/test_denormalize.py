"""End-to-end parity: the distributed pipeline vs the pure-Python oracle
over the deterministic OSM-analog tables, for all 7 reference tag-query
shapes (/root/reference/test/end-to-end.js:53-61)."""

import json

import pytest

from pbf2json_spark.operators import denormalize as dn
from pbf2json_spark.sources import synth
from tests.oracle import oracle_pipeline

SPECS = [
    "building",
    "building,shop",
    "addr:housenumber",
    "addr:housenumber+addr:street",
    "highway+name,waterway+name",
    "amenity~toilets",
    "amenity~toilets,amenity~kindergarten",
]

N_NODES, N_WAYS, N_RELS = 3000, 600, 80


@pytest.fixture(scope="module")
def tables(spark):
    pdfs = synth.gen_osm_tables(N_NODES, N_WAYS, N_RELS)
    dfs = synth.osm_tables_df(spark, N_NODES, N_WAYS, N_RELS)
    return pdfs, dfs


def run_engine(spark, dfs, spec, waynodes=False):
    nodes, ways, rels = dfs
    df = dn.run_pipeline(nodes, ways, rels, spec, waynodes=waynodes)
    rows = df.collect()
    got = {}
    for r in rows:
        assert r.gid not in got, f"duplicate gid {r.gid}"
        got[r.gid] = json.loads(r.json)
    return got


@pytest.mark.parametrize("spec", SPECS)
def test_pipeline_matches_oracle(spark, tables, spec):
    pdfs, dfs = tables
    want = oracle_pipeline(*pdfs, spec)
    got = run_engine(spark, dfs, spec)
    assert set(got) == set(want), (
        f"gid sets differ: extra={sorted(set(got)-set(want))[:5]} "
        f"missing={sorted(set(want)-set(got))[:5]}")
    for gid, w in want.items():
        g = got[gid]
        assert g == w, f"{gid}:\n got={g}\nwant={w}"
    # sanity: every entity type is exercised at least once somewhere
    types = {g.split(":")[0] for g in got}
    if spec == "building":
        assert types == {"node", "way", "relation"}


def test_waynodes_projection(spark, tables):
    pdfs, dfs = tables
    want = oracle_pipeline(*pdfs, "building", waynodes=True)
    got = run_engine(spark, dfs, "building", waynodes=True)
    checked = 0
    for gid, w in want.items():
        if w["type"] != "way":
            continue
        assert got[gid]["nodes"] == w["nodes"], gid
        checked += 1
    assert checked > 0


def test_dropped_entities(spark, tables):
    """Negative coverage: missing-node ways dropped, zero-way relations
    dropped, relation-type members ignored."""
    pdfs, dfs = tables
    nodes_pdf, ways_pdf, rels_pdf = pdfs
    got = run_engine(spark, dfs, "building")
    node_ids = set(nodes_pdf["id"])
    # at least one tag-matched way has a missing ref and must be absent
    broken = [r.id for r in ways_pdf.itertuples()
              if "building" in r.tags
              and any(ref not in node_ids for ref in r.refs)]
    assert broken, "fixture should contain broken building ways"
    for wid in broken:
        assert f"way:{wid}" not in got
    zero_way = [r.id for r in rels_pdf.itertuples()
                if "building" in r.tags
                and not any(m["type"] == 1 for m in r.members)]
    for rid in zero_way:
        assert f"relation:{rid}" not in got
