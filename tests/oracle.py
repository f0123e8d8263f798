"""Pure-Python/pandas oracle implementing the reference's semantics
(/root/reference/pbf2json.go) directly — single-threaded control flow,
mirroring the Go program's passes, used to check the distributed engine
row-for-row (FIXTURES.md §2)."""

from __future__ import annotations

import numpy as np

from pbf2json_spark.functions import geokernels as gk
from pbf2json_spark.functions.tagpredicate import match_tags_py


def _trim(tags):
    return {k.strip(): v.strip() for k, v in tags.items()}


def _store_node(lat, lon, tags):
    """The LevelDB record (pbf2json.go:525-549): truncated coords + flag
    codes; ent == -1 means no flag byte."""
    # truncate + %.7f round-trip: every cache read decodes to 7-decimal
    # strings that downstream math parses back (cache.go:46,
    # pbf2json.go:702-703)
    tla = float(gk.roundtrip7(gk.truncate_coords(np.array([lat])))[0])
    tlo = float(gk.roundtrip7(gk.truncate_coords(np.array([lon])))[0])
    ent = gk.entrance_class(tags.get("entrance"))
    if ent == 0:
        return (tla, tlo, -1, -1)
    whl = gk.wheelchair_class(tags.get("wheelchair"))
    return (tla, tlo, ent, whl)


def _way_cb(latlons):
    """computeCentroidAndBounds on store records; returns (centroid map,
    (n,s,e,w) floats)."""
    la = np.array([p[0] for p in latlons])
    lo = np.array([p[1] for p in latlons])
    ent = np.array([p[2] for p in latlons])
    whl = np.array([p[3] for p in latlons])
    clat, clon, ctype, n, s, e, w = gk.centroid_and_bounds(la, lo, ent, whl)
    cen = {"lat": gk.fmt7(clat), "lon": gk.fmt7(clon)}
    if ctype:
        cen["type"] = ctype
    return cen, (n, s, e, w)


def _bbox_map(nsew):
    n, s, e, w = nsew
    return {"n": gk.fmt7(n), "s": gk.fmt7(s), "e": gk.fmt7(e), "w": gk.fmt7(w)}


def oracle_pipeline(nodes_pdf, ways_pdf, rels_pdf, tag_spec,
                    waynodes=False) -> dict:
    """gid -> record dict, exactly the reference's output contract."""
    out = {}

    store = {}
    for r in nodes_pdf.itertuples():
        store[int(r.id)] = _store_node(r.lat, r.lon, r.tags)
        if r.tags and match_tags_py(r.tags, tag_spec):
            out[f"node:{r.id}"] = {
                "id": int(r.id), "type": "node",
                "lat": float(r.lat), "lon": float(r.lon),
                "tags": _trim(r.tags),
            }

    way_latlons = {}  # way id -> list of store records, or None if failed
    for r in ways_pdf.itertuples():
        latlons = []
        failed = False
        for ref in r.refs:
            rec = store.get(int(ref))
            if rec is None:
                failed = True
                break
            latlons.append(rec)
        way_latlons[int(r.id)] = None if failed else latlons
        if r.tags and match_tags_py(r.tags, tag_spec) and not failed:
            cen, nsew = _way_cb(latlons)
            rec = {
                "id": int(r.id), "type": "way", "tags": _trim(r.tags),
                "centroid": cen, "bounds": _bbox_map(nsew),
            }
            if waynodes:
                rec["nodes"] = [
                    ({"lat": gk.fmt7(p[0]), "lon": gk.fmt7(p[1])}
                     if p[2] < 0 else
                     {"lat": gk.fmt7(p[0]), "lon": gk.fmt7(p[1]),
                      "entrance": str(p[2]), "wheelchair": str(p[3])})
                    for p in latlons
                ]
            out[f"way:{r.id}"] = rec

    for r in rels_pdf.itertuples():
        if not r.tags or not match_tags_py(r.tags, tag_spec):
            continue
        if not any(m["type"] == 1 for m in r.members):
            continue  # P9
        member_latlons = []
        for m in r.members:  # J2 with truncate-on-first-miss
            if m["type"] != 1:
                continue
            ll = way_latlons.get(int(m["ref"]))
            if ll is None:
                break
            member_latlons.append(ll)
        if not member_latlons:
            continue
        largest = 0.0
        centroid, bounds = None, None
        for ll in member_latlons:  # A5 argmax (strictly greater keeps first)
            cen, nsew = _way_cb(ll)
            area = float(gk.ref_bbox_area(*nsew))
            if area > largest:
                largest, centroid, bounds = area, cen, nsew
        if bounds is None:
            continue
        if r.tags.get("boundary") == "administrative":  # J3
            for m in r.members:
                if m["type"] == 0 and m["role"] == "admin_centre":
                    rec = store.get(int(m["ref"]))
                    if rec is not None:
                        centroid = {"lat": gk.fmt7(rec[0]),
                                    "lon": gk.fmt7(rec[1]),
                                    "type": "admin_centre"}
                        if rec[2] >= 0:
                            centroid["entrance"] = str(rec[2])
                            centroid["wheelchair"] = str(rec[3])
                        break
        out[f"relation:{r.id}"] = {
            "id": int(r.id), "type": "relation", "tags": _trim(r.tags),
            "centroid": centroid, "bounds": _bbox_map(bounds),
        }
    return out
