"""Property tests for the hierarchical cell index (SURVEY.md §7: no
library oracle exists locally, so correctness is established by
invariants: containment monotonic in res, disk symmetry, covering
superset, exit-distance guarantee)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pbf2json_spark.functions import cellindex as cx
from pbf2json_spark.functions import geokernels as gk

lat_s = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)


@given(lat_s, lon_s, st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_roundtrip_center_same_cell(lat, lon, res):
    c = cx.cell_id(np.array([lat]), np.array([lon]), res)
    clat, clon = cx.cell_center(c)
    c2 = cx.cell_id(clat, clon, res)
    assert c[0] == c2[0]


@given(lat_s, lon_s, st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_containment_monotonic_in_res(lat, lon, res):
    # the res-r cell's ancestor at res r-1 == the point's res r-1 cell
    fine = cx.cell_id(np.array([lat]), np.array([lon]), res)
    coarse = cx.cell_id(np.array([lat]), np.array([lon]), res - 1)
    assert cx.parent(fine, res - 1)[0] == coarse[0]


@given(lat_s, lon_s, st.integers(min_value=3, max_value=12))
@settings(max_examples=100, deadline=None)
def test_point_inside_own_cell_bounds(lat, lon, res):
    c = cx.cell_id(np.array([lat]), np.array([lon]), res)
    lat_lo, lat_hi, lon_lo, lon_hi = cx.cell_bounds(c)
    # 1e-9 deg tolerance: quantization at exact cell boundaries can land
    # either side within one ulp of (lat+90)/180*nlat; the codec is
    # self-consistent (see roundtrip test), only this check needs slack
    assert lat_lo[0] - 1e-9 <= lat <= lat_hi[0] + 1e-9
    assert lon_lo[0] - 1e-9 <= lon <= lon_hi[0] + 1e-9


@given(lat_s, lon_s, st.integers(min_value=4, max_value=10),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=100, deadline=None)
def test_disk_symmetry(lat, lon, res, k):
    """b in disk(a, k) <=> a in disk(b, k) (away from poles/clamps this
    must hold exactly; clamped rows only *remove* cells symmetrically)."""
    a = cx.cell_id(np.array([lat]), np.array([lon]), res)
    ring = cx.disk(a, k)[0]
    ring = ring[ring >= 0]
    assert a[0] in ring  # self-inclusion
    for b in ring[:10]:
        back = cx.disk(np.array([b]), k)[0]
        assert a[0] in back[back >= 0]


@given(lat_s, lon_s, st.integers(min_value=4, max_value=10))
@settings(max_examples=100, deadline=None)
def test_disk_exit_distance_is_lower_bound(lat, lon, res):
    """Every point sampled OUTSIDE the k-disk is at least exit_distance
    away (the kNN termination guarantee)."""
    k = 2
    q = cx.cell_id(np.array([lat]), np.array([lon]), res)
    ring = set(cx.disk(q, k)[0].tolist()) - {-1}
    bound = float(cx.disk_exit_distance_m(np.array([lat]), np.array([lon]), res, k)[0])
    rng = np.random.Generator(np.random.Philox(key=np.uint64(abs(hash((lat, lon, res))) % 2**63)))
    pl = rng.uniform(-89.99, 89.99, 300)
    po = rng.uniform(-180, 180, 300)
    cells = cx.cell_id(pl, po, res)
    outside = ~np.isin(cells, list(ring))
    if outside.any():
        d = gk.haversine_m(lat, lon, pl[outside], po[outside])
        assert np.all(d >= bound - 1e-6)


def test_cover_bbox_antimeridian():
    cells = cx.cover_bbox(-5.0, 5.0, 170.0, -170.0, 5)
    lat_lo, lat_hi, lon_lo, lon_hi = cx.cell_bounds(cells)
    # each covering cell must intersect the wrapped range [170, 180) U [-180, -170]
    assert np.all((lon_hi > 170.0) | (lon_lo < -170.0))
    assert np.all((lat_hi > -5.0) & (lat_lo < 5.0))
    assert len(cells) > 0
    assert len(np.unique(cells)) == len(cells)


@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=5, max_value=9))
@settings(max_examples=60, deadline=None)
def test_cover_polygon_superset_guarantee(seed, res):
    """Any point inside the polygon must fall in a covering cell."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    clat = rng.uniform(-50, 50)
    clon = rng.uniform(-150, 150)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
    rad = rng.uniform(0.2, 3.0, 8)
    rla = clat + rad * np.sin(ang)
    rlo = clon + rad * np.cos(ang)
    rla = np.append(rla, rla[0]); rlo = np.append(rlo, rlo[0])
    cover = set(cx.cover_polygon(rla, rlo, res).tolist())
    pl = rng.uniform(rla.min(), rla.max(), 200)
    po = rng.uniform(rlo.min(), rlo.max(), 200)
    inside = gk.raycast_contains(rla, rlo, pl, po)
    cells = cx.cell_id(pl, po, res)
    for c, ins in zip(cells.tolist(), inside.tolist()):
        if ins:
            assert c in cover


def test_zorder_locality():
    """Morton ids: nearby points at the same res sort near each other."""
    lats = np.array([40.0, 40.0001, 40.0002, -33.0])
    lons = np.array([-74.0, -74.0001, -74.0002, 151.0])
    c = cx.cell_id(lats, lons, 12)
    assert abs(int(c[0]) - int(c[1])) < abs(int(c[0]) - int(c[3]))
