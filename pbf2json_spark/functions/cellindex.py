"""Hierarchical geo cell index (H3/S2-style), pure numpy.

Neither `h3` nor `s2sphere` is installable in this environment (SURVEY.md
§7), so the engine ships its own deterministic hierarchical cell codec
with the same *roles* the north rule assigns to H3 (res 7-12) and S2
coverings (repo BASELINE.json:6):

- `cell_id(lat, lon, res)` — int64 cell at resolution `res` (0..26).
  The grid at res r is 2^r latitude rows x 2^(r+1) longitude columns of
  equal-degree cells (~squares at the equator; res 7 ~ 1.4deg, res 12 ~
  0.04deg ~ 4.9 km, halving per res).  Ids pack (res, Morton(i, j)) so
  sorting by id gives Z-order spatial locality — the property Iceberg/
  Parquet layouts exploit for partition pruning.
- containment is hierarchical: `parent(cell)` truncates Morton bits,
  and a point's res-r cell is always a descendant of its res-(r-1) cell
  (property-tested).
- `disk(cells, k)` — the (2k+1)^2 neighbourhood with longitude wrap and
  latitude clamping (the H3 k_ring role, used for kNN expansion).
- `cover_bbox` / `cover_polygon` — the S2 covering role: the set of
  res-r cells intersecting a bbox / polygon (superset guarantee for the
  polygon interior; used as the PIP equi-join prefilter).
- `disk_exit_distance_m` — a conservative lower bound on the distance
  from a query point to anything *outside* its k-disk; this is the kNN
  termination guarantee (escalate k until kth-candidate distance is
  below it).

All functions are vectorized numpy over arrays of cells/points; they run
inside Arrow-batched pandas UDFs on the Spark side.  Distances use the
same sphere as geokernels (R = 6378137 m) so guarantees and re-rank
distances are mutually consistent.
"""

from __future__ import annotations

import numpy as np

from .geokernels import EARTH_RADIUS_M

MAX_RES = 26
_RES_SHIFT = np.uint64(54)

__all__ = [
    "cell_id", "decode", "parent", "cell_center", "cell_bounds",
    "disk", "cover_bbox", "cover_polygon", "disk_exit_distance_m",
    "res_of", "MAX_RES",
    "s2_cell_id", "s2_decode", "s2_parent", "S2_MAX_LEVEL",
]


def _part1by1(x):
    """Spread the low 27 bits of x to even bit positions (Morton helper)."""
    x = np.asarray(x, dtype=np.uint64) & np.uint64(0x7FFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _unpart1by1(x):
    x = np.asarray(x, dtype=np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def _encode_ij(i, j, res):
    morton = _part1by1(j) | (_part1by1(i) << np.uint64(1))
    out = (np.uint64(res) << _RES_SHIFT) | morton
    return out.astype(np.uint64).view(np.int64)


def cell_id(lat, lon, res: int):
    """Vectorized (lat, lon) -> int64 cell id at resolution res."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    la = np.asarray(lat, dtype=np.float64)
    lo = np.asarray(lon, dtype=np.float64)
    nlat, nlon = 1 << res, 2 << res
    i = np.clip(np.floor((la + 90.0) / 180.0 * nlat), 0, nlat - 1).astype(np.uint64)
    jf = np.mod((lo + 180.0) / 360.0, 1.0) * nlon
    j = np.clip(np.floor(jf), 0, nlon - 1).astype(np.uint64)
    return _encode_ij(i, j, res)


def res_of(cell):
    return ((np.asarray(cell, dtype=np.int64).view(np.uint64)) >> _RES_SHIFT).astype(np.int64)


def decode(cell):
    """int64 cell -> (res, i, j) int64 arrays."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    res = (c >> _RES_SHIFT).astype(np.int64)
    morton = c & ((np.uint64(1) << _RES_SHIFT) - np.uint64(1))
    j = _unpart1by1(morton).astype(np.int64)
    i = _unpart1by1(morton >> np.uint64(1)).astype(np.int64)
    return res, i, j


def parent(cell, parent_res: int):
    """Ancestor cell at a coarser resolution (containment-hierarchical)."""
    res, i, j = decode(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = (res - parent_res).astype(np.uint64)
    return _encode_ij(i.astype(np.uint64) >> shift,
                      j.astype(np.uint64) >> shift, parent_res)


def cell_bounds(cell):
    """(lat_lo, lat_hi, lon_lo, lon_hi) of each cell."""
    res, i, j = decode(cell)
    nlat = (np.int64(1) << res).astype(np.float64)
    nlon = (np.int64(2) << res).astype(np.float64)
    lat_lo = i / nlat * 180.0 - 90.0
    lat_hi = (i + 1) / nlat * 180.0 - 90.0
    lon_lo = j / nlon * 360.0 - 180.0
    lon_hi = (j + 1) / nlon * 360.0 - 180.0
    return lat_lo, lat_hi, lon_lo, lon_hi


def cell_center(cell):
    lat_lo, lat_hi, lon_lo, lon_hi = cell_bounds(cell)
    return (lat_lo + lat_hi) / 2.0, (lon_lo + lon_hi) / 2.0


def disk(cells, k: int):
    """(n,) cells -> (n, m<= (2k+1)^2) matrix of the k-disk neighbourhood
    ids, -1 padded where latitude clamping removed rows.  Longitude wraps;
    latitude rows outside [0, nlat) are dropped (there is nothing past the
    poles)."""
    c = np.atleast_1d(np.asarray(cells, dtype=np.int64))
    res, i, j = decode(c)
    r = int(res[0]) if c.size else 0
    if c.size and not np.all(res == r):
        raise ValueError("disk() requires uniform resolution")
    nlat, nlon = 1 << r, 2 << r
    di, dj = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    di, dj = di.reshape(-1), dj.reshape(-1)
    ii = i[:, None] + di[None, :]                       # (n, m)
    jj = np.mod(j[:, None] + dj[None, :], nlon)
    valid = (ii >= 0) & (ii < nlat)
    if 2 * k + 1 >= nlon:  # tiny grids: the disk wraps onto itself
        # dedupe per row by re-encoding and masking duplicates
        ids = _encode_ij(np.clip(ii, 0, nlat - 1).astype(np.uint64),
                         jj.astype(np.uint64), r)
        out = np.where(valid, ids, -1)
        for row in range(out.shape[0]):
            _, first = np.unique(out[row], return_index=True)
            mask = np.zeros(out.shape[1], dtype=bool)
            mask[first] = True
            out[row, ~mask] = -1
        return out
    ids = _encode_ij(np.where(valid, ii, 0).astype(np.uint64), jj.astype(np.uint64), r)
    return np.where(valid, ids, -1)


def cover_bbox(lat_min, lat_max, lon_min, lon_max, res: int):
    """All res-r cells intersecting the bbox (inclusive).  Handles the
    antimeridian when lon_min > lon_max.  Returns a 1-D int64 array."""
    nlat, nlon = 1 << res, 2 << res
    i_lo = int(np.clip(np.floor((lat_min + 90.0) / 180.0 * nlat), 0, nlat - 1))
    i_hi = int(np.clip(np.floor((lat_max + 90.0) / 180.0 * nlat), 0, nlat - 1))
    j_lo = int(np.clip(np.floor(np.mod((lon_min + 180.0) / 360.0, 1.0) * nlon), 0, nlon - 1))
    j_hi = int(np.clip(np.floor(np.mod((lon_max + 180.0) / 360.0, 1.0) * nlon), 0, nlon - 1))
    ii = np.arange(i_lo, i_hi + 1, dtype=np.int64)
    if lon_min <= lon_max:
        jj = np.arange(j_lo, j_hi + 1, dtype=np.int64)
    else:  # crosses the antimeridian
        jj = np.concatenate([np.arange(j_lo, nlon, dtype=np.int64),
                             np.arange(0, j_hi + 1, dtype=np.int64)])
    I, J = np.meshgrid(ii, jj, indexing="ij")
    return _encode_ij(I.reshape(-1).astype(np.uint64),
                      J.reshape(-1).astype(np.uint64), res)


def _seg_box_intersect(x1, y1, x2, y2, bx_lo, by_lo, bx_hi, by_hi):
    """Vectorized segment-vs-axis-aligned-box overlap test.
    Segments (s,) vs boxes (c,) -> (c, s) bool (separating-axis)."""
    sx_lo = np.minimum(x1, x2)[None, :]
    sx_hi = np.maximum(x1, x2)[None, :]
    sy_lo = np.minimum(y1, y2)[None, :]
    sy_hi = np.maximum(y1, y2)[None, :]
    bb_x_lo, bb_y_lo = bx_lo[:, None], by_lo[:, None]
    bb_x_hi, bb_y_hi = bx_hi[:, None], by_hi[:, None]
    no_overlap = (sx_hi < bb_x_lo) | (sx_lo > bb_x_hi) | (sy_hi < bb_y_lo) | (sy_lo > bb_y_hi)
    # line side test: all 4 box corners strictly on one side of the line
    dx = (x2 - x1)[None, :]
    dy = (y2 - y1)[None, :]
    def side(cx, cy):
        return dx * (cy - y1[None, :]) - dy * (cx - x1[None, :])
    s1 = side(bb_x_lo, bb_y_lo)
    s2 = side(bb_x_lo, bb_y_hi)
    s3 = side(bb_x_hi, bb_y_lo)
    s4 = side(bb_x_hi, bb_y_hi)
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    return ~no_overlap & ~(all_pos | all_neg)


def cover_polygon(ring_lats, ring_lons, res: int):
    """Exact covering of a polygon at res: every cell that intersects the
    polygon's boundary or interior.  Superset guarantee for PIP: any point
    inside the polygon lies in one of the returned cells (its cell either
    intersects an edge or has its whole box inside -> center inside).
    """
    from .geokernels import raycast_contains
    rla = np.asarray(ring_lats, dtype=np.float64)
    rlo = np.asarray(ring_lons, dtype=np.float64)
    cand = cover_bbox(rla.min(), rla.max(), rlo.min(), rlo.max(), res)
    lat_lo, lat_hi, lon_lo, lon_hi = cell_bounds(cand)
    # edge crossing test (x=lon, y=lat)
    x1, y1 = rlo[:-1], rla[:-1]
    x2, y2 = rlo[1:], rla[1:]
    if rla[0] != rla[-1] or rlo[0] != rlo[-1]:  # implied closing edge
        x1 = np.concatenate([x1, rlo[-1:]]); y1 = np.concatenate([y1, rla[-1:]])
        x2 = np.concatenate([x2, rlo[:1]]); y2 = np.concatenate([y2, rla[:1]])
    crosses = _seg_box_intersect(x1, y1, x2, y2, lon_lo, lat_lo, lon_hi, lat_hi).any(axis=1)
    clat, clon = cell_center(cand)
    inside = raycast_contains(rla, rlo, clat, clon)
    return cand[crosses | inside]


def disk_exit_distance_m(lat, lon, res: int, k: int):
    """Conservative lower bound (meters, sphere R=6378137) on the distance
    from each point to any point OUTSIDE its k-disk at `res`.

    Latitude sides: exact meridian arc R*dphi; clamped sides (disk touches
    a pole) contribute +inf (nothing exists beyond).  Longitude sides:
    distance to the side's full great circle R*asin(cos(phi)*|sin(dlam)|),
    a lower bound; if the disk wraps all longitudes -> +inf."""
    la = np.asarray(lat, dtype=np.float64)
    lo = np.asarray(lon, dtype=np.float64)
    nlat, nlon = 1 << res, 2 << res
    i = np.clip(np.floor((la + 90.0) / 180.0 * nlat), 0, nlat - 1)
    j = np.clip(np.floor(np.mod((lo + 180.0) / 360.0, 1.0) * nlon), 0, nlon - 1)
    dlat_deg, dlon_deg = 180.0 / nlat, 360.0 / nlon

    lat_lo = (i - k) * dlat_deg - 90.0
    lat_hi = (i + k + 1) * dlat_deg - 90.0
    d_south = np.where(lat_lo <= -90.0, np.inf, np.radians(la - lat_lo) * EARTH_RADIUS_M)
    d_north = np.where(lat_hi >= 90.0, np.inf, np.radians(lat_hi - la) * EARTH_RADIUS_M)

    if 2 * k + 1 >= nlon:
        d_west = d_east = np.full_like(la, np.inf)
    else:
        lon_w = (j - k) * dlon_deg - 180.0          # west edge meridian
        lon_e = (j + k + 1) * dlon_deg - 180.0      # east edge meridian
        cosphi = np.cos(np.radians(la))
        def to_meridian(mer):
            dl = np.radians(np.mod(lo - mer, 360.0))
            return EARTH_RADIUS_M * np.arcsin(np.clip(cosphi * np.abs(np.sin(dl)), 0.0, 1.0))
        d_west, d_east = to_meridian(lon_w), to_meridian(lon_e)

    return np.minimum(np.minimum(d_south, d_north), np.minimum(d_west, d_east))


# ---------------------------------------------------------------------------
# quad-sphere ("S2-style") cell family
# ---------------------------------------------------------------------------
# The equirectangular Morton grid above is the H3-role index (fast,
# hierarchy-friendly, but cells shrink toward the poles).  This second
# family projects onto the 6 faces of a cube (S2's construction, with
# the tangent uv->st transform) so cell GROUND AREA stays within ~2.5x
# everywhere on the sphere — the property that matters when a cell id
# doubles as a storage partition key at 10^12 rows.  Layout:
#   id = face(3 bits) << 59 | level(5 bits) << 54 | morton(i, j)
# distinct from the equirect ids only by convention (the two families
# live in separate columns; nothing mixes them).

S2_MAX_LEVEL = 26
_S2_FACE_SHIFT = np.uint64(59)
_S2_LEVEL_SHIFT = np.uint64(54)


def _latlon_to_xyz(lat, lon):
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def s2_cell_id(lat, lon, level: int):
    """Vectorized (lat, lon) -> quad-sphere cell id at `level`
    (2^level x 2^level cells per cube face)."""
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be in [0, {S2_MAX_LEVEL}]")
    x, y, z = _latlon_to_xyz(lat, lon)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # dominant axis picks the face: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 1),
        np.where(ay >= az, np.where(y >= 0, 2, 3),
                 np.where(z >= 0, 4, 5))).astype(np.uint64)
    dom = np.choose(face.astype(np.int64),
                    [x, -x, y, -y, z, -z])
    # (u, v) = the two non-dominant coords over the dominant one
    u = np.choose(face.astype(np.int64), [y, -y, -x, x, y, -y]) / dom
    v = np.choose(face.astype(np.int64), [z, z, z, z, -x, x]) / dom
    # S2's quadratic st transform: near-uniform ground area per cell
    def _st(p):
        # max(.., 0) keeps the not-taken where-branch out of sqrt's
        # domain (|p| <= 1 on the taken branch by construction)
        return np.where(p >= 0,
                        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * p, 0.0)),
                        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * p, 0.0)))
    n = np.uint64(1) << np.uint64(level)
    i = np.clip(np.floor(_st(u) * np.float64(n)), 0, np.float64(n) - 1) \
        .astype(np.uint64)
    j = np.clip(np.floor(_st(v) * np.float64(n)), 0, np.float64(n) - 1) \
        .astype(np.uint64)
    morton = _part1by1(j) | (_part1by1(i) << np.uint64(1))
    out = ((face << _S2_FACE_SHIFT)
           | (np.uint64(level) << _S2_LEVEL_SHIFT) | morton)
    return out.astype(np.uint64).view(np.int64)


def s2_decode(cell):
    """int64 quad-sphere cell -> (face, level, i, j) int64 arrays."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    face = (c >> _S2_FACE_SHIFT).astype(np.int64)
    level = ((c >> _S2_LEVEL_SHIFT) & np.uint64(0x1F)).astype(np.int64)
    morton = c & ((np.uint64(1) << _S2_LEVEL_SHIFT) - np.uint64(1))
    j = _unpart1by1(morton).astype(np.int64)
    i = _unpart1by1(morton >> np.uint64(1)).astype(np.int64)
    return face, level, i, j


def s2_parent(cell, parent_level: int):
    """Ancestor quad-sphere cell (containment-hierarchical: i, j shift)."""
    face, level, i, j = s2_decode(cell)
    if np.any(level < parent_level):
        raise ValueError("parent_level must be <= cell level")
    sh = (level - parent_level).astype(np.uint64)
    iu = i.astype(np.uint64) >> sh
    ju = j.astype(np.uint64) >> sh
    morton = _part1by1(ju) | (_part1by1(iu) << np.uint64(1))
    out = ((np.asarray(face, dtype=np.uint64) << _S2_FACE_SHIFT)
           | (np.uint64(parent_level) << _S2_LEVEL_SHIFT) | morton)
    return out.astype(np.uint64).view(np.int64)
