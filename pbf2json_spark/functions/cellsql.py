"""JVM-side (Catalyst expression) twin of cellindex.cell_id.

The kNN point-side key build runs over the whole corpus; doing it as a
pandas UDF made the first join's scan a Python stage (Arrow crossing +
worker pool) for what is just float math + bit interleaving.  This
module builds the IDENTICAL int64 cell id as a pure Spark column
expression — whole-stage-codegen-able, no Python anywhere — with the
exact same float semantics (same op order, pmod == np.mod for the
floored longitude wrap), property-tested against the numpy codec in
tests/test_cellindex.py.

The Morton bit-spread is a BYTE-WISE LOOKUP against a 256-entry
array literal rather than the 5-step mask-shift cascade: each cascade
step references its input twice, so the expression TREE doubles per
step (2^5 copies of the upstream float math) and multi-level variants
blew straight through janino's 64 KB generated-method limit, knocking
the whole stage back to interpreted mode.  Four element_at lookups
keep the tree linear and codegen tiny.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .cellindex import MAX_RES, _part1by1

# spread table for one byte: _SPREAD[b] has b's bits at even positions
_SPREAD = [int(v) for v in _part1by1(np.arange(256)).tolist()]
_TAB_CACHE: list = []


def _tab() -> Column:
    """The lookup table as ONE shared Column literal.  Constructing an
    array literal costs a py4j conversion per element; building it per
    lookup (8 per cell id x levels) measured ~4 s of pure driver-side
    expression construction.  Column objects are immutable expression
    trees, so one instance is safely shared by every call."""
    if not _TAB_CACHE:
        # explicit bigint elements: an inferred array<int> would make
        # the downstream shiftleft a 32-bit Java shift (mod-32 wrap)
        _TAB_CACHE.append(F.lit(_SPREAD).cast("array<bigint>"))
    return _TAB_CACHE[0]


def _part1by1_col(x: Column) -> Column:
    """Spread the low 27 bits of a long column to even bit positions
    via 4 byte lookups (== cellindex._part1by1)."""
    tab = _tab()

    def lk(shift: int) -> Column:
        b = F.shiftright(x, shift).bitwiseAND(F.lit(255))
        return F.element_at(tab, (b + 1).cast("int"))

    out = lk(0)
    for byte in (1, 2, 3):
        out = out.bitwiseOR(F.shiftleft(lk(8 * byte), 16 * byte))
    return out


def cell_id_col(lat: Column, lon: Column, res: int) -> Column:
    """(lat, lon) columns -> int64 equirect-Morton cell id at `res`,
    bit-identical to cellindex.cell_id (same float op order; pmod is
    np.mod's floored modulo, exact for the shared fmod+adjust path)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    nlat, nlon = 1 << res, 2 << res
    i = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(nlat))),
                   F.lit(0)),
        F.lit(nlat - 1)).cast("long")
    j = F.least(
        F.greatest(F.floor(F.pmod((lon + F.lit(180.0)) / F.lit(360.0),
                                  F.lit(1.0)) * F.lit(float(nlon))),
                   F.lit(0)),
        F.lit(nlon - 1)).cast("long")
    morton = _part1by1_col(j).bitwiseOR(F.shiftleft(_part1by1_col(i), 1))
    return F.shiftleft(F.lit(res).cast("long"), 54).bitwiseOR(morton)
