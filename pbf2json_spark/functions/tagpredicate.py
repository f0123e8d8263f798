"""Tag-predicate (DNF) compiler: the reference's CLI grammar -> Catalyst.

Grammar (from /root/reference/pbf2json.go:52-55 and the matcher at
:607-637): a comma-separated OR-list of AND-groups; each AND term is a
tag key that must be present, optionally ``key~value`` requiring
equality.  Multiple '~' split like Go's strings.Split: only the second
segment is the value (``a~b~c`` means key 'a' must equal 'b').

The compiled form is a single Column expression evaluated inside the
scan stage's whole-stage codegen (the reference's pass-1 "bitmask the
matching elements" trick as a filter — SURVEY.md §4).  Parquet cannot
push MAP-key lookups into row-group statistics, so for 100 TB tables
use ``compile_tag_predicate_flat`` over promoted top-level tag columns
(the standard OSM-at-scale layout: hot keys like building/amenity
stored as nullable string columns) — that form lands in PushedFilters
and skips row groups at the scan.  Matching is evaluated on *raw*
(un-trimmed) tags, as in the reference (trimTags runs at emit time
only, pbf2json.go:238,285,371).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def compile_tag_predicate(spec: str, tags_col: str = "tags") -> Column:
    """'building,amenity~toilets+name' -> Column over a map column."""
    if not spec:
        raise ValueError("empty tag spec: you must specify tags to match against")
    tags = F.col(tags_col)
    group_exprs = []
    for group in spec.split(","):
        conds = []
        for term in group.split("+"):
            parts = term.split("~")
            key = parts[0]
            cond = F.map_contains_key(tags, F.lit(key))
            if len(parts) > 1:
                cond = cond & (F.element_at(tags, F.lit(key)) == F.lit(parts[1]))
            conds.append(cond)
        group_exprs.append(reduce(lambda a, b: a & b, conds))
    return reduce(lambda a, b: a | b, group_exprs)


def compile_tag_predicate_flat(spec: str, columns: dict[str, str]) -> Column:
    """The same DNF grammar over PROMOTED tag columns: `columns` maps
    tag key -> top-level column name (null = tag absent).  Because the
    result references plain columns, Catalyst pushes it into the
    parquet scan (PushedFilters), which map lookups can never achieve.
    Keys without a promoted column raise — silent fallback would
    silently change scan cost by 100x at scale."""
    if not spec:
        raise ValueError("empty tag spec: you must specify tags to match against")
    group_exprs = []
    for group in spec.split(","):
        conds = []
        for term in group.split("+"):
            parts = term.split("~")
            key = parts[0]
            if key not in columns:
                raise KeyError(
                    f"tag key {key!r} has no promoted column; promote it "
                    f"or use compile_tag_predicate on the map column")
            col = F.col(columns[key])
            cond = col.isNotNull()
            if len(parts) > 1:
                cond = cond & (col == F.lit(parts[1]))
            conds.append(cond)
        group_exprs.append(reduce(lambda a, b: a & b, conds))
    return reduce(lambda a, b: a | b, group_exprs)


def has_tags(tags_col: str = "tags") -> Column:
    """Reference hasTags (pbf2json.go:649-655): non-empty tag map."""
    return F.size(F.col(tags_col)) > 0


def trimmed_tags(tags_col: str = "tags") -> Column:
    """Reference trimTags (pbf2json.go:640-646): trim whitespace from all
    keys and values (emit-time projection).  Requires the session config
    spark.sql.mapKeyDedupPolicy=LAST_WIN if trimming can collide keys —
    Go's map overwrite is order-nondeterministic there anyway."""
    c = F.col(tags_col)
    return F.transform_values(
        F.transform_keys(c, lambda k, _v: F.trim(k)),
        lambda _k, v: F.trim(v),
    )


def match_tags_py(tags: dict, spec: str) -> bool:
    """Pure-Python twin of compile_tag_predicate for the pandas oracle."""
    for group in spec.split(","):
        ok = True
        for term in group.split("+"):
            parts = term.split("~")
            if parts[0] not in tags:
                ok = False
                break
            if len(parts) > 1 and tags[parts[0]] != parts[1]:
                ok = False
                break
        if ok:
            return True
    return False
