"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator (pbf2json_spark) over
the driver's parquet tables at ``sf_dir``; ``oracle_sql()`` carries the
equivalent DuckDB SQL — EVERY query has one (25/25).  Two oracles need
machinery beyond plain SQL over the driver tables: q_ann_lsh_topk
inlines its hyperplanes as generated literals, and q_tile_assignment
aggregates a committed Spark-free twin fixture because per-pixel image
decode is not SQL-expressible (see _tile_oracle_fixture below); pytest
additionally pins the non-SQL pieces against pure-Python/numpy twins.

Mapping to SURVEY.md §2: P1-P3 (tag DNF) -> q_tag_filter_dnf; J1/A1
(denormalize+collect) -> q_order_denorm; A5 (argmax) -> q_argmax_pick;
A1 (bbox) -> q_bounds_agg; A4 (priority pick) -> q_priority_pick; J4
(semi joins) -> q_semi_join_closure; J5 (PIP/kNN) -> q_pip_rect /
q_knn_geo; plus the training-data operators (dedup / text / similarity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEX60 = float(1 << 60)

# deterministic point derivation shared by the Spark ops and the SQL
# oracles: u = first-15-hex-digits-of-md5 / 2^60  (exact in both engines)
_LAT_SQL = "(-60.0 + 150.0 * (('0x' || substr(md5(c_custkey::VARCHAR || 'lat'), 1, 15))::BIGINT / 1152921504606846976.0))"
_LON_SQL = "(-180.0 + 360.0 * (('0x' || substr(md5(c_custkey::VARCHAR || 'lon'), 1, 15))::BIGINT / 1152921504606846976.0))"

RECTS = {  # rectangle polygons for the PIP check (lat_lo, lat_hi, lon_lo, lon_hi)
    "rect_a": (0.0, 30.0, 0.0, 40.0),
    "rect_b": (-30.0, -5.0, -120.0, -60.0),
}

# antimeridian-wrapped rects (lon_lo > lon_hi: the band crosses +-180;
# the ring's edges take the short way in longitude).  The engine side
# splits these into canonical plane pieces (geokernels.split_antimeridian
# inside point_in_polygon); the oracle is the disjunctive lon predicate.
WRAP_RECTS = {
    "wrap_a": (-30.0, 10.0, 160.0, -160.0),   # Fiji-style +-180 band
    "wrap_b": (35.0, 70.0, 150.0, -140.0),    # Chukotka/Bering band
}

KNN_QUERIES = [  # fixed query points for q_knn_geo
    ("q0", 10.0, 20.0), ("q1", -20.0, -100.0), ("q2", 45.0, 120.0),
    ("q3", 0.0, 0.0), ("q4", 60.0, -170.0),
]
KNN_K = 8


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ship(spark: SparkSession) -> None:
    from pbf2json_spark.plans.session import ship_package
    try:
        ship_package(spark)
    except Exception:
        pass  # already shipped / non-local master


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic geo points derived from customer keys (portable
    md5-based uniform hash; same formula in the SQL oracles)."""
    c = _load(spark, sf_dir, "customer")
    u = lambda salt: (F.conv(F.substring(F.md5(
        F.concat(F.col("c_custkey").cast("string"), F.lit(salt))), 1, 15),
        16, 10).cast("bigint") / F.lit(HEX60))
    return c.select(
        F.col("c_custkey").cast("string").alias("point_id"),
        (F.lit(-60.0) + 150.0 * u("lat")).alias("lat"),
        (F.lit(-180.0) + 360.0 * u("lon")).alias("lon"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tag_filter_dnf(spark, sf_dir):
    from pbf2json_spark.functions.tagpredicate import compile_tag_predicate
    docs = _load(spark, sf_dir, "documents").withColumn(
        "tags", F.create_map(F.lit("lang"), F.col("lang"),
                             F.lit("source"), F.col("source")))
    pred = compile_tag_predicate("lang~en+source~src3,lang~zh")
    return docs.filter(pred).select("doc_id", "lang", "source")


def q_tag_filter_pushdown(spark, sf_dir):
    """Same DNF as q_tag_filter_dnf but over PROMOTED flat tag columns
    — the 100 TB layout where the predicate lands in PushedFilters and
    skips row groups at the scan (map lookups never can)."""
    from pbf2json_spark.functions.tagpredicate import \
        compile_tag_predicate_flat
    docs = _load(spark, sf_dir, "documents")
    pred = compile_tag_predicate_flat(
        "lang~en+source~src3,lang~zh", {"lang": "lang", "source": "source"})
    return docs.filter(pred).select("doc_id", "lang", "source")


def q_order_denorm(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    return (j.groupBy("o_orderkey")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
                 F.array_join(F.sort_array(F.collect_list(
                     F.col("l_linenumber"))).cast("array<string>"), ",")
                  .alias("lines")))


def q_argmax_pick(spark, sf_dir):
    from pyspark.sql import Window
    orders = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 6).alias("top_price")))


def q_bounds_agg(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.round(F.max("value"), 9).alias("n"),
                 F.round(F.min("value"), 9).alias("s"),
                 F.max(F.unix_timestamp("ts")).alias("e"),
                 F.min(F.unix_timestamp("ts")).alias("w"),
                 F.count("*").alias("n_events")))


def q_priority_pick(spark, sf_dir):
    from pyspark.sql import Window
    ev = _load(spark, sf_dir, "events")
    prio = (F.when(F.col("event_type") == "purchase", 2)
             .when(F.col("event_type") == "click", 1)
             .otherwise(0))
    w = Window.partitionBy("user_id").orderBy(
        F.desc(prio), F.asc("ts"), F.asc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type"))


def q_semi_join_closure(spark, sf_dir):
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "leftsemi") \
               .select("c_custkey", "c_name")


def q_exact_dedup(spark, sf_dir):
    from pbf2json_spark.operators.dedup import exact_dedup
    return exact_dedup(_load(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    from pbf2json_spark.operators.textops import token_counts
    return token_counts(_load(spark, sf_dir, "documents"))


def q_quality_score(spark, sf_dir):
    from pbf2json_spark.operators.textops import quality_scores
    return quality_scores(_load(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    from pbf2json_spark.operators.textops import language_id
    return language_id(_load(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    from pbf2json_spark.operators.textops import fingerprints
    return fingerprints(_load(spark, sf_dir, "documents"))


def q_minhash_lsh(spark, sf_dir):
    from pbf2json_spark.operators.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_load(spark, sf_dir, "documents"), tau=0.2)



def q_dedup_groups(spark, sf_dir):
    """Transitive closure of the minhash near-dup pairs: every doc
    mapped to its duplicate group's canonical (min-id) representative
    via large-star/small-star connected components; docs with no near
    dup represent themselves."""
    from pbf2json_spark.operators.dedup import (dedup_groups,
                                                minhash_lsh_pairs)
    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, tau=0.2)
    return dedup_groups(pairs, nodes=docs.select("doc_id"))


def q_simhash_pairs(spark, sf_dir):  # full DuckDB oracle: _simhash_oracle_sql
    from pbf2json_spark.operators.dedup import simhash_near_pairs
    _ship(spark)
    return simhash_near_pairs(_load(spark, sf_dir, "documents"),
                              max_hamming=8)


def q_ngram_jaccard(spark, sf_dir):
    from pbf2json_spark.operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_load(spark, sf_dir, "documents"), tau=0.15)


def q_ann_cosine_topk(spark, sf_dir):
    from pbf2json_spark.operators.similarity import ann_brute_force
    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    res = ann_brute_force(emb, queries, k=10)
    return res.select("query_id", "vec_id", "rank",
                      F.round("cos", 6).alias("cos_r"))


def q_ann_lsh_topk(spark, sf_dir):
    from pbf2json_spark.operators.similarity import ann_lsh
    _ship(spark)
    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    res = ann_lsh(emb, queries, k=10, dim=64)
    return res.select("query_id", "vec_id", "rank",
                      F.round("cos", 6).alias("cos_r"))


def q_embedding_near_dup(spark, sf_dir):
    """Near-dup pairs over embeddings WITH PLANTED DUPLICATES.  The
    driver table alone has no within-label pair at cos >= 0.8 (max
    measured 0.475 at sf0.01), which made this gate vacuously green
    for three rounds (VERDICT r3 'what's wrong' #1).  Two plantings,
    mirrored exactly in the all-pairs DuckDB oracle:

    - identity control: every vec_id % 7 == 0 row re-emitted at
      vec_id + 1000000 (cos = 1.0 with its source);
    - PERTURBED near-dups (r5, VERDICT r4 'what's wrong' #1): the
      same rows re-emitted at vec_id + 2000000 with the first
      coordinate shifted by +0.5 in float64 — measured cos in
      [0.872, 0.927] at sf0.01, squarely inside the 0.8 <= cos < 1
      band where the grid-neighbor prefilter actually has to work
      (the perturbed copy is NOT unit-norm; the grid UDF normalizes
      before projecting, which this gate now exercises).

    Everything is computed in float64 on both sides (float32 parquet
    values widen exactly), and both sides round cos to 9 digits before
    the tau filter, so the hash compare is bit-deterministic."""
    from pbf2json_spark.operators.similarity import embedding_near_dup_pairs
    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
        "label")
    sel = emb.filter(F.col("vec_id") % 7 == 0)
    ident = sel.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label")
    pert = sel.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.concat(F.array(F.element_at("embedding", 1) + F.lit(0.5)),
                 F.slice("embedding", 2, 63)).alias("embedding"),
        "label")
    base = emb.unionByName(ident).unionByName(pert)
    return embedding_near_dup_pairs(base, tau=0.8, dim=64)


def _cell_udf(res: int):
    """res-cell pandas UDF (legacy no-hint form: `from __future__ import
    annotations` in this module turns hints into strings pyspark can't
    resolve)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pbf2json_spark.functions import cellindex as cx

    def cell(lat, lon):
        return pd.Series(cx.cell_id(lat.to_numpy(np.float64),
                                    lon.to_numpy(np.float64), res))

    return F.pandas_udf(cell, T.LongType())


def q_pip_rect(spark, sf_dir):
    from pbf2json_spark.operators.spatial import point_in_polygon
    _ship(spark)
    pts = _customer_points(spark, sf_dir)
    pts = pts.withColumn("cell_r9", _cell_udf(9)("lat", "lon"))
    rows = []
    for pid, (la0, la1, lo0, lo1) in RECTS.items():
        rows.append((pid, [la0, la1, la1, la0, la0],
                     [lo0, lo0, lo1, lo1, lo0], {}))
    polys = spark.createDataFrame(
        rows, schema="poly_id string, ring_lats array<double>, "
                     "ring_lons array<double>, tags map<string,string>")
    res = point_in_polygon(pts, polys, res=9, point_id="point_id")
    return res.select("poly_id", "point_id",
                      F.round("lat", 9).alias("lat_r"),
                      F.round("lon", 9).alias("lon_r"))


def q_pip_rect_s2(spark, sf_dir):
    """q_pip_rect on the quad-sphere index family: the covering
    prefilter runs over s2 cells (near-uniform ground area, the
    polar-safe partition key) and the exact ray-cast refine makes the
    result identical to the equirect family — so it shares
    q_pip_rect's DuckDB oracle verbatim.  The point-side key build is
    the pure-JVM s2 codec twin (cellsql.with_s2_cell), so the gate
    pins that expression end-to-end against the oracle.

    Level 8, not 9: quad-sphere cells at a given number are finer
    than equirect cells at the same number (6x512x512 faces vs a
    512x1024 global grid at 9), so level 8 is the like-for-like
    prefilter granularity — same covering size as equirect res 9
    (~10-12k cells per gate rect vs ~40-48k at level 9; measured
    1.46 -> 0.86 s at sf0.1).  PIP is exact at ANY level (the
    ray-cast refine decides)."""
    from pbf2json_spark.functions.cellsql import with_s2_cell
    from pbf2json_spark.operators.spatial import point_in_polygon
    _ship(spark)
    pts = with_s2_cell(_customer_points(spark, sf_dir),
                       "lat", "lon", 8, "s2_l8")
    rows = []
    for pid, (la0, la1, lo0, lo1) in RECTS.items():
        rows.append((pid, [la0, la1, la1, la0, la0],
                     [lo0, lo0, lo1, lo1, lo0], {}))
    polys = spark.createDataFrame(
        rows, schema="poly_id string, ring_lats array<double>, "
                     "ring_lons array<double>, tags map<string,string>")
    res = point_in_polygon(pts, polys, res=8, point_id="point_id",
                           family="s2")
    return res.select("poly_id", "point_id",
                      F.round("lat", 9).alias("lat_r"),
                      F.round("lon", 9).alias("lon_r"))


def _wrap_polys(spark):
    """The WRAP_RECTS as ring polygons whose lons flip sign across
    +-180 — each ring is NON-canonical by construction (consecutive-lon
    jumps of 320/290 deg, short-way interpretation), so these gates
    fail loudly if the split path regresses (the low-level coverings
    raise on wrapped rings since r5)."""
    rows = []
    for pid, (la0, la1, lo0, lo1) in WRAP_RECTS.items():
        rows.append((pid, [la0, la1, la1, la0, la0],
                     [lo0, lo0, lo1, lo1, lo0], {}))
    return spark.createDataFrame(
        rows, schema="poly_id string, ring_lats array<double>, "
                     "ring_lons array<double>, tags map<string,string>")


def q_pip_wrap(spark, sf_dir):
    """PIP over antimeridian-WRAPPED rectangles (VERDICT r4 'missing'
    #1): the ring wraps +-180, point_in_polygon splits it into two
    canonical pieces, unions the coverings, and ORs the ray-casts.
    The DuckDB oracle is the equivalent disjunctive predicate
    (lon > lo OR lon < hi), so the gate hash-checks the whole
    split-and-union path at driver level."""
    from pbf2json_spark.operators.spatial import point_in_polygon
    _ship(spark)
    pts = _customer_points(spark, sf_dir)
    pts = pts.withColumn("cell_r9", _cell_udf(9)("lat", "lon"))
    res = point_in_polygon(pts, _wrap_polys(spark), res=9,
                           point_id="point_id")
    return res.select("poly_id", "point_id",
                      F.round("lat", 9).alias("lat_r"),
                      F.round("lon", 9).alias("lon_r"))


def q_pip_wrap_s2(spark, sf_dir):
    """q_pip_wrap on the quad-sphere family (level 8, like-for-like
    prefilter granularity — see q_pip_rect_s2): same split-and-union
    path, s2 coverings per piece, shared oracle."""
    from pbf2json_spark.functions.cellsql import with_s2_cell
    from pbf2json_spark.operators.spatial import point_in_polygon
    _ship(spark)
    pts = with_s2_cell(_customer_points(spark, sf_dir),
                       "lat", "lon", 8, "s2_l8")
    res = point_in_polygon(pts, _wrap_polys(spark), res=8,
                           point_id="point_id", family="s2")
    return res.select("poly_id", "point_id",
                      F.round("lat", 9).alias("lat_r"),
                      F.round("lon", 9).alias("lon_r"))


def q_pip_bucketed(spark, sf_dir):
    """PIP through the DISTRIBUTED path (point_in_polygon_bucketed:
    executor-side coverings + shuffle cell join + ring-join refine, no
    broadcast, no vertex ceiling) over RECTS and WRAP_RECTS together —
    the 10^7-polygon shape, value-checked against the same disjunctive
    oracle as the dim-side gates."""
    from pbf2json_spark.operators.spatial import point_in_polygon_bucketed
    _ship(spark)
    pts = _customer_points(spark, sf_dir)
    pts = pts.withColumn("cell_r9", _cell_udf(9)("lat", "lon"))
    rows = []
    for pid, (la0, la1, lo0, lo1) in RECTS.items():
        rows.append((pid, [la0, la1, la1, la0, la0],
                     [lo0, lo0, lo1, lo1, lo0], {}))
    polys = spark.createDataFrame(
        rows, schema="poly_id string, ring_lats array<double>, "
                     "ring_lons array<double>, tags map<string,string>") \
        .unionByName(_wrap_polys(spark))
    res = point_in_polygon_bucketed(pts, polys, res=9,
                                    point_id="point_id")
    return res.select("poly_id", "point_id",
                      F.round("lat", 9).alias("lat_r"),
                      F.round("lon", 9).alias("lon_r"))


def _pip_bucketed_oracle_sql() -> str:
    parts = []
    for pid, (la0, la1, lo0, lo1) in RECTS.items():
        parts.append(f"""
SELECT '{pid}' AS poly_id, point_id, round(lat, 9) AS lat_r,
       round(lon, 9) AS lon_r
FROM pts WHERE lat > {la0} AND lat < {la1} AND lon > {lo0} AND lon < {lo1}""")
    for pid, (la0, la1, lo0, lo1) in WRAP_RECTS.items():
        parts.append(f"""
SELECT '{pid}' AS poly_id, point_id, round(lat, 9) AS lat_r,
       round(lon, 9) AS lon_r
FROM pts WHERE lat > {la0} AND lat < {la1}
  AND (lon > {lo0} OR lon < {lo1})""")
    return (f"WITH pts AS (SELECT c_custkey::VARCHAR AS point_id, "
            f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)"
            + " UNION ALL ".join(parts))


def q_knn_join(spark, sf_dir):
    """Distributed corpus-x-corpus kNN JOIN (r5): every 20th customer
    point against ALL customer points, k=8, self-pairs excluded — the
    shape knn() cannot take (both sides unbounded DataFrames; the
    ladder runs as cell-equi joins + WindowGroupLimit with zero
    row-scale driver traffic).  The oracle is the exact cross-join
    rank."""
    from pbf2json_spark.operators.spatial import knn_join
    _ship(spark)
    pts = _customer_points(spark, sf_dir)
    left = pts.filter(F.col("point_id").cast("long") % 20 == 0) \
        .select(F.col("point_id").alias("left_id"), "lat", "lon")
    right = pts.select(F.col("point_id").alias("right_id"), "lat", "lon")
    res = knn_join(left, right, k=KNN_K, exclude_self=True)
    return res.select("left_id", "right_id", "rank")


def q_knn_geo(spark, sf_dir):
    from pbf2json_spark.operators.spatial import knn
    _ship(spark)
    pts = _customer_points(spark, sf_dir)
    pts = pts.withColumn("cell_r12", _cell_udf(12)("lat", "lon"))
    queries = spark.createDataFrame(
        KNN_QUERIES, schema="query_id string, lat double, lon double")
    res = knn(pts, queries, k=KNN_K, res=12, initial_ring=2,
              point_id="point_id")
    return res.select("query_id", "point_id", "rank")



def q_knn_geo_s2(spark, sf_dir):
    """q_knn_geo on the quad-sphere ladder (knn family='s2'): exact
    with the same (dist, id) tiebreak, so it shares q_knn_geo's
    DuckDB oracle verbatim.  The density column comes from the
    pure-JVM s2 codec twin (cellsql.with_s2_cell); keep_fst=True is
    the ingest-time pattern — knn detects the (face, s, t) columns
    and reuses them instead of re-deriving the trig chain."""
    from pbf2json_spark.functions.cellsql import with_s2_cell
    from pbf2json_spark.operators.spatial import knn
    _ship(spark)
    pts = with_s2_cell(_customer_points(spark, sf_dir),
                       "lat", "lon", 9, "s2_l9", keep_fst=True)
    queries = spark.createDataFrame(
        KNN_QUERIES, schema="query_id string, lat double, lon double")
    res = knn(pts, queries, k=KNN_K, res=12, initial_ring=2,
              point_id="point_id", family="s2")
    return res.select("query_id", "point_id", "rank")


# q_tile_assignment's oracle: the per-pixel decode is not SQL-
# expressible, so the DuckDB side aggregates an INDEPENDENTLY computed
# blocks table — the Spark-free pandas twin (synth.gen_tile_blocks_pdf,
# shares only the numpy kernels with the operator, no Spark anywhere)
# committed as a parquet fixture at the correctness-gate scale
# (sf0.01 = 1000 images; scripts/make_tile_oracle_fixture.py
# regenerates it, tests/test_spatial.py pins it against both a fresh
# twin run and the operator).  avg_intensity is rounded to 6 digits on
# both sides: per-block values are bit-identical by construction, only
# the distributed-vs-sequential SUM order differs (last-ulp).
import os as _os

def _tile_oracle_fixture() -> str:
    """The twin fixture at the scale the oracle will be compared at.
    The driver gate runs at sf0.01 (1000 images) — that stays the
    default.  The two-SF sweep (scripts/check_correctness.py,
    tests/test_entry_correctness.py via SPARK_GRAFT_TEST_SF_DIR) sets
    SPARK_GRAFT_ORACLE_SF_DIR so the sf0.1 fixture (10000 images,
    regenerated by scripts/make_tile_oracle_fixture.py) is used — the
    fixture is scale-specific by construction, so a fixed path made
    the sf0.1 sweep fail vacuously."""
    return _scale_fixture("tile_blocks", "make_tile_oracle_fixture.py")


def _scale_fixture(prefix: str, make_script: str) -> str:
    """Resolve a scale-keyed oracle fixture; only the 1000- and
    10000-row fixtures are committed, so a sweep at another SF gets a
    clear regenerate-me error instead of an opaque DuckDB
    read_parquet file-not-found (ADVICE r4)."""
    sf_dir = _os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "")
    n = max(200, _scale_rows(sf_dir)) if sf_dir else 1000
    path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "tests", "fixtures", f"{prefix}_{n}.parquet")
    if not _os.path.exists(path):
        raise FileNotFoundError(
            f"oracle fixture {path} is not committed (only the 1000/"
            f"10000-row gate scales are); regenerate it with "
            f"`python3 scripts/{make_script} {n}` before sweeping at "
            f"this scale")
    return path


def q_tile_assignment(spark, sf_dir):
    from pbf2json_spark.operators.spatial import attach_geo, tile_assignment
    from pbf2json_spark.sources.synth import images_df
    _ship(spark)
    n = max(200, _scale_rows(sf_dir))
    imgs = images_df(spark, n)
    geo = attach_geo(imgs, res_list=(9, 12))
    t = tile_assignment(geo, grid=4, res=12)
    return t.select("cell", "n_blocks", "n_images",
                    F.round("avg_intensity", 6).alias("avg_intensity_r"))


def _tile_oracle_sql() -> str:
    return f"""
SELECT cell, count(*) AS n_blocks, count(DISTINCT image_id) AS n_images,
       round(avg(mean_intensity), 6) AS avg_intensity_r
FROM read_parquet('{_tile_oracle_fixture()}')
GROUP BY cell
"""


# --- pHash near-dup driver gate (r5, VERDICT r4 'missing' #3) --------------
# The pixel decode is not SQL-expressible, so (like the tile gate) the
# DuckDB side reads an INDEPENDENTLY computed twin fixture of per-image
# phashes (synth.gen_phash_pdf: phash recomputed from DECODED bytes +
# perturbed 'dup' copies of every 7th image) and runs the SAME banded
# hamming join the Spark operator runs.  The Spark side recomputes the
# hashes through the real decode path (multimodal.phash_images) over
# images + executor-side perturbed copies, so decode -> phash -> banded
# join is pinned end-to-end by the hash compare.

def _perturbed_images(imgs, every: int = 7):
    """Executor-side planted near-duplicates: decode -> perturb_pixels
    -> re-encode (raw, lossless) under a 'dup' id prefix.  Mirrors
    synth.gen_phash_pdf's planting exactly (shared numpy kernel)."""
    import pandas as pd

    from pbf2json_spark.functions import imagecodec as ic
    from pbf2json_spark.sources import synth as sy
    from pbf2json_spark.sources.synth import spark_schemas

    sel = imgs.filter(
        F.substring("image_id", 4, 12).cast("long") % every == 0)

    def gen(batches):
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                seq = int(r.image_id[3:])
                px = ic.decode_image(bytes(r.bytes))
                pp = sy.perturb_pixels(px, seq)
                rows.append((f"dup{seq:012d}", ic.encode_image(pp, "raw"),
                             r.w, r.h, "raw", r.caption, ic.phash64(pp)))
            yield pd.DataFrame(rows, columns=cols)

    return sel.mapInPandas(gen, spark_schemas()["images"])


PHASH_MAX_HAMMING = 6


def q_phash_near_dup(spark, sf_dir):
    from pbf2json_spark.operators.dedup import hash_near_pairs
    from pbf2json_spark.operators.multimodal import phash_images
    from pbf2json_spark.sources.synth import images_df
    _ship(spark)
    n = max(200, _scale_rows(sf_dir))
    imgs = images_df(spark, n)
    base = imgs.unionByName(_perturbed_images(imgs))
    ph = phash_images(base)
    return hash_near_pairs(ph, "phash", PHASH_MAX_HAMMING,
                           id_col="image_id")


def _phash_oracle_sql() -> str:
    """The operator's banding mirrored in SQL: 4 chunks of 16 bits;
    candidates share a chunk value; exact popcount verify.  Arithmetic
    >> matches Spark's shiftright on negative hashes because the &
    65535 mask keeps only the shifted-in low 16 bits either way."""
    fixture = _scale_fixture("phash", "make_phash_oracle_fixture.py")
    chunk_selects = " UNION ALL ".join(
        f"SELECT image_id, phash, {c} AS chunk, "
        f"(phash >> {16 * c}) & 65535 AS val FROM h"
        for c in range(4))
    return f"""
WITH h AS (SELECT image_id, phash FROM read_parquet('{fixture}')),
chunks AS ({chunk_selects}),
cand AS (SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                a.phash AS pa, b.phash AS pb
         FROM chunks a JOIN chunks b
           ON a.chunk = b.chunk AND a.val = b.val
          AND a.image_id < b.image_id)
SELECT id_a, id_b, bit_count(xor(pa, pb))::INT AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_MAX_HAMMING}
"""


# --- OSM pipeline over driver-derived tables -------------------------------
# Coordinates live on a 1/128-degree grid: m/128 is a dyadic rational
# whose low 32+ mantissa bits are zero (the reference's 6-byte
# truncation is a NO-OP) and whose decimal expansion terminates at
# exactly 7 digits (%.7f formatting is EXACT, no rounding-mode
# divergence between Java format_string and C printf).  That makes the
# full denormalization — join, completeness drop, truncate-on-first-
# miss, argmax-by-bbox-area, bounds formatting — bit-reproducible in
# DuckDB, so the flagship pipeline carries a value-level oracle.
# Centroid math stays pytest-pinned (tests/test_denormalize.py vs the
# pure-python oracle); it is the one non-SQL-expressible piece.

OSM_MISS = 10_000_000_000  # refs >= this never resolve


def _osm_driver_tables(spark, sf_dir):
    """(nodes, ways, relations) derived deterministically from the
    customer/orders/part parquet tables with md5-based hashing — the
    identical derivation exists in _osm_oracle_sql()."""
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    part = _load(spark, sf_dir, "part")

    def H(c, salt):
        return F.conv(F.substring(F.md5(
            F.concat(c.cast("string"), F.lit(salt))), 1, 15), 16, 10) \
                .cast("bigint")

    ck = F.col("c_custkey").cast("long")
    m = ck % 100
    ent = F.element_at(
        F.array(F.lit("main"), F.lit("yes"), F.lit("home"),
                F.lit("staircase")), (ck % 4 + 1).cast("int"))
    empty = F.create_map().cast("map<string,string>")
    nodes = cust.select(
        ck.alias("id"),
        ((H(ck, ":nlat") % 23041 - 11520) / 128.0).alias("lat"),
        ((H(ck, ":nlon") % 46081 - 23040) / 128.0).alias("lon"),
        F.when(m < 10, F.create_map(F.lit("building"), F.lit("yes")))
         .when(m < 20, F.create_map(F.lit("shop"), F.lit("bakery")))
         .when(m < 30, F.when(
             ck % 2 == 0,
             F.create_map(F.lit("entrance"), ent,
                          F.lit("wheelchair"), F.lit("yes")))
           .otherwise(F.create_map(F.lit("entrance"), ent)))
         .when(m < 35, F.create_map(
             F.lit(" padded "),
             F.concat(F.lit(" v"), (ck % 7).cast("string"), F.lit(" ")),
             F.lit("building"), F.lit("yes")))
         .otherwise(empty).alias("tags"))

    mx = cust.agg(F.max(ck).alias("maxc"))
    o = orders.select(F.col("o_orderkey").cast("long").alias("wid"),
                      F.col("o_custkey").cast("long").alias("ock")) \
              .crossJoin(F.broadcast(mx))
    wid, ock, maxc = F.col("wid"), F.col("ock"), F.col("maxc")
    base = F.transform(
        F.sequence(F.lit(0).cast("long"), wid % 8 + 2),
        lambda i: F.lit(1) + (ock * 31 + i * 17 + wid) % maxc)
    refs1 = F.when(wid % 37 == 0,
                   F.concat(F.array(maxc + 1 + wid),
                            F.slice(base, 2, F.size(base) - 1))) \
             .otherwise(base)
    refs = F.when(wid % 5 == 0, F.concat(refs1, F.slice(refs1, 1, 1))) \
            .otherwise(refs1)
    wt = wid % 10
    ways = o.select(
        wid.alias("id"), refs.alias("refs"),
        F.when(wt < 4, F.create_map(F.lit("building"), F.lit("yes")))
         .when(wt < 6, F.create_map(F.lit("shop"), F.lit("bakery")))
         .when(wt < 8, F.create_map(F.lit("highway"), F.lit("residential")))
         .otherwise(empty).alias("tags"))

    nord = orders.count()
    from pbf2json_spark.plans.ordering import global_seq
    word = global_seq(
        orders.select(F.col("o_orderkey").cast("long").alias("wwid")),
        "wwid", out_col="wseq")
    rel = part.select(F.col("p_partkey").cast("long").alias("rel_id"))
    rid = F.col("rel_id")
    memb = rel.select(
        "rel_id",
        F.explode(F.when(rid % 4 >= 1,
                         F.sequence(F.lit(0).cast("long"), rid % 4 - 1))
                   .otherwise(F.array().cast("array<bigint>"))).alias("j"))
    memb = memb.withColumn("seq", 1 + (rid * 13 + F.col("j") * 7) % nord)
    memb = memb.join(word, memb.seq == word.wseq, "left")
    memb = memb.select(
        "rel_id", "j",
        F.when((rid + F.col("j")) % 11 == 0,
               F.lit(OSM_MISS) + rid * 10 + F.col("j"))
         .otherwise(F.col("wwid")).alias("ref"))
    member_t = "array<struct<type:tinyint,ref:bigint,role:string>>"
    magg = (memb.groupBy("rel_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("j").alias("j"),
                    F.struct(F.lit(1).cast("byte").alias("type"),
                             F.col("ref").alias("ref"),
                             F.lit("outer").alias("role")).alias("m")))),
                lambda x: x["m"]).alias("members")))
    rt = rid % 10
    rels = (rel.join(magg, "rel_id", "left")
            .select(rid.alias("id"),
                    F.coalesce("members", F.array().cast(member_t))
                     .alias("members"),
                    F.when(rt < 4,
                           F.create_map(F.lit("building"), F.lit("yes")))
                     .when(rt < 6, F.create_map(
                         F.lit("boundary"), F.lit("administrative"),
                         F.lit("name"), F.concat(F.lit("admin "),
                                                 rid.cast("string"))))
                     .otherwise(F.create_map(F.lit("waterway"),
                                             F.lit("stream")))
                     .alias("tags")))
    return nodes, ways, rels


def _tag_str():
    return F.array_join(F.transform(
        F.array_sort(F.map_entries("tags")),
        lambda kv: F.concat(kv["key"], F.lit("="), kv["value"])), ";")


def q_osm_pipeline(spark, sf_dir):
    """The flagship reference job (matched nodes + denormalized ways +
    denormalized relations) over driver-derived OSM tables, projected
    to its SQL-expressible surface: gid, trimmed tag string, and the
    %.7f bounds strings (node rows carry their coords in n/s=lat,
    e/w=lon).  Centroids are pytest-pinned."""
    from pbf2json_spark.operators.denormalize import (denormalize_relations,
                                                      denormalize_ways,
                                                      matched_nodes)
    _ship(spark)
    nodes, ways, rels = _osm_driver_tables(spark, sf_dir)
    spec = "building,shop"
    n = matched_nodes(nodes, spec).select(
        F.concat(F.lit("node:"), F.col("id").cast("string")).alias("gid"),
        F.lit("node").alias("typ"), _tag_str().alias("tag_str"),
        F.format_string("%.7f", "lat").alias("n"),
        F.format_string("%.7f", "lat").alias("s"),
        F.format_string("%.7f", "lon").alias("e"),
        F.format_string("%.7f", "lon").alias("w"))
    w = denormalize_ways(nodes, ways, spec).select(
        F.concat(F.lit("way:"), F.col("id").cast("string")).alias("gid"),
        F.lit("way").alias("typ"), _tag_str().alias("tag_str"),
        F.element_at("bounds", F.lit("n")).alias("n"),
        F.element_at("bounds", F.lit("s")).alias("s"),
        F.element_at("bounds", F.lit("e")).alias("e"),
        F.element_at("bounds", F.lit("w")).alias("w"))
    r = denormalize_relations(nodes, ways, rels, spec).select(
        F.concat(F.lit("relation:"), F.col("id").cast("string")).alias("gid"),
        F.lit("relation").alias("typ"), _tag_str().alias("tag_str"),
        F.element_at("bounds", F.lit("n")).alias("n"),
        F.element_at("bounds", F.lit("s")).alias("s"),
        F.element_at("bounds", F.lit("e")).alias("e"),
        F.element_at("bounds", F.lit("w")).alias("w"))
    return n.unionByName(w).unionByName(r)


def _scale_rows(sf_dir: str) -> int:
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.01
    return int(sf * 100_000)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the spatial PIP over deterministic points at sf0.001."""
    return q_pip_rect(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_tag_filter_dnf": q_tag_filter_dnf,
        "q_tag_filter_pushdown": q_tag_filter_pushdown,
        "q_order_denorm": q_order_denorm,
        "q_argmax_pick": q_argmax_pick,
        "q_bounds_agg": q_bounds_agg,
        "q_priority_pick": q_priority_pick,
        "q_semi_join_closure": q_semi_join_closure,
        "q_exact_dedup": q_exact_dedup,
        "q_token_count": q_token_count,
        "q_quality_score": q_quality_score,
        "q_lang_id": q_lang_id,
        "q_fingerprint": q_fingerprint,
        "q_minhash_lsh": q_minhash_lsh,
        "q_dedup_groups": q_dedup_groups,
        "q_simhash_pairs": q_simhash_pairs,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_ann_cosine_topk": q_ann_cosine_topk,
        "q_ann_lsh_topk": q_ann_lsh_topk,
        "q_embedding_near_dup": q_embedding_near_dup,
        "q_pip_rect": q_pip_rect,
        "q_pip_rect_s2": q_pip_rect_s2,
        "q_pip_wrap": q_pip_wrap,
        "q_pip_wrap_s2": q_pip_wrap_s2,
        "q_pip_bucketed": q_pip_bucketed,
        "q_knn_geo": q_knn_geo,
        "q_knn_join": q_knn_join,
        "q_knn_geo_s2": q_knn_geo_s2,
        "q_tile_assignment": q_tile_assignment,
        "q_phash_near_dup": q_phash_near_dup,
        "q_osm_pipeline": q_osm_pipeline,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _minhash_oracle_sql(tau: float = 0.2) -> str:
    from pbf2json_spark.operators.dedup import (MINHASH_A, MINHASH_B,
                                                MINHASH_BANDS, MINHASH_K,
                                                MINHASH_PRIME, MINHASH_ROWS)
    P = MINHASH_PRIME
    toks = ("regexp_split_to_array(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g')), ' ')")
    sh = (f"list_distinct(list_transform(range(1, greatest(len({toks}) - 2, 1) + 1), "
          f"i -> array_to_string(({toks})[i:i+2], ' ')))")
    shh = (f"list_transform({sh}, s -> "
           f"(('0x' || substr(md5(s), 1, 15))::BIGINT) % {P})")
    mh_cols = ", ".join(
        f"list_min(list_transform(sh, h -> (h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {P})) AS mh_{i}"
        for i in range(MINHASH_K))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS sig FROM sig".format(
            b=b, concat=" || '_' || ".join(
                f"mh_{b * MINHASH_ROWS + r}::VARCHAR" for r in range(MINHASH_ROWS)))
        for b in range(MINHASH_BANDS))
    return f"""
WITH base AS (SELECT doc_id, {shh} AS sh FROM documents),
sig AS (SELECT doc_id, {mh_cols} FROM base),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
shing AS (SELECT doc_id, {sh} AS s FROM documents)
SELECT doc_a, doc_b,
       round(len(list_intersect(x.s, y.s))::DOUBLE
             / len(list_distinct(x.s || y.s)), 9) AS jaccard
FROM cand JOIN shing x ON cand.doc_a = x.doc_id
          JOIN shing y ON cand.doc_b = y.doc_id
WHERE round(len(list_intersect(x.s, y.s))::DOUBLE
            / len(list_distinct(x.s || y.s)), 9) >= {tau}
"""



def _dedup_groups_oracle_sql() -> str:
    """Connected components as a recursive reachability closure over
    the SAME pair set the minhash oracle derives (tractable at gate
    scale; the engine side uses O(log n)-round star contraction)."""
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (SELECT a, b FROM sym
                UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
mn AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
SELECT d.doc_id, coalesce(least(d.doc_id, mn.mb), d.doc_id) AS group_rep
FROM documents d LEFT JOIN mn ON d.doc_id = mn.a
"""


def _ngram_jaccard_oracle_sql(tau: float = 0.15, bucket: int = 100) -> str:
    toks = ("regexp_split_to_array(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g')), ' ')")
    sh = (f"list_distinct(list_transform(range(1, greatest(len({toks}) - 2, 1) + 1), "
          f"i -> array_to_string(({toks})[i:i+2], ' ')))")
    return f"""
WITH base AS (SELECT doc_id, lang, floor(n_chars / {bucket})::INT AS lb, {sh} AS s
              FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / len(list_distinct(a.s || b.s)), 9) AS jaccard
FROM base a JOIN base b
  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
            / len(list_distinct(a.s || b.s)), 9) >= {tau}
"""


def _simhash_oracle_sql(max_hamming: int = 8) -> str:
    """SimHash is SQL-expressible since round 2: the token hash is the
    portable md5-prefix bigint, the 60 per-bit votes are generated
    terms, and banding/hamming mirror the operator exactly."""
    from pbf2json_spark.operators.dedup import (SIMHASH_BITS, SIMHASH_CHUNKS,
                                                SIMHASH_CHUNK_BITS,
                                                SIMHASH_CHUNK_MASK)
    toks = ("regexp_split_to_array(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g')), ' ')")
    hs = f"list_transform({toks}, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {j}) & 1)) "
        f"> len(hs) THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS))
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, "
        f"(simhash >> {SIMHASH_CHUNK_BITS * c}) & {SIMHASH_CHUNK_MASK} AS val "
        f"FROM sig"
        for c in range(SIMHASH_CHUNKS))
    return f"""
WITH base AS (SELECT doc_id, {hs} AS hs FROM documents),
sig AS (SELECT doc_id, ({bit_terms})::BIGINT AS simhash FROM base),
chunks AS ({chunk_selects}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.simhash AS sa, b.simhash AS sb
         FROM chunks a JOIN chunks b
           ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _quality_oracle_sql() -> str:
    from pbf2json_spark.operators.textops import STOPWORDS
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    return f"""
SELECT doc_id,
       length(text) AS len_chars,
       round(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
             / length(text), 9) AS punct_ratio,
       round(len(list_filter({toks}, t -> t IN ({stop})))::DOUBLE
             / len({toks}), 9) AS stop_ratio,
       round(least(length(text) / 500.0, 1.0) * 0.4
             + (1.0 - length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
                      / length(text)) * 0.3
             + least(len(list_filter({toks}, t -> t IN ({stop})))::DOUBLE
                     / len({toks}) * 4.0, 1.0) * 0.3, 9) AS quality
FROM documents
"""


def _lang_oracle_sql() -> str:
    from pbf2json_spark.operators.textops import LANG_MARKERS
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    cnt = {lang: f"len(list_filter({toks}, t -> t IN ({', '.join(chr(39)+w+chr(39) for w in words)})))"
           for lang, words in LANG_MARKERS.items()}
    return f"""
SELECT doc_id,
       CASE WHEN {cnt['en']} >= {cnt['es']} AND {cnt['en']} >= {cnt['fr']}
                 AND {cnt['en']} >= {cnt['de']} THEN 'en'
            WHEN {cnt['es']} >= {cnt['fr']} AND {cnt['es']} >= {cnt['de']} THEN 'es'
            WHEN {cnt['fr']} >= {cnt['de']} THEN 'fr'
            ELSE 'de' END AS pred_lang
FROM documents
"""


def _ann_lsh_oracle_sql(k: int = 10) -> str:
    """Sign-LSH buckets as generated SQL: each plane dot is an explicit
    64-term `+` chain (the identical left-fold order the numpy bucket
    UDF and the JVM re-rank use), plane coefficients inlined as
    round-trip float literals."""
    from pbf2json_spark.operators.similarity import _hyperplanes
    planes = _hyperplanes(64, 8, 6)

    def dot(col, vec):
        return " + ".join(f"{col}[{i + 1}] * {v!r}" for i, v in enumerate(vec))

    def bucket(col, t):
        return " + ".join(
            f"(CASE WHEN ({dot(col, planes[t, p])}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(planes.shape[1]))

    qb = " UNION ALL ".join(
        f"SELECT query_id, {t} AS tbl, ({bucket('qe', t)}) AS bucket FROM q"
        for t in range(planes.shape[0]))
    eb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, ({bucket('ee', t)}) AS bucket FROM e"
        for t in range(planes.shape[0]))
    return f"""
WITH q AS (SELECT vec_id::VARCHAR AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < 20),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings),
qb AS ({qb}),
eb AS ({eb}),
cand AS (SELECT DISTINCT qb.query_id, eb.vec_id
         FROM qb JOIN eb ON qb.tbl = eb.tbl AND qb.bucket = eb.bucket),
scored AS (SELECT c.query_id, c.vec_id,
                  list_cosine_similarity(e2.embedding::DOUBLE[], q2.qe) AS cos
           FROM cand c
           JOIN embeddings e2 ON c.vec_id = e2.vec_id
           JOIN q q2 ON c.query_id = q2.query_id),
ranked AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY round(cos, 9) DESC, vec_id) AS rank
           FROM scored)
SELECT query_id, vec_id, rank::INT AS rank, round(cos, 6) AS cos_r
FROM ranked WHERE rank <= {k}
"""


def _osm_oracle_sql() -> str:
    """DuckDB twin of q_osm_pipeline: identical table derivation (md5
    hashes, 1/128-degree exact grid), way->node resolution with the
    completeness drop, relation truncate-on-first-miss + argmax by bbox
    area, and exact %.7f bounds strings."""
    from pbf2json_spark.functions.geokernels import (EARTH_RADIUS_M,
                                                     GEO_HEIGHT_M_PER_DEG)
    return f"""
WITH
mx AS (SELECT max(c_custkey)::BIGINT AS maxc FROM customer),
nordc AS (SELECT count(*)::BIGINT AS n FROM orders),
nodes AS (
  SELECT c_custkey::BIGINT AS id,
         ((('0x' || substr(md5(c_custkey::VARCHAR || ':nlat'), 1, 15))::BIGINT
           % 23041 - 11520) / 128.0) AS lat,
         ((('0x' || substr(md5(c_custkey::VARCHAR || ':nlon'), 1, 15))::BIGINT
           % 46081 - 23040) / 128.0) AS lon,
         c_custkey % 100 AS m
  FROM customer),
node_out AS (
  SELECT 'node:' || id AS gid, 'node' AS typ,
         CASE WHEN m < 10 THEN 'building=yes'
              WHEN m < 20 THEN 'shop=bakery'
              ELSE 'building=yes;padded=v' || (id % 7) END AS tag_str,
         printf('%.7f', lat) AS n, printf('%.7f', lat) AS s,
         printf('%.7f', lon) AS e, printf('%.7f', lon) AS w
  FROM nodes WHERE m < 20 OR (m >= 30 AND m < 35)),
wmeta AS (
  SELECT o_orderkey::BIGINT AS wid, o_custkey::BIGINT AS ock,
         3 + o_orderkey % 8 AS l,
         (o_orderkey % 5 = 0) AS closed,
         (o_orderkey % 37 = 0) AS has_miss,
         o_orderkey % 10 AS wt
  FROM orders),
wref AS (
  SELECT wid, u.j AS i,
         CASE WHEN has_miss AND (CASE WHEN u.j = l THEN 0 ELSE u.j END) = 0
              THEN (SELECT maxc FROM mx) + 1 + wid
              ELSE 1 + ((ock * 31
                         + (CASE WHEN u.j = l THEN 0 ELSE u.j END) * 17
                         + wid) % (SELECT maxc FROM mx)) END AS ref
  FROM wmeta, UNNEST(range(0, l + CASE WHEN closed THEN 1 ELSE 0 END)) AS u(j)),
wagg AS (
  SELECT w.wid, count(*) AS nrefs, count(n.lat) AS npts,
         max(n.lat) AS bn, min(n.lat) AS bs, max(n.lon) AS be, min(n.lon) AS bw
  FROM wref w LEFT JOIN nodes n ON w.ref = n.id
  GROUP BY w.wid),
way_out AS (
  SELECT 'way:' || m.wid AS gid, 'way' AS typ,
         CASE WHEN m.wt < 4 THEN 'building=yes' ELSE 'shop=bakery' END AS tag_str,
         printf('%.7f', a.bn) AS n, printf('%.7f', a.bs) AS s,
         printf('%.7f', a.be) AS e, printf('%.7f', a.bw) AS w
  FROM wmeta m JOIN wagg a ON m.wid = a.wid
  WHERE m.wt < 6 AND a.npts = a.nrefs),
word AS (SELECT o_orderkey::BIGINT AS wid,
                row_number() OVER (ORDER BY o_orderkey) AS wseq FROM orders),
rmeta AS (SELECT p_partkey::BIGINT AS rel_id, p_partkey % 4 AS mc,
                 p_partkey % 10 AS rt FROM part),
rmemx AS (
  SELECT r.rel_id, u.j,
         1 + (r.rel_id * 13 + u.j * 7) % (SELECT n FROM nordc) AS seq,
         ((r.rel_id + u.j) % 11 = 0) AS is_miss
  FROM rmeta r, UNNEST(range(0, r.mc)) AS u(j)),
rmem AS (
  SELECT x.rel_id, x.j,
         CASE WHEN x.is_miss THEN {OSM_MISS} + x.rel_id * 10 + x.j
              ELSE w.wid END AS ref
  FROM rmemx x LEFT JOIN word w ON w.wseq = x.seq),
rfail AS (
  SELECT m.rel_id, m.j, m.ref,
         (a.wid IS NULL OR a.npts <> a.nrefs) AS failed
  FROM rmem m LEFT JOIN wagg a ON m.ref = a.wid),
rcut AS (
  SELECT rel_id, j, ref FROM (
    SELECT *, min(CASE WHEN failed THEN j END)
                OVER (PARTITION BY rel_id) AS first_miss
    FROM rfail)
  WHERE first_miss IS NULL OR j < first_miss),
rpick AS (
  SELECT c.rel_id, a.bn, a.bs, a.be, a.bw,
         row_number() OVER (PARTITION BY c.rel_id ORDER BY
           greatest({EARTH_RADIUS_M!r} * abs(radians(a.be - a.bw)
                    * cos(radians((a.bn + a.bs) / 2.0))), 1e-6)
           * greatest({GEO_HEIGHT_M_PER_DEG!r} * (a.bn - a.bs), 1e-6) DESC,
           c.j ASC) AS rn
  FROM rcut c JOIN wagg a ON c.ref = a.wid),
rel_out AS (
  SELECT 'relation:' || p.rel_id AS gid, 'relation' AS typ,
         'building=yes' AS tag_str,
         printf('%.7f', bn) AS n, printf('%.7f', bs) AS s,
         printf('%.7f', be) AS e, printf('%.7f', bw) AS w
  FROM rpick p JOIN rmeta m ON p.rel_id = m.rel_id
  WHERE p.rn = 1 AND m.rt < 4)
SELECT * FROM node_out
UNION ALL SELECT * FROM way_out
UNION ALL SELECT * FROM rel_out
"""


def _haversine_sql(lat1, lon1, lat2, lon2) -> str:
    return (f"2.0 * 6378137.0 * atan2(sqrt(pow(sin(radians({lat2} - {lat1}) / 2), 2)"
            f" + cos(radians({lat1})) * cos(radians({lat2}))"
            f" * pow(sin(radians({lon2} - {lon1}) / 2), 2)),"
            f" sqrt(1.0 - (pow(sin(radians({lat2} - {lat1}) / 2), 2)"
            f" + cos(radians({lat1})) * cos(radians({lat2}))"
            f" * pow(sin(radians({lon2} - {lon1}) / 2), 2))))")


def _knn_oracle_sql() -> str:
    qvals = ", ".join(f"('{q}', {la}, {lo})" for q, la, lo in KNN_QUERIES)
    hav = _haversine_sql("q.qlat", "q.qlon", "p.lat", "p.lon")
    return f"""
WITH pts AS (SELECT c_custkey::VARCHAR AS point_id,
                    {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
q(query_id, qlat, qlon) AS (VALUES {qvals}),
scored AS (SELECT q.query_id, p.point_id,
                  {hav} AS dist_m
           FROM pts p CROSS JOIN q),
ranked AS (SELECT query_id, point_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY dist_m, point_id) AS rank
           FROM scored)
SELECT query_id, point_id, rank::INT AS rank FROM ranked WHERE rank <= {KNN_K}
"""


def _knn_join_oracle_sql() -> str:
    hav = _haversine_sql("l.lat", "l.lon", "p.lat", "p.lon")
    return f"""
WITH pts AS (SELECT c_custkey::VARCHAR AS point_id,
                    {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
l AS (SELECT * FROM pts WHERE point_id::BIGINT % 20 = 0),
scored AS (SELECT l.point_id AS left_id, p.point_id AS right_id,
                  {hav} AS dist_m
           FROM l CROSS JOIN pts p WHERE p.point_id <> l.point_id),
ranked AS (SELECT left_id, right_id,
                  row_number() OVER (PARTITION BY left_id
                                     ORDER BY dist_m, right_id) AS rank
           FROM scored)
SELECT left_id, right_id, rank::INT AS rank FROM ranked
WHERE rank <= {KNN_K}
"""


def _pip_oracle_sql() -> str:
    parts = []
    for pid, (la0, la1, lo0, lo1) in RECTS.items():
        parts.append(f"""
SELECT '{pid}' AS poly_id, point_id, round(lat, 9) AS lat_r,
       round(lon, 9) AS lon_r
FROM pts WHERE lat > {la0} AND lat < {la1} AND lon > {lo0} AND lon < {lo1}""")
    return (f"WITH pts AS (SELECT c_custkey::VARCHAR AS point_id, "
            f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)"
            + " UNION ALL ".join(parts))


def _pip_wrap_oracle_sql() -> str:
    """WRAP_RECTS as the equivalent disjunctive lon predicate: the band
    (lo0, +180] U [-180, lo1) with exclusive outer bounds — exactly the
    point set of the wrapped ring's two canonical pieces."""
    parts = []
    for pid, (la0, la1, lo0, lo1) in WRAP_RECTS.items():
        parts.append(f"""
SELECT '{pid}' AS poly_id, point_id, round(lat, 9) AS lat_r,
       round(lon, 9) AS lon_r
FROM pts WHERE lat > {la0} AND lat < {la1}
  AND (lon > {lo0} OR lon < {lo1})""")
    return (f"WITH pts AS (SELECT c_custkey::VARCHAR AS point_id, "
            f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)"
            + " UNION ALL ".join(parts))


def oracle_sql() -> dict[str, str]:
    toks_trim = "regexp_split_to_array(trim(text), '\\s+')"
    token_re = r"[a-z0-9]+|[^a-z0-9\s]"
    return {
        "q_tag_filter_dnf": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE (lang = 'en' AND source = 'src3') OR lang = 'zh'"),
        "q_tag_filter_pushdown": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE (lang IS NOT NULL AND lang = 'en' AND source IS NOT NULL "
            "AND source = 'src3') OR (lang IS NOT NULL AND lang = 'zh')"),
        "q_order_denorm": ("""
SELECT o_orderkey, count(*) AS n_items,
       round(sum(l_quantity), 6) AS sum_qty,
       string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey"""),
        "q_argmax_pick": ("""
SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS top_price FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn = 1"""),
        "q_bounds_agg": ("""
SELECT user_id, round(max(value), 9) AS n, round(min(value), 9) AS s,
       max(floor(epoch(ts)))::BIGINT AS e, min(floor(epoch(ts)))::BIGINT AS w,
       count(*) AS n_events
FROM events GROUP BY user_id"""),
        "q_priority_pick": ("""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY
           (CASE WHEN event_type = 'purchase' THEN 2
                 WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
           ts, event_id) AS rn
  FROM events) WHERE rn = 1"""),
        "q_semi_join_closure": ("""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)"""),
        "q_exact_dedup": ("""
SELECT md5(text) AS text_md5, min(doc_id) AS rep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)"""),
        "q_token_count": (f"""
SELECT doc_id, len({toks_trim}) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{token_re}')) AS n_re_tokens
FROM documents"""),
        "q_quality_score": _quality_oracle_sql(),
        "q_lang_id": _lang_oracle_sql(),
        "q_fingerprint": ("""
SELECT doc_id,
       ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
        1, 15))::BIGINT AS fp
FROM documents"""),
        "q_minhash_lsh": _minhash_oracle_sql(),
        "q_dedup_groups": _dedup_groups_oracle_sql(),
        "q_simhash_pairs": _simhash_oracle_sql(),
        "q_ngram_jaccard": _ngram_jaccard_oracle_sql(),
        "q_ann_cosine_topk": ("""
WITH q AS (SELECT vec_id::VARCHAR AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 20),
scored AS (SELECT q.query_id, e.vec_id,
                  list_cosine_similarity(e.embedding::DOUBLE[],
                                         q.qe::DOUBLE[]) AS cos
           FROM embeddings e CROSS JOIN q),
ranked AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY round(cos, 9) DESC, vec_id) AS rank
           FROM scored)
SELECT query_id, vec_id, rank::INT AS rank, round(cos, 6) AS cos_r
FROM ranked WHERE rank <= 10"""),
        "q_embedding_near_dup": ("""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb, label
  FROM embeddings),
base AS (
  SELECT vec_id, emb, label FROM e
  UNION ALL
  SELECT vec_id + 1000000, emb, label FROM e WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 2000000, list_prepend(emb[1] + 0.5, emb[2:64]), label
  FROM e WHERE vec_id % 7 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.emb, b.emb), 9) AS cos
FROM base a JOIN base b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.emb, b.emb), 9) >= 0.8"""),
        "q_ann_lsh_topk": _ann_lsh_oracle_sql(),
        "q_osm_pipeline": _osm_oracle_sql(),
        "q_pip_rect": _pip_oracle_sql(),
        "q_pip_rect_s2": _pip_oracle_sql(),
        "q_pip_wrap": _pip_wrap_oracle_sql(),
        "q_pip_wrap_s2": _pip_wrap_oracle_sql(),
        "q_pip_bucketed": _pip_bucketed_oracle_sql(),
        "q_knn_geo": _knn_oracle_sql(),
        "q_knn_join": _knn_join_oracle_sql(),
        "q_knn_geo_s2": _knn_oracle_sql(),
        "q_tile_assignment": _tile_oracle_sql(),
        "q_phash_near_dup": _phash_oracle_sql(),
    }
