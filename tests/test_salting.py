"""Salted equi-join: output equivalence with the plain join (including
under a heavily-skewed hot key) and hot-key replication bounds."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pbf2json_spark.operators.denormalize import node_store, way_point_arrays
from pbf2json_spark.plans.salting import hot_keys, salted_equijoin
from pbf2json_spark.sources.synth import osm_tables_df


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_equivalence_skewed(spark):
    # 50k probe rows, 90% hitting ONE hot key — the case AQE's
    # partition split cannot fix for a hash join
    rng = np.random.Generator(np.random.Philox(key=np.uint64(3)))
    keys = np.where(rng.uniform(size=50_000) < 0.9, 7,
                    rng.integers(0, 1000, 50_000))
    probe = spark.createDataFrame(
        pd.DataFrame({"ref": keys.astype(np.int64),
                      "val": np.arange(50_000, dtype=np.int64)}))
    build = spark.createDataFrame(
        pd.DataFrame({"ref": np.arange(0, 1000, dtype=np.int64),
                      "payload": np.arange(0, 1000, dtype=np.int64) * 10}))

    plain = probe.join(build, "ref")
    salted = salted_equijoin(probe, build, "ref", n_salts=8,
                             hot_threshold=1000)
    cols = ["ref", "val", "payload"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)

    # hot detection: exactly the one zipfian key
    hk = [r.ref for r in hot_keys(probe, "ref", 1000).collect()]
    assert hk == [7]


def test_salted_join_no_hot_keys_is_identity(spark):
    probe = spark.range(0, 500).select(F.col("id").alias("ref"),
                                       (F.col("id") * 2).alias("val"))
    build = spark.range(0, 500).select(F.col("id").alias("ref"),
                                       (F.col("id") * 3).alias("payload"))
    plain = probe.join(build, "ref")
    salted = salted_equijoin(probe, build, "ref", n_salts=4,
                             hot_threshold=10)
    cols = ["ref", "val", "payload"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_way_point_arrays_salted_matches_plain(spark):
    nodes, ways, _ = osm_tables_df(spark, 600, 120, 5)
    store = node_store(nodes)
    plain = way_point_arrays(ways, store)
    salted = way_point_arrays(ways, store, salt_hot_refs=4)
    cols = ["id", "nrefs", "npts", "lats", "lons", "ents", "whls"]
    a = {r["id"]: tuple(map(tuple, (r.lats, r.lons, r.ents, r.whls)))
         for r in plain.collect()}
    b = {r["id"]: tuple(map(tuple, (r.lats, r.lons, r.ents, r.whls)))
         for r in salted.collect()}
    assert a == b
