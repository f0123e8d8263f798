"""global_seq == single-partition row_number on unique keys, without
the single-task window."""

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from pbf2json_spark.plans.ordering import global_seq


def test_global_seq_matches_window(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(23)))
    keys = rng.permutation(50_000).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"k": keys})).repartition(16)
    got = global_seq(df, "k", out_col="seq")
    want = df.withColumn("seq", F.row_number().over(
        Window.orderBy("k")).cast("long"))
    g = {r.k: r.seq for r in got.collect()}
    w = {r.k: r.seq for r in want.collect()}
    assert g == w
    assert g[int(keys.min())] == 1 and g[int(keys.max())] == 50_000


def test_global_seq_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    out = global_seq(df, "k")
    assert out.count() == 0 and "seq" in out.columns


def test_global_seq_rejects_duplicates(spark):
    import pytest
    from pyspark.sql import functions as F
    df = spark.range(0, 100).select((F.col("id") % 50).alias("k"))
    with pytest.raises(Exception, match="duplicate"):
        global_seq(df, "k").collect()
