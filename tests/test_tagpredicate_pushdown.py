"""compile_tag_predicate_flat: identical semantics to the map-column
DNF AND the predicate actually reaches the parquet scan's
PushedFilters (the property the 100 TB layout exists for)."""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pbf2json_spark.functions.tagpredicate import (compile_tag_predicate,
                                                   compile_tag_predicate_flat)

SPEC = "lang~en+source~src3,lang~zh"
COLS = {"lang": "lang", "source": "source"}
SF = "/root/testdata/sf0.01"


def test_flat_predicate_matches_map_predicate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    flat = docs.filter(compile_tag_predicate_flat(SPEC, COLS)) \
               .select("doc_id").collect()
    docs_m = docs.withColumn("tags", F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")))
    mapped = docs_m.filter(compile_tag_predicate(SPEC)) \
                   .select("doc_id").collect()
    assert sorted(r.doc_id for r in flat) == sorted(r.doc_id for r in mapped)
    assert flat, "fixture must match rows"


def test_flat_predicate_reaches_pushed_filters(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.filter(compile_tag_predicate_flat(SPEC, COLS)) \
             .select("doc_id", "lang", "source")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", buf.getvalue())
    assert pushed and any("EqualTo(lang,zh)" in p for p in pushed), pushed


def test_flat_predicate_unpromoted_key_raises(spark):
    import pytest
    with pytest.raises(KeyError, match="promoted"):
        compile_tag_predicate_flat("building", COLS)
