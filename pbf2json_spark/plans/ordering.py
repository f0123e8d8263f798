"""Scalable global ordering utilities.

A bare ``row_number() OVER (ORDER BY k)`` funnels the whole table
through ONE task (Spark warns: "No Partition Defined for Window").
``global_seq`` computes the identical 1-based global rank with the
classic two-pass shape every distributed engine uses:

1. range-repartition + sort within partitions on the key;
2. count rows per partition (a tiny collect — one long per partition);
3. broadcast the prefix offsets and add a PER-PARTITION row_number
   (a partitioned window — fully parallel).

The result equals the single-task window whenever the key is unique
(with duplicates, ties could straddle range-partition boundaries and
tie order would depend on the split — so duplicates are rejected by
contract, not silently misranked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PART_COL = "__gs_part"
LOCAL_COL = "__gs_local"


def global_seq(df: DataFrame, order_col: str,
               out_col: str = "seq") -> DataFrame:
    """df + `out_col` = 1-based global rank of `order_col` (which must
    be unique), computed without a single-partition window.

    The range-partitioned input is persisted so the per-partition count
    pass doesn't recompute it; at 100 TB you would materialize that
    stage through TableIO instead of executor memory."""
    parts = (df.repartitionByRange(F.col(order_col))
               .sortWithinPartitions(order_col)
               .withColumn(PART_COL, F.spark_partition_id())
               .persist())
    counts = {r[PART_COL]: r["count"] for r in
              parts.groupBy(PART_COL).count().collect()}
    if not counts:  # empty input: create_map() with zero args is invalid
        return (parts.drop(PART_COL)
                .withColumn(out_col, F.lit(None).cast("long")))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.create_map(*[
        x for pid, off in offsets.items()
        for x in (F.lit(pid), F.lit(off))])
    w = Window.partitionBy(PART_COL).orderBy(order_col)
    out = (parts.withColumn(LOCAL_COL, F.row_number().over(w))
           .withColumn(out_col,
                       (F.col(LOCAL_COL)
                        + F.element_at(off_expr, F.col(PART_COL)))
                       .cast("long"))
           .drop(PART_COL, LOCAL_COL))
    return out
