"""Structured Streaming ingest (SURVEY.md §2.7: the reference is batch
with streaming *delivery*; our engine adds a real incremental-ingest
path for the images table).

- ``stream_images``: an unbounded deterministic images stream (rate
  source -> mapInPandas synthesis; seq = rate value, so replays are
  idempotent by construction).
- ``ingest_images``: writeStream/foreachBatch into TableIO-backed
  storage, attaching geo + cell columns per micro-batch and recording
  per-batch row-count metrics (the streaming twin of the stage
  checkpoint); exactly-once via the streaming checkpointLocation +
  epoch-keyed output dirs.
- ``windowed_cell_counts``: event-time windowed aggregation with a
  watermark — late data handling for the geo-event stream.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def images_from_seq_stream(seq_stream: DataFrame,
                           seq_col: str = "id") -> DataFrame:
    """Turn any streaming DF of sequence numbers into the deterministic
    images stream (seq -> full image row), so replays are idempotent by
    construction.  Works with rate, file, or Kafka-offset sources."""
    from ..sources.synth import gen_image_row, spark_schemas

    schema = spark_schemas()["images"]

    def gen(batches):
        for pdf in batches:
            rows = [gen_image_row(int(s)) for s in pdf[seq_col]]
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return seq_stream.select(seq_col).mapInPandas(gen, schema)


def stream_images(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Unbounded images stream from the rate source."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    return images_from_seq_stream(rate.select(F.col("value").alias("id")))


def ingest_images(images_stream: DataFrame, out_dir: str,
                  checkpoint_dir: str, res_list=(9, 12),
                  trigger_available_now: bool = True):
    """Micro-batch ingest: attach geo/cells, append parquet, record
    per-batch metrics to <out_dir>/_stream_metrics.jsonl."""
    from ..operators.spatial import attach_geo

    os.makedirs(out_dir, exist_ok=True)
    metrics_path = os.path.join(out_dir, "_stream_metrics.jsonl")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        geo = attach_geo(batch_df, res_list=res_list)
        n = geo.count()
        (geo.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}")))
        with open(metrics_path, "a") as f:
            f.write(json.dumps({"epoch": int(epoch_id), "rows": int(n)}) + "\n")

    writer = (images_stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_first_seen(stream: DataFrame, key_col: str,
                         id_col: str) -> DataFrame:
    """Stateful streaming exact-dedup: emits ONE row per never-before-
    seen key — (key, representative id, batch-local dup count) — and
    suppresses every later occurrence across micro-batches (state =
    per-key running count, kept in the state store, recovered from the
    streaming checkpoint on restart).  This is exact_dedup's streaming
    twin via applyInPandasWithState: the custom stateful operator shape
    for training-data ingest where duplicates must be dropped ONLINE,
    not in a nightly batch.

    Grouping is by the content key, so state is partitioned exactly
    like the batch groupBy and hot keys shard across the state store's
    shuffle partitions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"{key_col} string, rep_{id_col} string, "
                  f"n_in_batch long")
    state_schema = "n long"

    def first_seen(key, pdfs, state):
        seen_before = state.exists
        prev = state.get[0] if seen_before else 0
        rep = None
        n = 0
        for pdf in pdfs:
            if rep is None and len(pdf):
                rep = str(pdf[id_col].iloc[0])
            n += len(pdf)
        state.update((prev + n,))
        if not seen_before and rep is not None:
            yield pd.DataFrame({key_col: [key[0]],
                                f"rep_{id_col}": [rep],
                                "n_in_batch": [n]})

    return (stream.groupBy(key_col)
            .applyInPandasWithState(first_seen, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def windowed_cell_counts(geo_events: DataFrame, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Event-time windowed counts per cell with late-data watermarking.
    geo_events: streaming DF with (ts timestamp, cell long)."""
    return (geo_events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "cell")
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"), "cell", "n"))
