"""TableIO manifests, idempotent stage resume, and streaming ingest."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from pbf2json_spark.plans.checkpoint import CheckpointRunner, content_key
from pbf2json_spark.sources.tableio import TableIO


def test_tableio_roundtrip_and_lineage(spark, tmp_path):
    io = TableIO(str(tmp_path / "tables"))
    df = spark.range(1000).withColumn("x", F.col("id") * 2).repartition(4)
    m = io.write(df, "t1", content_key="k1")
    assert m["rows"] == 1000
    assert m["partitions"] == 4
    assert sum(m["partition_rows"].values()) == 1000
    back = io.read(spark, "t1")
    assert back.count() == 1000
    assert set(back.columns) == {"id", "x"}
    assert io.manifest("t1")["content_key"] == "k1"


def test_checkpoint_resume_skips_unchanged_stage(spark, tmp_path):
    io = TableIO(str(tmp_path / "ck"))
    runner = CheckpointRunner(spark, io)
    calls = []

    def compute():
        calls.append(1)
        return spark.range(100).withColumn("y", F.col("id") + 1)

    df1, k1 = runner.stage("s1", {"p": 1}, [], compute)
    assert df1.count() == 100 and calls == [1]
    assert runner.metrics["s1"]["resumed"] is False

    runner2 = CheckpointRunner(spark, io)
    df2, k2 = runner2.stage("s1", {"p": 1}, [], compute)
    assert df2.count() == 100 and calls == [1]  # NOT recomputed
    assert k1 == k2
    assert runner2.metrics["s1"]["resumed"] is True

    # config change -> recompute
    df3, k3 = runner2.stage("s1", {"p": 2}, [], compute)
    assert calls == [1, 1] and k3 != k1


def test_content_key_sensitivity():
    a = content_key("s", {"x": 1}, ["u1"])
    assert a == content_key("s", {"x": 1}, ["u1"])
    assert a != content_key("s", {"x": 2}, ["u1"])
    assert a != content_key("s", {"x": 1}, ["u2"])
    assert a != content_key("t", {"x": 1}, ["u1"])


def test_streaming_ingest_available_now(spark, tmp_path):
    from pbf2json_spark.sources.synth import spark_schemas
    from pbf2json_spark.streaming.ingest import (images_from_seq_stream,
                                                 ingest_images)
    # deterministic bounded stream: a parquet dir of seq values read as
    # a file stream (one micro-batch per file with maxFilesPerTrigger)
    seq_dir = str(tmp_path / "seqs")
    spark.range(0, 96).coalesce(2).write.parquet(seq_dir)
    seq_stream = (spark.readStream.schema("id long")
                  .option("maxFilesPerTrigger", 1).parquet(seq_dir))
    stream = images_from_seq_stream(seq_stream)
    assert stream.isStreaming
    assert stream.schema == spark_schemas()["images"]

    out = str(tmp_path / "ingest")
    ck = str(tmp_path / "ck_stream")
    q = ingest_images(stream, out, ck)
    q.awaitTermination(180)
    metrics = [json.loads(l) for l in
               open(os.path.join(out, "_stream_metrics.jsonl"))]
    total = sum(m["rows"] for m in metrics)
    assert total == 96
    assert len(metrics) >= 2  # multiple micro-batches
    epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
    df = spark.read.parquet(*[os.path.join(out, e) for e in epochs])
    assert df.count() == 96
    assert {"image_id", "bytes", "lat", "lon", "cell_r9", "cell_r12"} <= set(df.columns)

    # exactly-once on restart: re-running with the same checkpoint adds
    # nothing (all offsets consumed)
    q2 = ingest_images(images_from_seq_stream(
        spark.readStream.schema("id long")
             .option("maxFilesPerTrigger", 1).parquet(seq_dir)), out, ck)
    q2.awaitTermination(120)
    metrics2 = [json.loads(l) for l in
                open(os.path.join(out, "_stream_metrics.jsonl"))]
    assert sum(m["rows"] for m in metrics2) == 96


def test_windowed_cell_counts_batch_semantics(spark):
    """Check the windowed agg logic on a bounded frame (streaming-
    compatible expression)."""
    from pbf2json_spark.streaming.ingest import windowed_cell_counts
    rows = [("2026-01-01 00:00:10", 1), ("2026-01-01 00:00:50", 1),
            ("2026-01-01 00:01:10", 2)]
    df = spark.createDataFrame(rows, "ts_s string, cell long") \
              .select(F.to_timestamp("ts_s").alias("ts"), "cell")
    out = {(r.win_start.minute, r.cell): r.n
           for r in windowed_cell_counts(df).collect()}
    assert out == {(0, 1): 2, (1, 2): 1}
