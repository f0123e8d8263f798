#!/usr/bin/env python3
"""Streaming-vs-batch equivalence gate (VERDICT r4 next-round #6).

The natural oracle for the stateful streaming dedup (SURVEY.md §2.7,
streaming/ingest.streaming_first_seen) is its own batch twin: replaying
a fixed corpus through the stream in micro-batches must produce exactly
the batch exact_dedup key set, with matching representatives and one
emission per key (cross-batch duplicates suppressed by state).

Setup: the documents table at $SPARK_GRAFT_SF_DIR, keyed by md5(text),
PLUS planted cross-batch duplicates — every doc_id ending in 0 is
re-emitted under a 'dup_'-prefixed id in a LATER micro-batch, so the
suppression path is exercised (the raw table has no duplicate texts).
Originals are streamed in files 0..K-1 (maxFilesPerTrigger=1), the
planted copies in file K.

Checks (all must hold):
  - streaming key set == batch-exact_dedup key set;
  - exactly one emitted row per key (no re-emission across batches);
  - emitted representatives == batch min-id representatives (originals
    sort below 'dup_' ids and each key occurs once pre-planting, so
    first-seen == min is exact here, not a luck of scheduling);
  - batch n_dups == 2 exactly for the planted keys, 1 otherwise.

Leg 2 (r5): the watermarked windowed aggregation
(streaming/ingest.windowed_cell_counts) replayed over the events table
in event-time order must equal the batch window aggregation exactly —
ordered replay means the watermark drops nothing, and update-mode
emissions folded to their last value per (window, cell) are the final
counts.

Leg 3 (r6): the watermark DROP path — planted late rows whose windows
closed below the watermark must be dropped (and a late-but-open-window
control row kept), matching a batch twin filtered by the explicit
per-batch lateness rule.  Fails if a too-late row silently lands.

Prints one JSON line; exit code 0 iff all checks pass.
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_FILES = 4


def main() -> int:
    from pyspark.sql import functions as F

    from pbf2json_spark.plans.session import build_session
    from pbf2json_spark.streaming.ingest import streaming_first_seen

    spark = build_session(app_name="streaming-equivalence", cores=8,
                          shuffle_partitions=8,
                          master=os.environ.get("SPARK_GRAFT_MASTER"))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select(F.col("doc_id").cast("string").alias("doc_id"),
                F.md5("text").alias("text_md5"))
    planted = docs.filter(F.col("doc_id") % F.lit(10) == 0) \
        .select(F.concat(F.lit("dup_"), "doc_id").alias("doc_id"),
                "text_md5")

    work = tempfile.mkdtemp(prefix="stream_eq_")
    src = os.path.join(work, "src")
    outp = os.path.join(work, "out")
    ck = os.path.join(work, "ck")
    os.makedirs(src)

    # originals split across N_FILES-1 ordered files, planted dups last
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    per = (len(pdf) + N_FILES - 2) // (N_FILES - 1)
    for i in range(N_FILES - 1):
        pdf.iloc[i * per:(i + 1) * per].to_json(
            os.path.join(src, f"b{i}.json"), orient="records", lines=True)
    planted.toPandas().to_json(
        os.path.join(src, f"b{N_FILES - 1}.json"),
        orient="records", lines=True)

    stream = (spark.readStream
              .schema("doc_id string, text_md5 string")
              .option("maxFilesPerTrigger", 1)
              .json(src))
    dedup = streaming_first_seen(stream, "text_md5", "doc_id")

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(os.path.join(outp, "data"))

    q = (dedup.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

    got = spark.read.parquet(os.path.join(outp, "data")).toPandas()

    base = docs.unionByName(planted)
    batch = base.groupBy("text_md5").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_dups")).toPandas()

    stream_keys = set(got["text_md5"])
    batch_keys = set(batch["text_md5"])
    one_per_key = len(got) == got["text_md5"].nunique()
    reps_s = dict(zip(got["text_md5"], got["rep_doc_id"]))
    reps_b = dict(zip(batch["text_md5"], batch["rep_doc_id"]))
    reps_match = reps_s == reps_b
    planted_keys = set(
        batch.loc[batch["n_dups"] > 1, "text_md5"])
    n_planted = int(planted.count())
    dups_ok = (batch["n_dups"].isin((1, 2)).all()
               and len(planted_keys) == n_planted)

    # --- leg 2: watermarked windowed aggregation vs batch twin --------
    # events replayed in EVENT-TIME ORDER in 4 micro-batches (ordered
    # replay means the 2-minute watermark never drops a row, so the
    # streaming result must equal the batch window aggregation
    # exactly); update-mode emissions are folded to the LAST value per
    # (window, cell) key.
    from pbf2json_spark.streaming.ingest import windowed_cell_counts

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", (F.pmod(F.xxhash64("user_id"), F.lit(64))).alias("cell"))
    ev_pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    wsrc = os.path.join(work, "wsrc")
    woutp = os.path.join(work, "wout")
    wck = os.path.join(work, "wck")
    os.makedirs(wsrc)
    per_w = (len(ev_pdf) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        chunk = ev_pdf.iloc[i * per_w:(i + 1) * per_w].copy()
        chunk["ts"] = chunk["ts"].astype(str)
        chunk.to_json(os.path.join(wsrc, f"w{i}.json"),
                      orient="records", lines=True)
    wstream = (spark.readStream
               .schema("ts string, cell long")
               .option("maxFilesPerTrigger", 1)
               .json(wsrc)
               .select(F.to_timestamp("ts").alias("ts"), "cell"))
    wagg = windowed_cell_counts(wstream, window="1 hour",
                                watermark="2 minutes")

    def wsink(batch_df, epoch_id):
        batch_df.withColumn("_epoch", F.lit(int(epoch_id))) \
            .write.mode("append").parquet(os.path.join(woutp, "data"))

    wq = (wagg.writeStream.foreachBatch(wsink)
          .outputMode("update")
          .option("checkpointLocation", wck)
          .trigger(availableNow=True).start())
    wq.awaitTermination(600)

    wgot = spark.read.parquet(os.path.join(woutp, "data")).toPandas()
    wgot = wgot.sort_values("_epoch").groupby(
        ["win_start", "cell"], as_index=False).last()
    wbatch = windowed_cell_counts(
        ev, window="1 hour", watermark="2 minutes").toPandas()
    sk = ["win_start", "cell"]
    a = wgot[sk + ["n"]].sort_values(sk).reset_index(drop=True)
    b = wbatch[sk + ["n"]].sort_values(sk).reset_index(drop=True)
    windows_match = (len(a) == len(b)
                     and a["win_start"].tolist() == b["win_start"].tolist()
                     and a["cell"].tolist() == b["cell"].tolist()
                     and a["n"].tolist() == b["n"].tolist())

    # --- leg 3: the watermark DROP path (VERDICT r5 missing #1) -------
    # Leg 2 replays in event-time order, so its watermark never drops a
    # row.  This leg PLANTS late data: batches advance event time by
    # hours, then later batches re-emit rows whose 1-hour window closed
    # far below the watermark — Spark MUST drop those — plus a control
    # row that is late relative to max-seen event time but whose window
    # is still open — Spark MUST keep it.  The batch twin applies the
    # explicit lateness rule: the watermark during batch i is
    # max(event time through batch i-1) - delay, and a row is kept iff
    # its window END is above that watermark.  All gaps are hours vs a
    # 2-minute delay, so <=-vs-< eviction edge cases cannot flip the
    # expectation.
    import pandas as pd

    def _mk(batch, specs):
        rows = []
        for h, m, cell, n in specs:
            for i in range(n):
                rows.append({"ts": f"2024-01-01 {h:02d}:{m:02d}:{i % 60:02d}",
                             "cell": cell, "_b": batch})
        return rows

    late_batches = [
        # b0: hours 0-1, max ts 01:20 (everything on time)
        _mk(0, [(0, 10, 1, 5), (0, 40, 2, 4), (1, 20, 1, 6)]),
        # b1: jump to hour 3 (advances the watermark to 03:23 after
        # this batch) + CONTROL late rows: ts 01:10 < max-seen 01:20,
        # but window [01:00, 02:00) is still open vs wm 01:18 -> KEPT
        _mk(1, [(3, 25, 3, 5), (1, 10, 2, 3)]),
        # b2: wm is now 03:23 -> hour-0 rows (window end 01:00) DROPPED
        _mk(2, [(0, 15, 1, 4), (3, 40, 3, 2)]),
        # b3: wm 03:38 -> hour-1 rows (window end 02:00) DROPPED
        _mk(3, [(1, 45, 2, 3), (4, 5, 1, 2)]),
    ]
    lsrc = os.path.join(work, "lsrc")
    loutp = os.path.join(work, "lout")
    lck = os.path.join(work, "lck")
    os.makedirs(lsrc)
    import time as _t
    for i, rows in enumerate(late_batches):
        p = os.path.join(lsrc, f"l{i}.json")
        pd.DataFrame(rows)[["ts", "cell"]].to_json(
            p, orient="records", lines=True)
        os.utime(p, (_t.time() + i, _t.time() + i))  # pin batch order

    lstream = (spark.readStream
               .schema("ts string, cell long")
               .option("maxFilesPerTrigger", 1)
               .json(lsrc)
               .select(F.to_timestamp("ts").alias("ts"), "cell"))
    lagg = windowed_cell_counts(lstream, window="1 hour",
                                watermark="2 minutes")

    def lsink(batch_df, epoch_id):
        batch_df.withColumn("_epoch", F.lit(int(epoch_id))) \
            .write.mode("append").parquet(os.path.join(loutp, "data"))

    lq = (lagg.writeStream.foreachBatch(lsink)
          .outputMode("update")
          .option("checkpointLocation", lck)
          .trigger(availableNow=True).start())
    lq.awaitTermination(600)

    lgot = spark.read.parquet(os.path.join(loutp, "data")).toPandas()
    lgot = lgot.sort_values("_epoch").groupby(
        ["win_start", "cell"], as_index=False).last()

    # batch twin with the explicit per-batch lateness rule
    all_rows = pd.DataFrame([r for b in late_batches for r in b])
    all_rows["ts"] = pd.to_datetime(all_rows["ts"])
    all_rows["win_start"] = all_rows["ts"].dt.floor("h")
    all_rows["win_end"] = all_rows["win_start"] + pd.Timedelta(hours=1)
    delay = pd.Timedelta(minutes=2)
    wm = pd.Timestamp.min
    keep = []
    for bi in sorted(all_rows["_b"].unique()):
        m = all_rows["_b"] == bi
        keep.append(all_rows[m & (all_rows["win_end"] > wm)])
        wm = max(wm, all_rows.loc[m, "ts"].max() - delay)
    kept = pd.concat(keep)
    twin = kept.groupby(["win_start", "cell"]).size() \
        .rename("n").reset_index()
    naive = all_rows.groupby(["win_start", "cell"]).size() \
        .rename("n").reset_index()
    n_late_expected = len(all_rows) - len(kept)

    key3 = ["win_start", "cell"]
    a3 = lgot[key3 + ["n"]].sort_values(key3).reset_index(drop=True)
    b3 = twin.sort_values(key3).reset_index(drop=True)
    a3["win_start"] = pd.to_datetime(a3["win_start"])
    late_equivalent = (len(a3) == len(b3)
                       and a3["win_start"].tolist() == b3["win_start"].tolist()
                       and a3["cell"].tolist() == b3["cell"].tolist()
                       and a3["n"].tolist() == b3["n"].tolist())
    # sensitivity: had the late rows silently landed, the result would
    # NOT equal the twin (the planted keys differ between naive/twin),
    # so late_equivalent genuinely exercises the drop path
    drop_sensitive = (n_late_expected > 0
                      and not twin.equals(naive))
    ctrl = a3[(a3["win_start"] == pd.Timestamp("2024-01-01 01:00:00"))
              & (a3["cell"] == 2)]["n"]
    late_control_landed = (len(ctrl) == 1 and int(ctrl.iloc[0]) == 3)

    result = {
        "sf_dir": SF_DIR,
        "n_docs": len(pdf),
        "n_planted_cross_batch_dups": n_planted,
        "n_batches": N_FILES,
        "streaming_emitted_rows": len(got),
        "batch_distinct_keys": len(batch_keys),
        "keys_match": stream_keys == batch_keys,
        "one_emission_per_key": bool(one_per_key),
        "reps_match": bool(reps_match),
        "planted_dup_counts_ok": bool(dups_ok),
        "windowed_events": len(ev_pdf),
        "windowed_keys": len(b),
        "windowed_counts_match": bool(windows_match),
        "late_rows_planted": int(n_late_expected),
        "late_rows_dropped": int(n_late_expected) if late_equivalent else 0,
        "late_equivalent": bool(late_equivalent),
        "late_drop_sensitive": bool(drop_sensitive),
        "late_control_landed": bool(late_control_landed),
    }
    ok = all(result[k] for k in ("keys_match", "one_emission_per_key",
                                 "reps_match", "planted_dup_counts_ok",
                                 "windowed_counts_match",
                                 "late_equivalent", "late_drop_sensitive",
                                 "late_control_landed"))
    result["equivalent"] = ok
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
