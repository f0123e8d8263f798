"""Stage checkpointing: content-keyed idempotent resume (north rule:
"every stage checkpoints per-partition lineage + row-count metrics ...
so runs resume idempotently").

A stage's content key hashes (stage name, config, upstream keys).  If
the checkpoint table already carries that key, the stage is skipped and
its output read back; otherwise the stage computes, writes through
TableIO (which records per-partition lineage), and returns the
materialized table.  Re-running a failed job therefore re-executes only
the stages whose inputs or config changed — the reference's three-pass
restartability (it could re-use its LevelDB dir) generalized to a DAG.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.tableio import TableIO


def content_key(stage: str, config: dict, upstream_keys: list[str]) -> str:
    blob = json.dumps({"stage": stage, "config": config,
                       "upstream": sorted(upstream_keys)},
                      sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


class CheckpointRunner:
    def __init__(self, spark: SparkSession, io: TableIO):
        self.spark = spark
        self.io = io
        self.metrics: dict[str, dict] = {}

    def stage(self, name: str, config: dict, upstream_keys: list[str],
              compute: Callable[[], DataFrame],
              partition_by: list[str] | None = None) -> tuple[DataFrame, str]:
        """Run-or-resume one stage; returns (output df, content key)."""
        key = content_key(name, config, upstream_keys)
        if self.io.exists(name):
            m = self.io.manifest(name)
            if m.get("content_key") == key:
                self.metrics[name] = {**m, "resumed": True}
                return self.io.read(self.spark, name), key
        df = compute()
        manifest = self.io.write(df, name, content_key=key,
                                 partition_by=partition_by)
        self.metrics[name] = {**manifest, "resumed": False}
        return self.io.read(self.spark, name), key
