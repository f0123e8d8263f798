"""SparkSession builder with the engine's scale-oriented defaults.

These configs encode the survey's §4 conclusions: let Catalyst + AQE do
the physical planning (runtime bloom-filter semi-join reduction, skew
join splitting, empty-relation propagation) and keep Python crossings
Arrow-batched.  On a real cluster the same settings apply; only
master/memory change (spark-submit provides them)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "pbf2json-spark",
                  cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict | None = None,
                  master: str | None = None,
                  profile: str | None = None) -> SparkSession:
    """`master` overrides the local[cores] default — used by the
    multi-JVM scaling legs (`local-cluster[N,cores,mem_mb]`: separate
    executor JVMs + real serialized shuffle over sockets, the closest
    this sandbox gets to a cluster; `cores` then just sizes shuffle
    partitions).

    ``profile='corpus'`` applies the hard-won settings for long,
    multi-round corpus jobs (knn_join at millions of rows, large dedup
    closures) that were previously buried in the BENCH leg runners
    (VERDICT r6 #4).  Each is overridable via env or `extra`:

    - ``spark.driver.memory`` from $SPARK_GRAFT_DRIVER_MEM (default
      48g in local mode, where the driver JVM hosts the executors):
      9.6M-point candidate-join tasks hit GCLocker retry walls on the
      8g default.
    - ``spark.cleaner.periodicGC.interval=1min``: shuffle files are
      deleted only when driver GC collects the dereferenced shuffle
      dependencies; a big heap's default 30-min cadence let ~50 GB of
      dead per-round shuffle files pile up during one 9.6M leg.  On a
      real cluster the same flag bounds executor scratch.
    - under a ``local-cluster`` master, ``spark.executor.memory`` from
      $SPARK_GRAFT_EXEC_MEM (default 22g): the master string's mem_mb
      slot is only the worker's advertised CAPACITY — executors still
      request spark.executor.memory (default 1g!) and OOM in
      spill-merge no matter what the master string says; the driver
      only coordinates, so it drops to
      $SPARK_GRAFT_CLUSTER_DRIVER_MEM (default 8g)."""
    # single-host/sandbox environments can stall for minutes resolving the
    # machine hostname; pin local loopback before the JVM launches (no-op
    # when the user already exported a real address for cluster mode)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # one BLAS thread per Python worker: N workers x default-N BLAS
    # threads oversubscribes quadratically (measured: 32-proc numpy
    # decode 2.7x SLOWER than 8-proc until pinned).  Parallelism belongs
    # to Spark tasks, not to nested BLAS pools.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
        if shuffle_partitions is None and cores is not None:
            shuffle_partitions = max(cores, 8)
    elif cores is not None:
        b = b.master(f"local[{cores}]")
        if shuffle_partitions is None:
            shuffle_partitions = max(cores, 8)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    defaults = {
        # adaptive execution: runtime re-plan, skew-join splitting,
        # empty-relation propagation (replaces the reference's pass-2 skip)
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # start every exchange fine-grained and let AQE COALESCE down,
        # instead of capping granularity at spark.sql.shuffle.partitions:
        # with partitions == 2 x cores, one knn_join candidate-join
        # partition at 2.4M points held a hot-cell cluster whose join
        # OUTPUT (not input — input rows were even) ran 3.3x the median
        # task (event-log profile, BENCH/BASELINE.md r6), idling the
        # other cores for half the stage.  256 initial partitions give
        # AQE the granularity to spread hot cells and to merge the
        # small remainder to ~64 MB targets; gate-scale queries still
        # coalesce to a handful of tasks, so their floors are unchanged.
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
        # ... and coalesce to 16 MB targets, not the 64 MB default: the
        # knn_join candidate-join stage at 2.4M coalesced to 20 tasks
        # with a 3.6x duration spread (6.9-25.1 s, event-log task
        # profile) — 20 uneven tasks pack 8 cores at ~65% and cap a
        # 32-core run at 20-way parallelism outright (the measured
        # 8->32 cliff).  16 MB quadruples the task count at corpus
        # scale so waves pack; gate-scale stages sit far below 16 MB
        # and still coalesce to a handful of tasks.
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        # runtime bloom filters = the reference's bitmask semi-joins (§4)
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # Arrow everywhere Python is crossed
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # Unix-domain sockets for the JVM<->Python worker channel: on this
        # sandbox's virtual NIC, TCP loopback throughput to 32 concurrent
        # workers is erratic (73-330 MB/s); UDS measured ~1.1 GB/s
        "spark.python.unix.domain.socket.enabled": "true",
        # broadcast threshold: dimension tables (polygons, queries) fly
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # trimTags can collide keys after whitespace strip; Go map insert
        # order is nondeterministic there, LAST_WIN is our deterministic pick
        "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "8g",
    }
    if cores is not None:  # local mode: loopback binding avoids DNS stalls
        defaults.setdefault("spark.driver.bindAddress", "127.0.0.1")
        defaults.setdefault("spark.driver.host", "127.0.0.1")
    if profile == "corpus":
        defaults["spark.cleaner.periodicGC.interval"] = "1min"
        if master is not None and master.startswith("local-cluster"):
            defaults["spark.executor.memory"] = os.environ.get(
                "SPARK_GRAFT_EXEC_MEM", "22g")
            defaults["spark.driver.memory"] = os.environ.get(
                "SPARK_GRAFT_CLUSTER_DRIVER_MEM", "8g")
        else:
            defaults["spark.driver.memory"] = os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g")
    elif profile is not None:
        raise ValueError(f"unknown session profile {profile!r} "
                         f"(available: 'corpus')")
    if extra:
        defaults.update(extra)
    for k, v in defaults.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark


def warm_python_workers(spark: SparkSession, parallelism: int | None = None) -> None:
    """Pre-fork the Python UDF worker pool.

    The FIRST job that crosses into Python spawns one worker per task
    slot; on sandboxed filesystems that import storm is dominated by
    kernel time (observed: ~25 s at 96% sys for 32 slots) and lands
    inside whatever query runs first.  One trivial pass per eval type
    (scalar pandas_udf + mapInPandas) moves that cost to session setup;
    workers are reused afterwards (spark.python.worker.reuse)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n = parallelism or spark.sparkContext.defaultParallelism

    def _id_map(batches):
        for pdf in batches:
            yield pdf

    df = spark.range(n * 2, numPartitions=n * 2)
    df.mapInPandas(_id_map, "id long").count()

    @F.pandas_udf(T.LongType())
    def _id_udf(s):
        return s

    df.select(_id_udf("id")).count()


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode equivalent of
    ``spark-submit --py-files pbf2json_spark.zip``).  Without it, pandas
    UDF closures referencing the package fail to unpickle on workers
    whose PYTHONPATH doesn't include the repo."""
    import zipfile

    import pbf2json_spark

    # spark-submit --py-files already distributed the package?  Adding
    # a second zip with the same name makes executors fail with
    # "exists and does not match contents" — skip instead.
    try:
        existing = spark.sparkContext._jsc.sc().listFiles()
        for i in range(existing.size()):
            if "pbf2json_spark.zip" in str(existing.apply(i)):
                return
    except Exception:
        pass

    pkg_dir = os.path.dirname(os.path.abspath(pbf2json_spark.__file__))
    zip_path = os.path.join(spark.sparkContext._temp_dir, "pbf2json_spark.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)
