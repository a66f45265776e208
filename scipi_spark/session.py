"""SparkSession factory tuned for the scipi-spark engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration is designed to hold on a multi-executor cluster: AQE handles
runtime coalescing and skew joins, shuffle partition count scales with
parallelism, and broadcast thresholds keep dimension joins shuffle-free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scipi-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    - AQE on (coalesce + skew-join): at 100 TB the static partition count is
      always wrong somewhere; AQE re-plans from runtime statistics.
    - ``spark.sql.shuffle.partitions``: 2x cores locally; on a real cluster
      this should be ~2-3x total executor cores (AQE coalesces the excess).
    - Arrow enabled: every pandas UDF path ships columnar batches.
    - session timezone UTC: deterministic timestamp semantics matching the
      DuckDB oracle (naive timestamps).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # floor AQE coalescing at the core count: byte-based coalescing
        # collapses small-input/large-compute stages (shingle self-joins,
        # band-bucket joins) onto one task
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", str(cpus))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: driver == all executors; a 25-query bench pass
        # accumulates cached/checkpointed blocks and a 16g heap put full
        # GCs inside timed queries (observed as one random multi-second
        # stall per pass). The container has 128 GiB; 32g keeps old-gen
        # headroom without inflating GC pause length unreasonably.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the events table stores TIMESTAMP(NANOS) which Spark rejects by
        # default; read as long and convert in sources.load_events
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
