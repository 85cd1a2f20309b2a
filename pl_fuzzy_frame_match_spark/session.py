"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same config block is what we'd
ship to a 1000-executor cluster (AQE on, skew-join handling on, Arrow
for the pandas-UDF kernels, UTC so timestamp semantics match the DuckDB
oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pl-fuzzy-frame-match-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches default to 10k rows; per-batch Python fixed
        # cost then dominates scan-shaped pandas UDFs (measured: the
        # Bloom probe over 60M longs drops 42s -> 13s at 256k rows).
        # 64k balances that against per-thread batch memory for wide
        # document rows (64k x ~1KB text = 64MB per in-flight batch).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode driver == the only JVM: all 32 task threads share
        # this heap, so size it like an executor fleet, not a driver
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.crossJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
