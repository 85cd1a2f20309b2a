"""Parquet table sources for the driver's TPC-H-ish test data.

The reference reads in-memory Polars frames; the Spark engine's native
source is columnar Parquet (predicate pushdown + column pruning reach
the scan via Catalyst — verify with ``df.explain``: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # the events table historically stored TIMESTAMP(NANOS), which
        # Spark's parquet reader surfaces as a long when
        # spark.sql.legacy.parquet.nanosAsLong is set; current test data
        # stores timestamp[us], which reads natively. Dispatch on the
        # dtype actually read so both layouts work (the DuckDB oracle
        # uses epoch_ns(ts), precision-agnostic, so instants agree).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
