"""Bucketed tables: co-located, shuffle-free equi-joins at scale.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark's
bucketing (``bucketBy`` on ``saveAsTable``) persists a table
hash-partitioned AND tagged with its distribution, so a join between
two tables bucketed on the same keys with the same bucket count plans
with NO Exchange on either side — the scan itself satisfies the
distribution requirement. ``tests/test_plans.py`` pins that plan shape.

This is the storage-side complement of the engine's runtime tactics
(broadcast hints, pair-volume repartition, AQE skew splitting): use it
for tables that are joined repeatedly on stable keys (fact tables on
their entity id, document corpora on doc_id), where one write-time
shuffle amortizes over every later join, aggregation, and dedup on the
same key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    table. Sorting on the join key additionally removes the Sort from
    later sort-merge joins; pick ``n_buckets`` so a bucket is a few
    hundred MB at target scale (buckets are the unit of join-task
    parallelism)."""
    writer = (
        df.write.mode("overwrite")
        .format(file_format)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two saved tables. When both are bucketed on ``on`` with
    equal bucket counts the plan contains no Exchange (verify with
    ``.explain``; pinned in tests)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )


def colocate(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    n_partitions: Optional[int] = None,
) -> tuple:
    """Runtime co-location for frames that are NOT bucketed: hash-
    repartition both sides identically on the join keys so the join
    (and any number of later joins/aggregations on the same keys
    against either frame) reuses one shuffle per side instead of
    re-shuffling per operation. Persist the results if reused across
    actions."""
    keys = list(keys)
    if n_partitions is None:
        n_partitions = left.sparkSession.sparkContext.defaultParallelism * 2
    return (
        left.repartition(n_partitions, *keys),
        right.repartition(n_partitions, *keys),
    )
