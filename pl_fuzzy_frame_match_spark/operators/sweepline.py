"""Sweep-line interval analytics: concurrency profiles over interval
sets (sessions, jobs, spans) without a single-task global window.

Engine-own extension family (round 12). The classic answer to "how
many intervals are open at time t / what was the peak concurrency"
is a +1/-1 boundary sweep with a running sum over the GLOBAL time
order — which in naive Spark is ``Window.orderBy(t)`` with no
partition: one task. This module computes the same thing with the
distributed prefix-sum shape the exact-quantile operator uses:

1. each interval emits two boundary rows (+1 at start, -1 after
   end);
2. ``global_running_sum`` range-repartitions the boundaries by the
   sweep order, sorts within partitions, collects ONE tiny row per
   partition (the partition's delta sum) to the driver as additive
   offsets, and assigns the running sum in a vectorized
   ``mapInPandas`` pass — no global sort on one task, driver state
   bounded at `num_partitions` rows;
3. the concurrency profile is then an ordinary aggregate.

Tie order at equal t: starts (+1) are applied BEFORE ends (-1), so
intervals are CLOSED on both sides — two intervals that merely touch
(a.end == b.start) count as concurrent, and a zero-length interval
reaches concurrency 1 at its instant.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SWEEP_PARTITIONS = 64


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[Column],
    value_col: str,
    sum_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the running sum of ``value_col`` over the GLOBAL
    ``order_cols`` order — distributed: range-repartition + local
    sort (the range boundaries respect the sort order, so the global
    order is partition-order concatenation), per-partition sums
    (one row per partition) collected to the driver as offsets, and
    a map-only vectorized cumsum-plus-offset pass.

    ``order_cols`` are Column expressions and may carry ``.desc()``
    orderings; they must totally order the rows for the running sum
    to be deterministic."""
    order = list(order_cols)
    # ADAPTIVE default (num_partitions=None): no explicit N on the
    # range exchange so AQE coalesces small boundary frames to the
    # advisory partition size instead of 64 fixed-cost tasks, and a
    # cluster inherits shuffle.partitions-scale parallelism; running-
    # sum values are partition-independent (same rationale as the
    # rank/quantile primitives, guide §2.2)
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions is not None
        else df.repartitionByRange(*order)
    )
    parts = (
        ranged.sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = parts.groupBy("__pid").agg(
        F.sum(value_col).alias("__s")
    ).collect()
    offsets = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__s"] or 0
    out_schema = parts.drop("__pid").schema.add(sum_col, "long")
    cols = [f.name for f in out_schema.fields]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0].reset_index(drop=True)
        )
        base = offsets[int(pdf["__pid"].iloc[0])]
        out = pdf.drop(columns=["__pid"])
        out[sum_col] = base + pdf[value_col].cumsum()
        yield out[cols]

    return parts.mapInPandas(assign, out_schema)


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Peak-concurrency sweep over closed intervals
    ``[start_col, end_col]`` (integer/epoch units): one row
    ``(n_intervals, max_concurrent, at_t)`` where ``at_t`` is the
    EARLIEST time the peak is reached. Null or inverted intervals are
    dropped. Empty input yields ONE row ``(0, NULL, NULL)`` — a real
    zero count with undefined peak (pinned by test)."""
    iv = df.select(
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__e").isNotNull()
        & (F.col("__s") <= F.col("__e"))
    )
    bounds = iv.select(
        F.col("__s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(F.col("__e").alias("t"), F.lit(-1).alias("delta"))
    )
    # starts before ends at equal t (closed intervals): delta DESC
    swept = global_running_sum(
        bounds,
        [F.col("t").asc(), F.col("delta").desc()],
        "delta",
        "open_now",
        num_partitions,
    )
    n = iv.agg(F.count(F.lit(1)).alias("n_intervals"))
    peak = swept.agg(F.max("open_now").alias("max_concurrent"))
    at = (
        swept.join(peak, F.col("open_now") == F.col("max_concurrent"))
        .agg(F.min("t").alias("at_t"))
    )
    return n.crossJoin(peak).crossJoin(at).select(
        "n_intervals", "max_concurrent", "at_t"
    )
