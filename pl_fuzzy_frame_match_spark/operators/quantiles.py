"""Exact distributed quantiles — no global sort, no approximation.

Spark's built-in answers are either `percentile_approx` (approximate)
or an exact `percentile` that aggregates per-group arrays; neither
gives the classic "element at position ceil(q*n)" discrete quantile
over a 100 TB column without concentrating data. This operator
computes EXACT discrete quantiles with the same machinery the
suffix-dedup rank primitive uses:

1. one groupBy collapses the column to (value, count) — duplicate-
   heavy columns (prices, status codes) shrink by their duplication
   factor before anything is ordered;
2. a range-repartition + within-partition sort orders the distinct
   values without a single-task `Window.orderBy` (equal values cannot
   straddle a range boundary);
3. per-partition count sums (one tiny row per partition) collect to
   the driver and become additive offsets — the cumulative count of
   every value is then a map-side running sum plus its partition's
   offset;
4. the requested positions ``max(1, ceil(q * n))`` (the
   `quantile_disc` contract, pinned empirically) broadcast-join
   against the cumulative frame: the quantile value is the unique
   value whose count range [cum - cnt + 1, cum] covers the position.

Every step is deterministic integer arithmetic except the
``q * n`` product, which both engines evaluate as the same IEEE
double — the oracle replays the position formula explicitly rather
than relying on DuckDB's internal quantile implementation.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANTILE_PARTITIONS = 64


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    num_partitions: int = QUANTILE_PARTITIONS,
) -> DataFrame:
    """(q, value, position, n) rows — the EXACT discrete quantile of
    ``value_col`` for each q in ``qs``: the element at 1-based sorted
    position ``max(1, ceil(q * n))``, duplicates counted."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    spark = df.sparkSession
    vals = df.select(F.col(value_col).alias("__v")).where(
        F.col("__v").isNotNull()
    )
    counts = vals.groupBy("__v").agg(F.count(F.lit(1)).alias("__cnt"))
    parts = (
        counts.repartitionByRange(num_partitions, "__v")
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = parts.groupBy("__pid").agg(F.sum("__cnt").alias("__s")).collect()
    offsets, acc = {}, 0
    for row in sorted(psums, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__s"]
    n = acc
    out_schema = (
        f"q double, {value_col} {df.schema[value_col].dataType.simpleString()},"
        " position long, n long"
    )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the offsets map is tiny (one entry per partition): bake it into
    # a literal CASE instead of a Python UDF so the pass stays codegen
    off_expr = F.lit(0)
    for pid, o in offsets.items():
        off_expr = F.when(F.col("__pid") == pid, F.lit(o)).otherwise(off_expr)
    cum = parts.select(
        "__v",
        "__cnt",
        (F.sum("__cnt").over(w) + off_expr).alias("__cum"),
    )
    targets = spark.createDataFrame(
        [(float(q), max(1, math.ceil(q * n))) for q in qs],
        "q double, position long",
    )
    return (
        cum.join(
            F.broadcast(targets),
            (F.col("__cum") >= F.col("position"))
            & (F.col("__cum") - F.col("__cnt") < F.col("position")),
        )
        .select(
            "q",
            F.col("__v").alias(value_col),
            "position",
            F.lit(n).cast("long").alias("n"),
        )
    )
