"""Interval (range) join — point-in-interval matching with equi keys.

Spark plans a raw inequality predicate like
``p.ts >= i.lo AND p.ts < i.hi`` as a BroadcastNestedLoopJoin (or a
cartesian + filter when neither side fits a broadcast): O(|P|·|I|)
comparisons and, at cluster scale, a replicated build side per
executor. This operator rewrites the range predicate into an
**equi-join on coarse time buckets**:

1. each point row gets one bucket id ``floor(epoch(ts) / W)``;
2. each interval row is exploded to one row per bucket its
   ``[lo, hi)`` span covers (``sequence`` + ``explode``);
3. a plain shuffled/broadcast hash equi-join on
   ``(*by_cols, bucket)`` pairs them up;
4. the exact containment predicate filters the bucket-collisions.

Each (point, interval) match is produced exactly once — the point
owns a single bucket, and the interval's exploded rows cover that
bucket once. Choosing ``bucket_width`` close to the typical interval
length keeps the explode factor ≤ 2, so the shuffle volume is
~|P| + 2·|I| rows of keys — independent of the cartesian size. This
is the same rewrite Databricks' range-join optimization and the
classic "bucketed band join" literature apply; here it is explicit
so it works on stock Spark and stays visible in `.explain()`.

The reference engine has no range/interval operator (SURVEY §2.3
"not present"); this is part of the event/time-series extension
surface alongside ``operators/asof.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _epoch(col: Column) -> Column:
    # cast-to-double keeps sub-second precision (unix_timestamp truncates);
    # the intermediate TIMESTAMP cast accepts TIMESTAMP_NTZ parquet columns
    # (NTZ -> DOUBLE is not directly castable) and is identity for TIMESTAMP
    # and for numeric epoch-seconds inputs.
    return col.cast("timestamp").cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by_cols: Sequence[str] = (),
    bucket_width: float = 3600.0,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join every ``points`` row to the ``intervals`` rows whose
    ``[start_col, end_col)`` span contains ``point_ts`` (end-exclusive
    by default) and whose ``by_cols`` match.

    ``bucket_width`` (seconds) tunes the explode factor: intervals of
    length L produce ``ceil(L / W) + 1`` join rows, so pick W ≈ the
    typical interval length. Degenerate intervals (``end < start``)
    match nothing. Column-name collisions between the two inputs other
    than ``by_cols`` must be resolved by the caller.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive seconds")
    by_cols = list(by_cols)
    overlap = (set(points.columns) & set(intervals.columns)) - set(by_cols)
    if overlap:
        raise ValueError(
            f"resolve overlapping non-key columns first: {sorted(overlap)}"
        )

    w = F.lit(float(bucket_width))
    p = points.withColumn(
        _BUCKET, F.floor(_epoch(F.col(point_ts)) / w).cast("long")
    )
    lo_b = F.floor(_epoch(F.col(start_col)) / w).cast("long")
    hi_b = F.floor(_epoch(F.col(end_col)) / w).cast("long")
    i = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))
    )

    cond = F.col(point_ts) >= F.col(start_col)
    if end_inclusive:
        cond = cond & (F.col(point_ts) <= F.col(end_col))
    else:
        cond = cond & (F.col(point_ts) < F.col(end_col))

    return (
        p.join(i, on=by_cols + [_BUCKET], how="inner")
        .filter(cond)
        .drop(_BUCKET)
    )


def interval_join_count(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by_cols: Sequence[str] = (),
    bucket_width: float = 3600.0,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Convenience aggregate: per point row (or ``group_cols``), the
    number of covering intervals — the usual "events inside windows"
    rollup without materializing the full match set downstream."""
    joined = interval_join(
        points, intervals, point_ts, start_col, end_col, by_cols, bucket_width
    )
    keys = list(group_cols) if group_cols is not None else list(points.columns)
    return joined.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_intervals"))
