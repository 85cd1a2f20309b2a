"""Robust (median/MAD) outlier detection per group — the
data-quality screen a training pipeline runs before trusting a
numeric column (z-scores break on the very outliers they hunt; the
median/MAD pair has a 50% breakdown point).

Engine-own extension family (round 12). Both medians use the
DISCRETE lower-median convention — the element at 1-based sorted
position ``ceil(n / 2)`` — so every statistic is an actual data
value and the whole computation is exact integer positioning plus
IEEE arithmetic both engines replay bit-identically (no
interpolation-flavor mismatch between Spark's `percentile` and
DuckDB's `quantile_cont`, the same reason `operators/quantiles.py`
pins the quantile_disc contract).

Scale shape: two shuffles on the group key (one per median pass),
per-group sorts bounded by the group's row count, no global order,
no driver state. For percentile fleets over unbounded group counts
the mergeable `hist_sketch_by` is the declared 100 TB variant; this
operator is the EXACT screen for bounded group families (status
codes, priorities, shards).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the classic consistency constant: MAD * 1.4826 estimates sigma
#: under normality
MAD_SIGMA = 1.4826


def _group_median(
    df: DataFrame, value_col: str, by_cols: Sequence[str], out_col: str
) -> DataFrame:
    """(by_cols..., out_col) — the discrete lower median per group:
    the value at 1-based sorted position ceil(n / 2). Ties in the
    value are position-stable: whatever order equal values take, the
    value AT the position is the same."""
    by = list(by_cols)
    w = Window.partitionBy(*by).orderBy(F.col("__v").asc())
    wn = Window.partitionBy(*by)
    ranked = df.select(
        *by,
        F.col(value_col).alias("__v"),
    ).withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    return ranked.where(
        F.col("__rn") == F.ceil(F.col("__n") / 2)
    ).select(*by, F.col("__v").alias(out_col))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by_cols: str | Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier report:
    ``(by_cols..., n, med, mad, n_outliers)`` where ``med`` is the
    group's discrete lower median of ``value_col``, ``mad`` the
    discrete lower median of ``|x - med|``, and a row is an outlier
    when ``|x - med| > k * 1.4826 * mad`` (so a group whose values
    are >50% identical — mad 0 — flags every non-median value).
    Null values are dropped."""
    by = [by_cols] if isinstance(by_cols, str) else list(by_cols)
    vals = df.select(*by, F.col(value_col).alias("__x")).where(
        F.col("__x").isNotNull()
    )
    med = _group_median(vals, "__x", by, "med")
    dev = vals.join(med, by).withColumn(
        "__d", F.abs(F.col("__x") - F.col("med"))
    )
    mad = _group_median(dev, "__d", by, "mad")
    flagged = dev.join(mad, by)
    return (
        flagged.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                (
                    F.col("__d")
                    > F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )
