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

# legacy explicit partition count; the default is now ADAPTIVE
# (num_partitions=None): the range exchange is emitted without an
# explicit N so AQE coalesces the (value, count) frame to the advisory
# partition size — quantile VALUES are partition-independent (offsets
# accumulate per partition in range order regardless of boundaries), so
# the output is identical for any partitioning (guide §2.2)
QUANTILE_PARTITIONS = 64


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    num_partitions: int | None = None,
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
    ranged = (
        counts.repartitionByRange(num_partitions, "__v")
        if num_partitions is not None
        else counts.repartitionByRange("__v")
    )
    parts = (
        ranged.sortWithinPartitions("__v")
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


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram sketch (round 11) — the quantile path
# that needs NO range repartition and NO ordering at all: one groupBy
# over a bounded bin keyspace (map-side combine collapses each input
# partition to <= n_bins rows before the only shuffle), sketches merge
# by plain cell addition, and any quantile reads off the cumulative
# bin counts with a deterministic (hi - lo) / n_bins value-space error
# bound. The mergeable sibling of `exact_quantiles` (exact rank, two
# ordered passes) — at 100 TB you roll per-shard histograms up a tree
# and never move the column itself.
# ---------------------------------------------------------------------------


def hist_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """(bin, cnt) fixed-width histogram of ``value_col`` over
    [lo, hi): bin = floor((x - lo) / (hi - lo) * n_bins), clamped to
    [0, n_bins - 1] so out-of-range values land in the edge bins
    (documented saturation, never dropped). Nulls excluded. Integer
    bin arithmetic is exact in both engines, so the sketch replays
    cell-for-cell in SQL."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(int(n_bins)))
    clamped = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(int(n_bins) - 1).cast("long"), raw.cast("long")),
    )
    return (
        df.where(x.isNotNull())
        .select(clamped.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-sum merge — the sketch of the concatenated inputs,
    exactly (bin counts are additive)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for nxt in sketches[1:]:
        out = out.unionByName(nxt)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """(q, bin, upper_edge, position, n) per requested quantile: the
    first bin whose cumulative count reaches position
    ``max(1, ceil(q * n))`` (the same discrete-position contract as
    `exact_quantiles`), reported as the bin's UPPER edge — a value
    that is >= the exact quantile and overshoots by at most one bin
    width. The sketch is <= n_bins rows, so the cumulative sum and
    the position join are broadcast-scale no matter how much data the
    sketch summarizes.

    An EMPTY sketch yields zero rows — the same convention as
    `exact_quantiles` on an all-null column (ADVICE r11: without the
    guard the total aggregate is NULL, position collapses to
    greatest(1, NULL) = 1 and the left join emits one NULL row per
    q). `hist_quantiles_by` already follows the convention by
    construction: groups absent from the sketch produce no total row
    and therefore no output rows."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    spark = sketch.sparkSession
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    # <= n_bins rows: the single-task window is bounded by construction
    cum = sketch.select(
        "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    total = sketch.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n")
    )
    pos = spark.createDataFrame(
        [(float(q),) for q in qs], "q double"
    ).crossJoin(F.broadcast(total)).where(F.col("n") > 0).select(
        "q",
        "n",
        F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n"))
        ).alias("position"),
    )
    width = float(hi - lo) / float(n_bins)
    return (
        pos.join(
            F.broadcast(cum),
            (F.col("cum") >= F.col("position"))
            & (F.col("cum") - F.col("cnt") < F.col("position")),
            "left",
        )
        .select(
            "q",
            "bin",
            F.round(
                F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width), 6
            ).alias("upper_edge"),
            "position",
            "n",
        )
    )


def hist_sketch_by(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Grouped histogram sketches: (group_cols..., bin, cnt) — one
    independent fixed-bin histogram PER GROUP in a single groupBy
    pass (<= n_bins surviving rows per group, map-side combine); the
    grouped sibling of :func:`hist_sketch`, same clamped binning,
    same exact cell-sum mergeability. The fleet answer to per-group
    quantiles: GROUP BY g + an ordered percentile over a 100 TB
    column becomes bounded cells per group."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    x = F.col(value_col).cast("double")
    raw = F.floor(
        (x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(int(n_bins))
    )
    clamped = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(int(n_bins) - 1).cast("long"), raw.cast("long")),
    )
    return (
        df.where(x.isNotNull())
        .select(*group_cols, clamped.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles_by(
    sketch: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """(group_cols..., q, bin, upper_edge, position, n) — the grouped
    form of :func:`hist_quantiles`: per-group cumulative bin counts
    (a window PARTITIONED by the group, <= n_bins rows each — no
    single-partition collapse), per-group totals, and the position
    join carries the group equality so it plans as a hash join with
    the range as a post-filter."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    spark = sketch.sparkSession
    gcols = list(group_cols)
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketch.select(
        *gcols, "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    total = sketch.groupBy(*gcols).agg(F.sum("cnt").alias("n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    pos = total.crossJoin(F.broadcast(qdf)).select(
        *gcols,
        "q",
        "n",
        F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n"))
        ).alias("position"),
    )
    width = float(hi - lo) / float(n_bins)
    cond = (
        (F.col("c.cum") >= F.col("p.position"))
        & (F.col("c.cum") - F.col("c.cnt") < F.col("p.position"))
    )
    for g in gcols:
        cond = cond & (F.col(f"p.{g}") == F.col(f"c.{g}"))
    return (
        pos.alias("p")
        .join(cum.alias("c"), cond, "left")
        .select(
            *[F.col(f"p.{g}") for g in gcols],
            "p.q",
            "c.bin",
            F.round(
                F.lit(float(lo)) + (F.col("c.bin") + 1) * F.lit(width), 6
            ).alias("upper_edge"),
            "p.position",
            "p.n",
        )
    )
