"""Table profiling — the ANALYZE-style per-column statistics pass a
pipeline runs before trusting (or planning over) a new 100 TB table:
row count, null count, exact distinct count, and typed min/max per
column, in long format (one row per column).

Engine-own extension family (round 12). Design choice for scale:
ONE AGGREGATION PER COLUMN, unioned — not one wide aggregate with N
`count(distinct ...)`s. Multiple distinct aggregates in a single
Spark aggregate expand the input N-fold before shuffling (the Expand
operator materializes one copy of every row per distinct clause);
per-column aggregates instead each scan exactly one column
(column-pruned parquet reads — the same total bytes as one full-width
scan) and shuffle one partial-state row per partition. Exact distinct
counts are the point of a profiling pass; `hll_distinct_report` is
the sketch variant when ±2% suffices.

Cross-engine value discipline: counts are BIGINT; numeric min/max
are surfaced as DOUBLE and string min/max as strings, in separate
columns (NULL where the type does not apply) — no double->string
formatting, whose rendering differs between engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Long-format profile of ``cols`` (default: every column of a
    profilable type): one row per column with
    ``(column, n, n_null, n_distinct, min_num, max_num, min_str,
    max_str)``. ``n_distinct`` excludes nulls (the SQL
    ``count(distinct col)`` contract). Numeric columns fill
    ``min_num/max_num`` (cast to double); string columns fill
    ``min_str/max_str``; other types (timestamps, binaries) report
    counts only."""
    dtypes = dict(df.dtypes)
    names = list(cols) if cols is not None else list(df.columns)
    unknown = [c for c in names if c not in dtypes]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    parts = []
    for c in names:
        dt = dtypes[c]
        is_num = dt in _NUMERIC
        is_str = dt == "string"
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                (
                    F.min(c).cast("double")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.max(c).cast("double")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (F.min(c) if is_str else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (F.max(c) if is_str else F.lit(None).cast("string")).alias(
                    "max_str"
                ),
            ).select(F.lit(c).alias("column"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
