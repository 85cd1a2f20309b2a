"""As-of (nearest-prior) join — an operator Spark's DataFrame API
lacks natively, built as the classic union + keyed-window composition:

1. tag both inputs and union them on (by_cols, ts, side, payload);
2. one window per ``by`` key ordered by (ts, side) carries the most
   recent build-side values forward with ``last(..., ignorenulls)``;
3. keep only probe-side rows.

ONE shuffle total (the window partitioning) — versus the join+groupBy
formulations that shuffle both inputs and then aggregate candidate
matches. Build-side rows sort before probe rows at equal timestamps,
so the match is backward-INCLUSIVE (same instant matches), exactly
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` semantics, which is the
correctness oracle. ``direction="forward"`` flips the order for
nearest-subsequent matches (oracle: ``l.ts <= r.ts``).

The reference has no as-of operator; this is part of the engine's
event/time-series extension surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ROW = "__asof_row"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach the ``value_cols`` of the
    ``right`` row with the greatest timestamp <= left's (backward,
    inclusive; ``forward`` = smallest timestamp >=). Unmatched rows
    keep null values (left-join semantics). ``right`` should be unique
    per (by_cols, ts) — pre-aggregate otherwise, or the latest row in
    (ts, value) sort order wins deterministically."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*by_cols, ts_col)
        ]
    by_cols = list(by_cols)

    probe = left.select(
        *by_cols,
        F.col(ts_col).alias(ts_col),
        F.lit(1).alias(_SIDE),
        F.struct(*left.columns).alias(_ROW),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    build = right.select(
        *by_cols,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(probe.schema[_ROW].dataType).alias(_ROW),
        *value_cols,
    )
    unioned = probe.unionByName(build)

    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(ts_col).desc(), F.col(_SIDE).asc()]
    win = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        _SIDE,
        _ROW,
        *[
            F.last(F.col(c), ignorenulls=True).over(win).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col(_SIDE) == 1).select(
        F.col(_ROW + ".*"), *value_cols
    )
