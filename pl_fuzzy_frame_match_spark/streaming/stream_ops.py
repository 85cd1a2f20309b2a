"""Event-stream operators: tumbling-window aggregation and gap-based
sessionization, each with a batch formulation (SQL-oracle-checkable)
and a Structured Streaming formulation (watermark + windowed state).

The reference has no streaming surface (its "streaming engine" is an
out-of-core batch executor — SURVEY §2.7); these operators are part of
the engine's training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_seconds: int = 300,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count/sum per key (batch). Window start is
    exposed as epoch seconds so results are timezone-representation
    independent."""
    win = F.window(F.col(ts_col), f"{window_seconds} seconds")
    return (
        events.groupBy(win.alias("__w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("__w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark,
    events_path: str,
    schema,
    window_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Structured Streaming variant of :func:`windowed_event_counts`:
    file-source stream -> watermark -> windowed aggregation. Late rows
    beyond the watermark are dropped; emit with ``writeStream`` in
    append or update mode."""
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(events_path)
    )
    win = F.window(F.col("ts"), f"{window_seconds} seconds")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("__w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("__w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the
    user's inter-event gap exceeds ``gap_seconds``. Classic
    lag -> flag -> running-sum window pattern; shuffles once on the
    user key and reuses that partitioning for all three window steps.
    Returns one row per session with bounds and event count."""
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    epoch = F.unix_timestamp(F.col(ts_col))
    with_gap = events.withColumn(
        "__new_session",
        F.when(
            epoch - F.lag(epoch).over(w_user) > gap_seconds, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    with_session = with_gap.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_session.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.min(ts_col)).alias("session_start"),
            F.unix_timestamp(F.max(ts_col)).alias("session_end"),
        )
    )
