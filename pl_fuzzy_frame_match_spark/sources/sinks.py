"""Sinks & scratch persistence — the Spark-native answers to the
reference's spill machinery (/root/reference/pl_fuzzy_frame_match/
_utils.py:32-118: size-branched Arrow IPC writes + cache-to-temp).

On Spark, intra-query spilling is native (shuffle spill, checkpoint);
what remains worth owning is (a) the durable sink with scale-sane file
sizing, and (b) plan-truncating scratch persistence that outlives one
job — the reference's ``cache_polars_frame_to_temp`` equivalent for
cross-job reuse.
"""

from __future__ import annotations

import os
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

# ~128 MB row groups parallelize reads without small-file pressure;
# expose as a knob because optimal size tracks downstream readers
DEFAULT_MAX_RECORDS_PER_FILE = 5_000_000


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Optional[Sequence[str]] = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Durable parquet sink. ``partition_by`` buckets the layout for
    partition-pruned reads (e.g. date/lang for a document corpus);
    ``maxRecordsPerFile`` bounds file size so a 100 TB write does not
    produce unreadable multi-GB files or a million tiny ones. The
    reference's small/large write branching (_utils.py:32-84) dissolves
    into these two writer options."""
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def cache_to_scratch(
    df: DataFrame, scratch_dir: str, spark: Optional[SparkSession] = None
) -> DataFrame:
    """Write ``df`` to a UUID-named parquet directory under
    ``scratch_dir`` and return a fresh DataFrame scanning it — full
    plan truncation that survives across jobs and sessions (the
    reference's ``cache_polars_frame_to_temp``, _utils.py:87-118).

    Use ``localCheckpoint`` instead when truncation only needs to live
    as long as the session; use this when a downstream job, a retry, or
    another session must re-read the intermediate."""
    spark = spark or df.sparkSession
    path = os.path.join(scratch_dir, f"scratch-{uuid.uuid4().hex}.parquet")
    df.write.mode("error").parquet(path)
    return spark.read.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Incremental partitioned overwrite: replace ONLY the partitions
    present in ``df``, leave every other partition untouched (dynamic
    partition overwrite). This is the daily-ingest write path at
    corpus scale — a static overwrite would clobber the whole table,
    and append-only accumulates duplicates on re-runs. Scoped to this
    one write via the writer option (no session-level conf mutation)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    partition_by: Optional[Sequence[str]] = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Durable sink with WITHIN-file clustering: rows sorted by
    ``cluster_by`` inside each task before writing, so parquet
    row-group min/max statistics become selective and downstream
    range/point predicates skip row groups at the scan. Sorting is
    per-partition (``sortWithinPartitions``) — no global sort, no
    extra shuffle beyond what the caller already has."""
    out = df.sortWithinPartitions(*cluster_by)
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> int:
    """Rewrite a parquet directory into ~target-sized files (the
    small-file compaction a long-running ingest needs: a table written
    by many incremental jobs decays into thousands of KB-files whose
    open/footer overhead dominates scans). Reads, coalesces to
    ``ceil(rows / target)`` files, rewrites atomically via a temp dir
    + rename. Returns the file count after compaction."""
    import shutil

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_records_per_file))
    tmp = f"{path}.compact-{uuid.uuid4().hex}"
    df.repartition(n_files).write.mode("error").option(
        "maxRecordsPerFile", str(target_records_per_file)
    ).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    path: Optional[str] = None,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed/external table write: rows are hash-distributed
    into ``n_buckets`` files per partition ON the join/agg key at WRITE
    time, so every later equi-join or aggregation between tables
    bucketed the same way runs with ZERO shuffle — the exchange is
    prepaid once at ingest and amortized over every downstream query.
    ``sort_by`` additionally sorts within buckets, removing the
    sort from sort-merge joins too.

    This is the 100 TB co-location strategy for the hot join keys of a
    corpus (doc_id, user_id, orderkey): at a thousand executors,
    re-shuffling 100 TB per query is the dominant cost — a bucketed
    layout turns it into a scan-local join (see
    tests/test_plans.py for the zero-Exchange plan guard). Bucketed
    tables require the catalog (``saveAsTable``): plain
    ``.parquet(path)`` writes would lose the bucket metadata."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_evolved(spark: SparkSession, *paths: str):
    """Read a parquet table whose schema EVOLVED across ingest batches
    (columns added over time): ``mergeSchema`` unions the per-file
    schemas and back-fills missing columns with nulls — the standard
    contract for a long-lived corpus directory written by successive
    pipeline versions. Schema merging reads footers only (no data
    pass); predicate/column pushdown still applies to the merged
    scan."""
    return (
        spark.read.option("mergeSchema", "true").parquet(*paths)
    )
