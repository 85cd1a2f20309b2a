"""Arrow IPC (Feather v2) source & sink.

The reference's on-disk interchange format is Arrow IPC — spills are
written with ``sink_ipc``/``write_ipc`` and re-opened with
``read_ipc`` (/root/reference/pl_fuzzy_frame_match/_utils.py:32-118).
A user migrating from it will have IPC files; Spark has no built-in
IPC reader, so this module provides one that stays distributed:

- **read**: ``binaryFile`` datasource lists + ships file bytes to
  executors; ``mapInPandas`` decodes each file with pyarrow and emits
  Arrow-sized record batches. Decode parallelism = number of files
  (IPC spill files are written partition-sized, so this matches the
  write-side fan-out). Schema comes from a driver-side peek at one
  file's *footer* — not a full read.
- **write**: ``mapInArrow`` streams each Spark partition's record
  batches straight into one IPC file per partition — no
  driver-side collect, no pandas detour. A manifest DataFrame of
  (path, n_rows) comes back so callers can audit the layout.

``write_ipc_single`` mirrors the reference's small-frame branch
(collect-then-write, _utils.py:38-47) for driver-sized outputs.

For genuinely large data prefer Parquet (``sources/sinks.py``):
IPC has no predicate pushdown, no column pruning at the scan, and
no row groups — this module exists for interchange parity, not as
the engine's primary storage format.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator, Optional

import pyarrow as pa
import pyarrow.ipc

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _spark_schema_from_arrow(schema: pa.Schema) -> StructType:
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(schema)


def ipc_schema(path: str) -> pa.Schema:
    """Arrow schema of an IPC file from its footer (no data read)."""
    with pa.memory_map(path, "r") as source:
        return pa.ipc.open_file(source).schema


def read_ipc(
    spark: SparkSession,
    path: str,
    schema: Optional[pa.Schema] = None,
) -> DataFrame:
    """Read one IPC file, a directory, or a glob of them as a
    DataFrame. All files must share one schema (pass ``schema`` to
    skip the driver peek when you already know it)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    if schema is None:
        first = files.select("path").limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no IPC files at {path}")
        local = first[0]["path"]
        if local.startswith("file:"):
            local = local[len("file:") :]
        schema = ipc_schema(local)
    out_schema = _spark_schema_from_arrow(schema)

    def decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            for content in pdf["content"]:
                reader = pa.ipc.open_file(pa.BufferReader(content))
                for i in range(reader.num_record_batches):
                    yield reader.get_batch(i).to_pandas()

    return files.select("content").mapInPandas(decode, schema=out_schema)


def write_ipc(df: DataFrame, dir_path: str) -> DataFrame:
    """Write ``df`` as one IPC file per partition under ``dir_path``
    (local/NFS-visible path on this deployment). Returns the collected
    manifest as a small DataFrame of (path, n_rows). Empty partitions
    write no file."""
    os.makedirs(dir_path, exist_ok=True)
    spark = df.sparkSession

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer = None
        fname = os.path.join(dir_path, f"part-{uuid.uuid4().hex}.arrow")
        rows = 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_file(fname, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return
        writer.close()
        yield pa.RecordBatch.from_pydict(
            {"path": [fname], "n_rows": [rows]}
        )

    manifest = df.mapInArrow(encode, schema="path string, n_rows long")
    # materialize now: the write is the side effect, the manifest is tiny
    rows = manifest.collect()
    return spark.createDataFrame(rows, schema="path string, n_rows long")


def write_ipc_single(df: DataFrame, path: str) -> int:
    """Driver-side single-file IPC write for small frames (the
    reference's collect-then-write branch). Returns the row count."""
    table = df.toArrow()
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
    return table.num_rows


TEXT_FORMATS = ("csv", "json", "orc", "parquet")


def write_table(df: DataFrame, dir_path: str, fmt: str = "parquet") -> None:
    """Uniform multi-format sink (csv/json/orc/parquet). CSV gets a
    header and explicit timestamp formatting so a schema-carrying
    read round-trips; ORC/parquet are self-describing columnar and
    the formats of record at scale — csv/json exist for interchange,
    not for 100 TB scans."""
    if fmt not in TEXT_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    w.save(dir_path)


def read_table(spark, dir_path: str, fmt: str = "parquet", schema=None):
    """Uniform multi-format source. CSV and JSON are schema-less on
    disk: pass the writer's schema for an exact round trip (header
    names alone cannot restore types); ORC/parquet ignore ``schema``
    and read their embedded one."""
    if fmt not in TEXT_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    if schema is not None and fmt in ("csv", "json"):
        r = r.schema(schema)
    return r.load(dir_path)
