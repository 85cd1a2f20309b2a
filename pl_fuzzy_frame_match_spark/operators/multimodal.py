"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media decoding is STUBBED — the
image/audio libraries are not in this container. ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
derives deterministic pseudo-metadata from the bytes so the pipeline
shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 encoded text —
    in production this is the raw image/audio/video bytes from the
    lakehouse)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over the opaque payload: byte size,
    content digest. No decode, no Python."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder (CLEARLY FAKE):
    pseudo width/height/channels derived from the content digest."""
    d = hashlib.md5(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 4


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads into typed metadata via ``mapInPandas``
    (Arrow batches, one Python worker per partition — the production
    shape for CPU-bound media decode on a Spark cluster).

    STUB: real decoding needs PIL/ffmpeg, absent here. ``fake=True``
    substitutes :func:`_fake_decode` so tests exercise the full Spark
    plumbing; ``fake=False`` raises ``NotImplementedError`` at
    execution time.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/libvips — not available in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                w, h, c = _fake_decode(data)
                rows.append((rid, len(data), w, h, c))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_META_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODED_META_SCHEMA
    )
