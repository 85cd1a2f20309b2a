"""Vector similarity primitives over ``array<float|double>`` columns.

Spark-first: dot product / norms / cosine are built from
``F.zip_with`` + ``F.aggregate`` so they run inside whole-stage codegen
on the JVM — no Python in the hot path. A vectorized pandas-UDF variant
(numpy matmul) exists for the brute-force top-k operator where batching
whole blocks through BLAS beats per-row expression evaluation.

Everything computes in float64 regardless of storage type so results
are reproducible against the DuckDB oracle (`list_cosine_similarity`
on a DOUBLE[] cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product, JVM-side (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in float64; null-safe on zero norms (returns
    null rather than NaN so downstream filters drop degenerate rows)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
