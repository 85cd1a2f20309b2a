"""Vector similarity primitives over ``array<float|double>`` columns.

Two tiers:

- **JVM expressions** (``dot`` / ``norm`` / ``cosine_similarity``):
  ``zip_with`` + ``aggregate`` higher-order functions. No Python, but
  Catalyst evaluates HOFs *interpreted* (they are excluded from
  whole-stage codegen) — right for per-pair scoring on small candidate
  sets (e.g. inside LSH buckets), wrong for dense all-pairs work.
- **BLAS block kernel** (``normalized_matrix`` + callers'
  ``mapInPandas``): Arrow-batched numpy matmul for brute-force top-k
  and all-pairs threshold scans — orders of magnitude faster than
  per-pair expression evaluation, and the shape that survives scale
  (per-executor GEMM on broadcast corpus blocks).

Everything computes in float64 regardless of storage type so results
are reproducible against the DuckDB oracle (`list_cosine_similarity`
on a DOUBLE[] cast).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
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


def normalized_matrix(
    df: DataFrame, vec_col: str, id_col: str
) -> tuple:
    """Collect ``(ids, row-normalized float64 matrix)`` for broadcast to
    the BLAS kernels. Zero-norm rows normalize to zero vectors (cosine 0
    against everything, consistently dropped by > 0 thresholds).

    The collect bounds this helper to corpora that fit one executor
    (~10^7 x 64-dim float64 = ~5 GB). Past that the same kernel applies
    per corpus *block*: partition the corpus, broadcast one block at a
    time, union the per-block results (callers keep that loop)."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms
