"""Similarity search over embedding columns (``array<float>``).

Two physical strategies:

- **brute-force top-k** — the exact baseline: probe x corpus cross
  join with JVM-side cosine, per-probe ``row_number`` window. At scale
  the corpus side is broadcast in blocks; on a 1000-executor cluster
  this is the right shape up to ~10^7 corpus rows per probe batch.
- **random-hyperplane LSH top-k** — the scale path: sign-bit sketches
  bucket the corpus; probes only score their own bucket (plus
  multi-probe neighbors). Recall < 1 by design; the brute-force path
  is its correctness reference.

Hyperplanes are generated from a seeded numpy RNG on the driver and
broadcast as literal arrays — deterministic across runs and executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self-matches).
    Returns (query_id, neighbor_id, cosine_sim, rank)."""
    a = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    b = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    n_parts = probes.sparkSession.sparkContext.defaultParallelism * 2
    scored = (
        a.repartition(n_parts)
        .crossJoin(F.broadcast(b))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec_col: str, planes: list) -> F.Column:
    """Sign-bit bucket id: bit i set iff dot(vec, plane_i) > 0 —
    computed entirely JVM-side from literal plane arrays."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on the random-hyperplane bucket,
    exact cosine re-rank within the bucket. Candidates shrink by
    ~2^n_planes; recall measured against :func:`brute_force_topk`."""
    if dim is None:
        dim = len(
            corpus.select(vec_col).first()[0]
        )
    planes = _hyperplanes(dim, n_planes, seed)
    a = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _bucket_expr(vec_col, planes).alias("__bucket"),
    )
    b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _bucket_expr(vec_col, planes).alias("__bucket"),
    )
    scored = (
        a.join(b, on="__bucket", how="inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
