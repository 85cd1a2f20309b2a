"""Candidate-pair generation for the fuzzy join.

Two physical strategies, mirroring the reference's adaptive choice
(/root/reference/pl_fuzzy_frame_match/matcher.py:241-340):

- **exact** (`cross_join_small_files`, matcher.py:164-185): full
  cartesian of the two *deduped key frames*. Spark-first: a
  ``crossJoin`` with an explicit broadcast hint when one key set is
  small — a BroadcastNestedLoopJoin with zero shuffle; otherwise
  Spark's partitioned CartesianProduct handles the large case (the
  reference's manual side-swap heuristic dissolves into AQE).

- **approx** (`cross_join_large_files`, matcher.py:99-161): the
  reference calls a Rust ANN plugin in 10k-row chunks with
  ``top_n=500`` per row. Spark-first re-expression: character-3-gram
  shingles -> pure-SQL MinHash banding (functions/minhash.py) -> bucket
  equi-join -> estimated-Jaccard threshold -> per-left-key
  ``row_number`` window keeping the top-N nearest candidates.
  Entirely whole-stage codegen (no ML sparse-vector UDFs), partition-
  parallel — no manual chunking; lossy by design exactly like the
  reference (candidate set is a subset of the cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.minhash import banded_buckets, char_shingles, est_jaccard

# Broadcast a key frame when its distinct-key count is below this.
# ~2M short string keys + index lists stays well under a 1-2 GB
# broadcast budget on a production executor.
BROADCAST_KEY_LIMIT = 2_000_000

# Candidate pairs each task should score. The key frames are tiny in
# ROWS but the cross join is huge in COMPUTE — without an explicit
# repartition AQE coalesces the small aggregate output to one partition
# and the whole O(n*m) scoring loop runs serially on a single core.
# Parallelism must track pair volume, not input row count.
PAIRS_PER_TASK = 250_000

DEFAULT_TOP_N = 500
DEFAULT_JACCARD_DISTANCE = 0.8
# 16 hashes in 8 bands of 2: collision probability 1-(1-s^2)^8 is
# ~0.97 at s=0.5 (a one-typo name) and ~0.26 at s=0.2 — high recall
# on true matches, cheap rejection of noise
MINHASH_HASHES = 16
MINHASH_BANDS = 8


def _compute_parallelism(df: DataFrame, pair_volume: int) -> int:
    sc = df.sparkSession.sparkContext
    by_volume = pair_volume // PAIRS_PER_TASK + 1
    return int(max(1, min(by_volume, sc.defaultParallelism * 2)))


def exact_candidates(
    left_keys: DataFrame,
    right_keys: DataFrame,
    n_left_keys: int,
    n_right_keys: int,
) -> DataFrame:
    """Cartesian of the deduped key frames (J1). Broadcasts the smaller
    side when it fits (shuffle-free BroadcastNestedLoopJoin) and
    repartitions the probe side so scoring parallelism matches the
    cartesian's compute volume, not its (tiny) input row count."""
    n_parts = _compute_parallelism(left_keys, n_left_keys * n_right_keys)
    if n_right_keys <= n_left_keys and n_right_keys <= BROADCAST_KEY_LIMIT:
        return left_keys.repartition(n_parts).crossJoin(F.broadcast(right_keys))
    if n_left_keys < n_right_keys and n_left_keys <= BROADCAST_KEY_LIMIT:
        return right_keys.repartition(n_parts).crossJoin(F.broadcast(left_keys))
    # both sides huge: partitioned cartesian; give the bigger side the
    # explicit parallelism and let Spark pair partitions
    return left_keys.repartition(n_parts).crossJoin(right_keys)


def approx_candidates(
    left_keys: DataFrame,
    right_keys: DataFrame,
    left_col: str,
    right_col: str,
    top_n: int = DEFAULT_TOP_N,
    jaccard_distance: float = DEFAULT_JACCARD_DISTANCE,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """LSH-approximate candidate pairs (J2): at most ``top_n`` nearest
    right keys per left key, ranked by MinHash-estimated Jaccard
    distance of 3-gram shingle sets.

    Callers should pass the *larger* key set as ``left_keys`` (the
    reference swaps sides the same way, matcher.py:16-49) so the per-row
    budget applies to the bigger side.

    Shuffle discipline for scale: the bucket join moves only
    ``(key string, 16-slot signature, band key)`` — the potentially huge
    per-key index lists are re-attached *after* the top-N truncation, so
    the heavy columns never ride through the quadratic-ish stage. The
    returned pairs are distinct by construction (groupBy on the value
    pair), which lets the caller skip a row-level dropDuplicates.
    """
    # parallelism must track the (unknown, potentially large) candidate
    # volume of the bucket join, not the tiny key-frame row counts
    n_parts = left_keys.sparkSession.sparkContext.defaultParallelism * 2
    lb = banded_buckets(
        left_keys.filter(F.length(left_col) > 0).repartition(n_parts),
        [left_col],
        char_shingles(F.col(left_col)),
        num_hashes,
        bands,
        sig_col="__lsig",
    )
    rb = banded_buckets(
        right_keys.filter(F.length(right_col) > 0),
        [right_col],
        char_shingles(F.col(right_col)),
        num_hashes,
        bands,
        sig_col="__rsig",
    )
    pairs = (
        lb.join(rb, on=["band", "band_key"], how="inner")
        # a pair colliding in k bands appears k times; collapse before
        # scoring so the window sees each value pair once
        .groupBy(left_col, right_col)
        .agg(F.first("__lsig").alias("__lsig"), F.first("__rsig").alias("__rsig"))
        .withColumn(
            "__jaccard_dist",
            F.lit(1.0) - est_jaccard(F.col("__lsig"), F.col("__rsig")),
        )
        .filter(F.col("__jaccard_dist") <= F.lit(jaccard_distance))
    )
    win = Window.partitionBy(left_col).orderBy(
        F.col("__jaccard_dist").asc(), F.col(right_col).asc()
    )
    topn = (
        pairs.withColumn("__rank", F.row_number().over(win))
        .filter(F.col("__rank") <= top_n)
        .select(left_col, right_col)
    )
    # re-attach the index lists only for surviving candidates
    return topn.join(left_keys, on=left_col, how="inner").join(
        right_keys, on=right_col, how="inner"
    )
