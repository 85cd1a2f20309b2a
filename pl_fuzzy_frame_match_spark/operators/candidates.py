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
  shingles -> HashingTF (binary) -> MinHashLSH.approxSimilarityJoin on
  Jaccard distance, then a per-left-key ``row_number`` window to keep
  the top-N nearest candidates. Partition-parallel — no manual
  chunking; lossy by design exactly like the reference (candidate set
  is a subset of the cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
DEFAULT_NUM_HASH_TABLES = 4
DEFAULT_JACCARD_DISTANCE = 0.8
SHINGLE_FEATURES = 1 << 18


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


def _with_shingle_features(df: DataFrame, col: str, out: str) -> DataFrame:
    """Lowercased character-3-gram shingle set -> sparse binary feature
    vector. Strings shorter than 3 chars contribute themselves as a
    single shingle so the vector is never empty (MinHash requires >= 1
    non-zero); empty strings are dropped (ANN path is lossy by design)."""
    from pyspark.ml.feature import HashingTF

    shingles = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(lower(`{col}`)) - 2, 1)),"
        f" i -> substring(lower(`{col}`), i, 3)))"
    )
    df = df.filter(F.length(F.col(col)) > 0).withColumn("__shingles", shingles)
    htf = HashingTF(
        inputCol="__shingles",
        outputCol=out,
        numFeatures=SHINGLE_FEATURES,
        binary=True,
    )
    return htf.transform(df).drop("__shingles")


def approx_candidates(
    left_keys: DataFrame,
    right_keys: DataFrame,
    left_col: str,
    right_col: str,
    top_n: int = DEFAULT_TOP_N,
    jaccard_distance: float = DEFAULT_JACCARD_DISTANCE,
    num_hash_tables: int = DEFAULT_NUM_HASH_TABLES,
) -> DataFrame:
    """LSH-approximate candidate pairs (J2): at most ``top_n`` nearest
    right keys per left key, ranked by MinHash-estimated Jaccard
    distance of 3-gram shingle sets.

    Callers should pass the *larger* key set as ``left_keys`` (the
    reference swaps sides the same way, matcher.py:16-49) so the per-row
    budget applies to the bigger side.
    """
    from pyspark.ml.feature import MinHashLSH

    # parallelism must track the (unknown, potentially large) candidate
    # volume of the bucket join, not the tiny key-frame row counts
    n_parts = left_keys.sparkSession.sparkContext.defaultParallelism * 2
    lf = _with_shingle_features(left_keys.repartition(n_parts), left_col, "__features")
    rf = _with_shingle_features(right_keys, right_col, "__features")

    mh = MinHashLSH(
        inputCol="__features",
        outputCol="__hashes",
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = mh.fit(lf)

    joined = model.approxSimilarityJoin(lf, rf, jaccard_distance, distCol="__jaccard_dist")
    flat = joined.select(
        F.col(f"datasetA.`{left_col}`").alias(left_col),
        *[F.col(f"datasetA.`{c}`").alias(c) for c in left_keys.columns if c != left_col],
        F.col(f"datasetB.`{right_col}`").alias(right_col),
        *[F.col(f"datasetB.`{c}`").alias(c) for c in right_keys.columns if c != right_col],
        F.col("__jaccard_dist"),
    )
    win = Window.partitionBy(left_col).orderBy(
        F.col("__jaccard_dist").asc(), F.col(right_col).asc()
    )
    return (
        flat.withColumn("__rank", F.row_number().over(win))
        .filter(F.col("__rank") <= top_n)
        .drop("__rank", "__jaccard_dist")
    )
