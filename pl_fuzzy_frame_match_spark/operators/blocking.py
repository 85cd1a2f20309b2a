"""Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995).

The third classic candidate-generation tier next to the engine's
phonetic (Soundex) and n-gram/FastSS blocks: sort the corpus by a
blocking key and score only records whose sort positions are within a
fixed window ``w``. Recall profile is complementary to code-equality
blocks — it catches near-matches that share a PREFIX but land in
different phonetic/n-gram buckets, and its cost is strictly linear
(each record scores against at most w-1 neighbors, vs quadratic
within a hot Soundex block).

Scale shape: the global sort position comes from
``operators/suffixdedup.global_dense_rank`` (range-repartition +
local sort + per-partition offsets — never a single-task
``Window.orderBy``); window pairing is an EXPLODE + EQUI-JOIN on the
rank (each row emits w-1 probe ranks), not a non-equi range join, so
Catalyst plans a plain hash join with linear volume. Scoring reuses
the shared kernel tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    window: int = 3,
    metric: str = "jaro_winkler",
    threshold: float = 0.0,
) -> DataFrame:
    """Candidate pairs whose DISTINCT blocking keys sort within
    ``window`` positions of each other, scored with ``metric`` and
    kept at similarity >= ``threshold``.

    Output: (left_name, right_name, similarity) with
    left_name < right_name (rank order == key order, so no mirrored
    or self pairs). Each distinct key pair is scored exactly once no
    matter how many rows carry the keys.
    """
    if window < 2:
        raise ValueError("window must be >= 2 (w-1 neighbors per key)")
    from ..functions.kernels import distance_column
    from .suffixdedup import global_dense_rank

    keys = (
        df.select(F.col(key_col).alias("left_name"))
        .where(F.col("left_name").isNotNull())
        .distinct()
    )
    ranked = global_dense_rank(keys, ["left_name"], rank_col="_rank")
    probes = ranked.select(
        "left_name",
        F.explode(
            F.array(*[F.col("_rank") + F.lit(d) for d in range(1, window)])
        ).alias("_probe"),
    )
    right = ranked.select(
        F.col("left_name").alias("right_name"), F.col("_rank").alias("_r")
    )
    pairs = probes.join(right, probes["_probe"] == right["_r"])
    sim = F.lit(1.0) - distance_column(
        metric, F.lower(F.col("left_name")), F.lower(F.col("right_name"))
    )
    return (
        pairs.withColumn("similarity", sim)
        .where(F.col("similarity") >= F.lit(threshold))
        .select("left_name", "right_name", "similarity")
    )
