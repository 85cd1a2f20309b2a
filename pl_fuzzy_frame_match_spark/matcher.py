"""Drop-in module parity with the reference's ``matcher`` module
(/root/reference/pl_fuzzy_frame_match/matcher.py): every public name the
reference's test suite drives directly
(reference tests/test_pl_fuzzy_frame_match.py:8-25) resolves here with
the same call shape, operating on Spark DataFrames. Thin delegates —
the engine's real decomposition lives in ``operators/matcher.py`` and
``operators/candidates.py``; args the Spark engine has no use for
(``tempdir`` paths, loggers in pure-transform helpers) are accepted and
ignored, exactly like the lazy/eager split the reference exposes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .models import FuzzyMapping
from .operators.candidates import (
    DEFAULT_TOP_N,
    approx_candidates,
    exact_candidates,
)
from .operators.matcher import (  # noqa: F401  (re-exports)
    LEFT_INDEX,
    RIGHT_INDEX,
    add_index_column as _add_index_column,
    build_key_frame,
    first_round_matches,
    fuzzy_match_dfs,
    fuzzy_match_dfs_with_context,
    fuzzy_match_temp_dir,
    refine_matches,
)
from .plans.planner import DEFAULT_CROSS_OVER


def add_index_column(
    df: DataFrame, column_name: str, tempdir: Optional[str] = None
) -> DataFrame:
    """Reference matcher.py:395-416; ``tempdir`` (the reference's IPC
    spill target) is unused — id stability comes from
    ``localCheckpoint``."""
    return _add_index_column(df, column_name)


def ensure_left_is_larger(
    left_df: DataFrame,
    right_df: DataFrame,
    left_col_name: str,
    right_col_name: str,
) -> Tuple[DataFrame, DataFrame, str, str]:
    """Reference matcher.py:16-49: swap so the larger frame is left."""
    if right_df.count() > left_df.count():
        return right_df, left_df, right_col_name, left_col_name
    return left_df, right_df, left_col_name, right_col_name


def split_dataframe(
    df: DataFrame, max_chunk_size: int = 50_000
) -> List[DataFrame]:
    """Reference matcher.py:52-96. Spark partitions natively (SURVEY
    §2.2 P9) — provided for API parity; chunks are row_number ranges."""
    from pyspark.sql import Window

    n = df.count()
    if n <= max_chunk_size:
        return [df]
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = df.withColumn("__chunk_rn", F.row_number().over(w))
    chunks = []
    for start in range(0, n, max_chunk_size):
        chunks.append(
            numbered.filter(
                (F.col("__chunk_rn") > start)
                & (F.col("__chunk_rn") <= start + max_chunk_size)
            ).drop("__chunk_rn")
        )
    return chunks


def cross_join_small_files(
    left_df: DataFrame, right_df: DataFrame
) -> DataFrame:
    """Reference matcher.py:164-185: cartesian of the key frames."""
    return exact_candidates(
        left_df, right_df, left_df.count(), right_df.count()
    )


def cross_join_large_files(
    left_fuzzy_frame: DataFrame,
    right_fuzzy_frame: DataFrame,
    left_col_name: str,
    right_col_name: str,
    logger=None,
    top_n: int = DEFAULT_TOP_N,
) -> DataFrame:
    """Reference matcher.py:99-161: approximate (top-N) candidate join."""
    return approx_candidates(
        left_fuzzy_frame,
        right_fuzzy_frame,
        left_col_name,
        right_col_name,
        top_n=top_n,
        n_left_keys=left_fuzzy_frame.count(),
        n_right_keys=right_fuzzy_frame.count(),
    )


def cross_join_filter_existing_fuzzy_results(
    left_df: DataFrame,
    right_df: DataFrame,
    existing_matches: DataFrame,
    left_col_name: str,
    right_col_name: str,
) -> DataFrame:
    """Reference matcher.py:188-238: restrict to surviving index pairs
    and re-group by the new (left value, right value) pair, carrying
    index lists."""
    vals = (
        existing_matches.select(LEFT_INDEX, RIGHT_INDEX)
        .join(left_df.select(LEFT_INDEX, left_col_name), on=LEFT_INDEX)
        .join(right_df.select(RIGHT_INDEX, right_col_name), on=RIGHT_INDEX)
        .filter(
            F.col(left_col_name).isNotNull()
            & F.col(right_col_name).isNotNull()
        )
    )
    return vals.groupBy(left_col_name, right_col_name).agg(
        F.collect_list(LEFT_INDEX).alias(LEFT_INDEX),
        F.collect_list(RIGHT_INDEX).alias(RIGHT_INDEX),
    )


def cross_join_no_existing_fuzzy_results(
    left_df: DataFrame,
    right_df: DataFrame,
    left_col_name: str,
    right_col_name: str,
    temp_dir_ref: Optional[str] = None,
) -> DataFrame:
    """Reference matcher.py:241-340 (first-round candidate gen): key
    dedup on both sides, then the cartesian of the key frames."""
    left_keys = build_key_frame(left_df, left_col_name, LEFT_INDEX)
    right_keys = build_key_frame(right_df, right_col_name, RIGHT_INDEX)
    return cross_join_small_files(left_keys, right_keys)


def unique_df_large(
    _df: DataFrame, cols: Optional[List[str]] = None
) -> DataFrame:
    """Reference matcher.py:343-385 (partitioned large dedup) — on
    Spark, ``dropDuplicates`` IS the distributed hash dedup (SURVEY
    §2.4 A7)."""
    return _df.dropDuplicates(cols) if cols else _df.dropDuplicates()


def combine_matches(matching_dfs: List[DataFrame]) -> DataFrame:
    """Reference matcher.py:388-392: conjunction of all rounds — start
    from the last round's pairs, inner-join every earlier round on the
    index pair (picking up one score column per round)."""
    combined = matching_dfs[-1]
    for other in reversed(matching_dfs[:-1]):
        combined = combined.join(
            other, on=[LEFT_INDEX, RIGHT_INDEX], how="inner"
        )
    return combined


def process_fuzzy_mapping(
    fuzzy_map: FuzzyMapping,
    left_df: DataFrame,
    right_df: DataFrame,
    existing_matches: Optional[DataFrame],
    local_temp_dir_ref: Optional[str] = None,
    logger=None,
    existing_number_of_matches: Optional[int] = None,
    use_appr_nearest_neighbor_for_new_matches: Optional[bool] = None,
    top_n: int = DEFAULT_TOP_N,
    cross_over_for_appr_nearest_neighbor: float = DEFAULT_CROSS_OVER,
) -> Tuple[DataFrame, Optional[int]]:
    """Reference matcher.py:419-504: one mapping round. Returns
    (matches, count) like the reference; the count is not recomputed
    (the reference skips it past 1e8 too — O8) and passes through."""
    if existing_matches is not None:
        matches = refine_matches(left_df, right_df, existing_matches, fuzzy_map)
        return matches, existing_number_of_matches
    n_left = left_df.select(
        F.approx_count_distinct(fuzzy_map.left_col)
    ).first()[0]
    n_right = right_df.select(
        F.approx_count_distinct(fuzzy_map.right_col)
    ).first()[0]
    matches = first_round_matches(
        left_df,
        right_df,
        fuzzy_map,
        n_left,
        n_right,
        use_appr_nearest_neighbor_for_new_matches,
        top_n,
        cross_over_for_appr_nearest_neighbor,
    )
    return matches, existing_number_of_matches


def perform_all_fuzzy_matches(
    left_df: DataFrame,
    right_df: DataFrame,
    fuzzy_maps: Sequence[FuzzyMapping],
    logger=None,
    local_temp_dir_ref: Optional[str] = None,
    use_appr_nearest_neighbor_for_new_matches: Optional[bool] = None,
    top_n_for_new_matches: int = DEFAULT_TOP_N,
    cross_over_for_appr_nearest_neighbor: float = DEFAULT_CROSS_OVER,
) -> List[DataFrame]:
    """Reference matcher.py:507-577: the per-mapping loop, carrying the
    previous round's matches into each refinement round. Returns one
    match frame per mapping (combine with :func:`combine_matches`)."""
    results: List[DataFrame] = []
    existing = None
    count: Optional[int] = None
    for fuzzy_map in fuzzy_maps:
        existing, count = process_fuzzy_mapping(
            fuzzy_map,
            left_df,
            right_df,
            existing,
            local_temp_dir_ref,
            logger,
            count,
            use_appr_nearest_neighbor_for_new_matches,
            top_n_for_new_matches,
            cross_over_for_appr_nearest_neighbor,
        )
        results.append(existing)
    return results
