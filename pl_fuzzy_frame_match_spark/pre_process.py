"""Drop-in module parity with the reference's ``pre_process`` module
(/root/reference/pl_fuzzy_frame_match/pre_process.py). Thin delegates
to the engine's planner (``plans/planner.py``) and naming
(``naming.py``) with the reference's call shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame

from .models import FuzzyMapping
from .naming import (  # noqa: F401  (re-exports, same names as reference)
    get_rename_right_columns_to_ensure_no_overlap,
    rename_fuzzy_right_mapping,
    set_output_column_names,
)
from .plans.planner import (  # noqa: F401
    CARTESIAN_DEDUP_THRESHOLD,
    UNIQUENESS_DEDUP_THRESHOLD,
    calculate_uniqueness,
    get_approx_uniqueness as _get_approx_uniqueness,
    get_count_and_approx_uniqueness,
    order_mappings_by_selectivity,
)


def get_approx_uniqueness(df: DataFrame) -> Dict[str, int]:
    """Reference pre_process.py:12-28: approximate distinct count for
    EVERY column of the frame."""
    return _get_approx_uniqueness(df, df.columns)


def calculate_df_len(df: DataFrame) -> int:
    """Reference pre_process.py:48-67."""
    return df.count()


def fill_perc_unique_in_fuzzy_maps(
    left_df: DataFrame,
    right_df: DataFrame,
    fuzzy_maps: Sequence[FuzzyMapping],
    logger=None,
    left_len: Optional[int] = None,
    right_len: Optional[int] = None,
) -> List[FuzzyMapping]:
    """Reference pre_process.py:70-103: compute each mapping's combined
    uniqueness from the two distinct ratios."""
    left_len = left_len if left_len is not None else left_df.count()
    right_len = right_len if right_len is not None else right_df.count()
    lu = _get_approx_uniqueness(left_df, [m.left_col for m in fuzzy_maps])
    ru = _get_approx_uniqueness(right_df, [m.right_col for m in fuzzy_maps])
    return order_mappings_by_selectivity(
        list(fuzzy_maps), lu, ru, left_len, right_len
    )


def determine_order_of_fuzzy_maps(
    fuzzy_maps: List[FuzzyMapping],
) -> List[FuzzyMapping]:
    """Reference pre_process.py:106-119: most-selective first (the
    ``perc_unique`` values must already be filled)."""
    return sorted(fuzzy_maps, key=lambda m: m.perc_unique, reverse=True)


def calculate_uniqueness_rate(fuzzy_maps: List[FuzzyMapping]) -> float:
    """Reference pre_process.py:122-132."""
    return sum(m.perc_unique for m in fuzzy_maps)


def determine_need_for_aggregation(
    uniqueness_rate: float, cartesian_join_number: int
) -> bool:
    """Reference pre_process.py:135-149 (O3 trigger, same constants)."""
    return (
        uniqueness_rate < UNIQUENESS_DEDUP_THRESHOLD
        and cartesian_join_number > CARTESIAN_DEDUP_THRESHOLD
    )


def aggregate_output(
    left_df: DataFrame,
    right_df: DataFrame,
    fuzzy_maps: Sequence[FuzzyMapping],
) -> Tuple[DataFrame, DataFrame]:
    """Reference pre_process.py:152-171: dedup both inputs on the join
    keys (intentionally collapses duplicate payload rows — O3)."""
    return (
        left_df.dropDuplicates([m.left_col for m in fuzzy_maps]),
        right_df.dropDuplicates([m.right_col for m in fuzzy_maps]),
    )


def report_on_order_of_fuzzy_maps(
    fuzzy_maps: Sequence[FuzzyMapping], logger
) -> None:
    """Reference pre_process.py:174-197."""
    for m in fuzzy_maps:
        logger.info(
            "fuzzy mapping %s ~ %s (%s): uniqueness %.4f",
            m.left_col, m.right_col, m.fuzzy_type, m.perc_unique,
        )


def pre_process_for_fuzzy_matching(
    left_df: DataFrame,
    right_df: DataFrame,
    fuzzy_maps: List[FuzzyMapping],
    logger=None,
) -> Tuple[DataFrame, DataFrame, List[FuzzyMapping]]:
    """Reference pre_process.py:281-327 (phase A): selectivity
    estimation, mapping order, optional input dedup, collision renames.
    Returns the (possibly deduped/renamed) frames + fixed-up specs."""
    left_len, right_len = left_df.count(), right_df.count()
    if left_len == 0 or right_len == 0:
        return left_df, right_df, set_output_column_names(list(fuzzy_maps))
    maps = fill_perc_unique_in_fuzzy_maps(
        left_df, right_df, fuzzy_maps, logger, left_len, right_len
    )
    if determine_need_for_aggregation(
        calculate_uniqueness_rate(maps), left_len * right_len
    ):
        left_df, right_df = aggregate_output(left_df, right_df, maps)
    rename = get_rename_right_columns_to_ensure_no_overlap(
        left_df.columns, right_df.columns
    )
    if rename:
        right_df = right_df.withColumnsRenamed(rename)
    maps = rename_fuzzy_right_mapping(maps, rename)
    return left_df, right_df, set_output_column_names(maps)
