"""Drop-in module parity with the reference's
``output_column_name_utils`` (/root/reference/pl_fuzzy_frame_match/
output_column_name_utils.py): score-column naming helpers.
"""

from __future__ import annotations

from typing import List

from .models import FuzzyMapping
from .naming import set_output_column_names


def generate_output_column_from_fuzzy_mapping(
    fuzzy_mapping: FuzzyMapping,
) -> str:
    """Reference output_column_name_utils.py:4-18:
    ``{left}_vs_{right}_{fuzzy_type}``."""
    return (
        f"{fuzzy_mapping.left_col}_vs_{fuzzy_mapping.right_col}"
        f"_{fuzzy_mapping.fuzzy_type}"
    )


def set_name_in_fuzzy_mappings(fuzzy_mappings: List[FuzzyMapping]) -> None:
    """Reference output_column_name_utils.py:21-43: assign unique score
    column names (``_2``, ``_3``… counters on duplicates). The
    reference mutates in place; mirror that by writing the computed
    names back onto the input objects."""
    named = set_output_column_names(fuzzy_mappings)
    for orig, fixed in zip(fuzzy_mappings, named):
        orig.output_column_name = fixed.output_column_name
