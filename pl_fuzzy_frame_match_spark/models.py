"""Join-spec model for the fuzzy-match engine.

Capability parity with the reference's ``FuzzyMapping``
(/root/reference/pl_fuzzy_frame_match/models.py:15-102): a declarative
spec of one fuzzy join predicate — (left_col, right_col) must have
string similarity >= threshold_score/100 under ``fuzzy_type``.

Engine-side plain Python (not a Spark concept); the Spark plan is built
from a list of these by :mod:`pl_fuzzy_frame_match_spark.operators.matcher`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Literal, Optional

FuzzyTypeLiteral = Literal[
    "levenshtein",
    "jaro",
    "jaro_winkler",
    "hamming",
    "damerau_levenshtein",
    "indel",
]

FUZZY_TYPES: tuple[str, ...] = (
    "levenshtein",
    "jaro",
    "jaro_winkler",
    "hamming",
    "damerau_levenshtein",
    "indel",
)


@dataclass
class FuzzyMapping:
    """One fuzzy join predicate.

    Attributes
    ----------
    left_col / right_col:
        String columns to compare (case-insensitively).
    threshold_score:
        User-facing 0-100 similarity threshold. Kept iff
        ``similarity * 100 >= int(threshold_score)`` — note the ``int()``
        truncation, mirroring reference models.py:91-102.
    fuzzy_type:
        One of :data:`FUZZY_TYPES`.
    perc_unique:
        Planner-filled combined uniqueness score (selectivity estimate).
    output_column_name:
        Name of the produced score column; auto-derived when None.
    valid:
        Planner flag; invalid mappings are skipped.
    """

    left_col: str
    right_col: Optional[str] = None
    threshold_score: float = 80.0
    fuzzy_type: str = "levenshtein"
    perc_unique: float = 0.0
    output_column_name: Optional[str] = None
    valid: bool = True

    def __post_init__(self) -> None:
        if self.right_col is None:
            # reference models.py:78-80: a one-argument mapping compares
            # the same column name on both sides
            self.right_col = self.left_col
        if self.fuzzy_type not in FUZZY_TYPES:
            raise ValueError(
                f"fuzzy_type must be one of {FUZZY_TYPES}, got {self.fuzzy_type!r}"
            )
        if self.output_column_name is None:
            # legacy default, reference models.py:87-89
            self.output_column_name = f"fuzzy_score_{self.left_col}_{self.right_col}"

    @property
    def reversed_threshold_score(self) -> float:
        """User 0-100 similarity threshold -> 0-1 *distance* upper bound.

        Mirrors reference models.py:91-102 including the ``int()``
        truncation of fractional thresholds.
        """
        return ((int(self.threshold_score) - 100) * -1) / 100

    def copy_with(self, **kw) -> "FuzzyMapping":
        return replace(self, **kw)
