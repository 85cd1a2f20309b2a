"""Collision-free column renaming + score-column naming.

Capability parity with the reference's pure-Python naming utilities:
- right-frame collision suffixing (pre_process.py:200-254)
- propagating renames into the mapping specs (pre_process.py:257-278)
- score-column auto-naming with duplicate counters
  (output_column_name_utils.py:4-43)

All driver-side pure Python; the Spark side consumes the rename map via
``DataFrame.withColumnsRenamed``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .models import FuzzyMapping


def get_rename_right_columns_to_ensure_no_overlap(
    left_columns: Sequence[str],
    right_columns: Sequence[str],
    suffix: str = "_right",
) -> Dict[str, str]:
    """Map right-frame column names to collision-free names.

    Only right columns that collide with a *left* column are renamed;
    the suffix is appended repeatedly while the candidate name is still
    reserved (reserved = all left names + all right names + names
    already assigned) — so ``id`` becomes ``id_right_right`` when the
    right frame also owns ``id_right``. Returns only the renamed
    entries. Mirrors reference pre_process.py:200-254 exactly (behavior
    pinned by its tests/test_pre_process.py:189-382).
    """
    if not suffix:
        raise ValueError("suffix must be a non-empty string")
    left_set = set(left_columns)
    reserved = left_set | set(right_columns)
    rename: Dict[str, str] = {}
    for col in right_columns:
        if col not in left_set:
            continue
        new = col
        while new in reserved:
            new = new + suffix
        rename[col] = new
        reserved.add(new)
    return rename


def rename_fuzzy_right_mapping(
    fuzzy_maps: Sequence[FuzzyMapping], rename: Dict[str, str]
) -> List[FuzzyMapping]:
    """Return copies of the mappings with ``right_col`` pushed through
    the rename map (copy, not mutate — reference pre_process.py:257-278)."""
    return [
        m.copy_with(right_col=rename.get(m.right_col, m.right_col))
        for m in fuzzy_maps
    ]


def set_output_column_names(fuzzy_maps: Sequence[FuzzyMapping]) -> List[FuzzyMapping]:
    """Assign ``{left}_vs_{right}_{fuzzy_type}`` score-column names with
    ``_2``, ``_3``… counters on duplicates (reference
    output_column_name_utils.py:4-43)."""
    seen: Dict[str, int] = {}
    out: List[FuzzyMapping] = []
    for m in fuzzy_maps:
        base = f"{m.left_col}_vs_{m.right_col}_{m.fuzzy_type}"
        n = seen.get(base, 0)
        name = base if n == 0 else f"{base}_{n + 1}"
        seen[base] = n + 1
        out.append(m.copy_with(output_column_name=name))
    return out
