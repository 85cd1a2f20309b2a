"""Naming + planner heuristics, value-pinned against the reference
(tests/test_pre_process.py:108-382, tests/test_output_column_name_utils.py)."""

import pytest

from pl_fuzzy_frame_match_spark.models import FuzzyMapping
from pl_fuzzy_frame_match_spark.naming import (
    get_rename_right_columns_to_ensure_no_overlap,
    rename_fuzzy_right_mapping,
    set_output_column_names,
)
from pl_fuzzy_frame_match_spark.plans.planner import (
    calculate_uniqueness,
    choose_candidate_strategy,
    order_mappings_by_selectivity,
    should_deduplicate_inputs,
)


class TestNaming:
    def test_simple_collision(self):
        r = get_rename_right_columns_to_ensure_no_overlap(["id", "name"], ["id", "city"])
        assert r == {"id": "id_right"}

    def test_no_overlap(self):
        assert get_rename_right_columns_to_ensure_no_overlap(["a", "b"], ["c", "d"]) == {}

    def test_complete_overlap(self):
        r = get_rename_right_columns_to_ensure_no_overlap(["a", "b", "c"], ["a", "b", "c"])
        assert r == {"a": "a_right", "b": "b_right", "c": "c_right"}

    def test_recursive_collision(self):
        # reference tests/test_pre_process.py:228-255: id -> id_right_right...
        r = get_rename_right_columns_to_ensure_no_overlap(
            ["id", "id_right"], ["id", "x"]
        )
        assert r["id"] == "id_right_right"

    def test_right_internal_collision(self):
        # reference pins: only left-colliding cols renamed, reserving
        # right's own names -> id skips over id_right
        r = get_rename_right_columns_to_ensure_no_overlap(["id"], ["id", "id_right"])
        assert r == {"id": "id_right_right"}

    def test_self_conflicting(self):
        r = get_rename_right_columns_to_ensure_no_overlap(
            ["id", "value"], ["id", "id_right", "value", "value_right"]
        )
        assert r == {"id": "id_right_right", "value": "value_right_right"}

    def test_custom_suffix(self):
        r = get_rename_right_columns_to_ensure_no_overlap(["a"], ["a"], suffix="_r")
        assert r == {"a": "a_r"}

    def test_empty_suffix_raises(self):
        with pytest.raises(ValueError):
            get_rename_right_columns_to_ensure_no_overlap(["a"], ["a"], suffix="")

    def test_mapping_propagation(self):
        maps = [FuzzyMapping("name", "org")]
        out = rename_fuzzy_right_mapping(maps, {"org": "org_right"})
        assert out[0].right_col == "org_right"
        assert maps[0].right_col == "org"  # copy, not mutate

    def test_score_column_names_with_counters(self):
        maps = [
            FuzzyMapping("a", "b", fuzzy_type="jaro"),
            FuzzyMapping("a", "b", fuzzy_type="jaro"),
            FuzzyMapping("a", "b", fuzzy_type="levenshtein"),
        ]
        out = set_output_column_names(maps)
        assert [m.output_column_name for m in out] == [
            "a_vs_b_jaro",
            "a_vs_b_jaro_2",
            "a_vs_b_levenshtein",
        ]


class TestModels:
    def test_threshold_reversal_truncation(self):
        # reference models.py:91-102 — int() truncation
        assert FuzzyMapping("a", "b", threshold_score=75.0).reversed_threshold_score == 0.25
        assert FuzzyMapping("a", "b", threshold_score=75.9).reversed_threshold_score == 0.25
        assert FuzzyMapping("a", "b", threshold_score=100.0).reversed_threshold_score == 0.0
        assert FuzzyMapping("a", "b", threshold_score=0.0).reversed_threshold_score == 1.0

    def test_invalid_metric_rejected(self):
        with pytest.raises(ValueError):
            FuzzyMapping("a", "b", fuzzy_type="exact")

    def test_legacy_default_output_name(self):
        assert FuzzyMapping("x", "y").output_column_name == "fuzzy_score_x_y"


class TestPlanner:
    def test_uniqueness_formula_pinned(self):
        # reference tests/test_pre_process.py:113-117 pins the formula
        assert calculate_uniqueness(1.0, 1.0) == pytest.approx((1.5**2 + 1.5**2) / 2 - 0.25)
        assert calculate_uniqueness(0.0, 0.0) == pytest.approx((0.25 + 0.25) / 2 - 0.25)
        assert calculate_uniqueness(1.0, 0.0) == pytest.approx(
            (2.25 + 0.25) / 2 - 0.25 + 0.5
        )

    def test_ordering_most_selective_first(self):
        maps = [FuzzyMapping("low", "low2"), FuzzyMapping("hi", "hi2")]
        out = order_mappings_by_selectivity(
            maps, {"low": 2, "hi": 100}, {"low2": 2, "hi2": 100}, 100, 100
        )
        assert out[0].left_col == "hi"
        assert out[0].perc_unique > out[1].perc_unique

    def test_dedup_trigger_thresholds(self):
        low = [FuzzyMapping("a", "b", perc_unique=0.5)]
        assert should_deduplicate_inputs(low, 2000, 2000)  # 4e6 > 1e6
        assert not should_deduplicate_inputs(low, 100, 100)  # cartesian too small
        hi = [FuzzyMapping("a", "b", perc_unique=2.0)]
        assert not should_deduplicate_inputs(hi, 2000, 2000)

    def test_strategy_crossover(self):
        assert not choose_candidate_strategy(1000, 1000).use_approx  # 1e6 < 1e8
        assert choose_candidate_strategy(200_000, 1000).use_approx  # 2e8 > 1e8
        assert choose_candidate_strategy(200_000, 1000, use_appr_nearest_neighbor=False).use_approx is False
        assert choose_candidate_strategy(10, 10, use_appr_nearest_neighbor=True).use_approx

    def test_strategy_hard_abort(self):
        with pytest.raises(ValueError):
            choose_candidate_strategy(10**8, 10**7)


def test_fuzzy_mapping_right_col_defaults_to_left():
    from pl_fuzzy_frame_match_spark.models import FuzzyMapping

    m = FuzzyMapping("name")
    assert m.right_col == "name"
    assert m.output_column_name == "fuzzy_score_name_name"
    m2 = FuzzyMapping("a", None, 90.0, "jaro")
    assert m2.right_col == "a" and m2.fuzzy_type == "jaro"
