from .planner import (  # noqa: F401
    ABORT_CARTESIAN,
    DEFAULT_CROSS_OVER,
    Strategy,
    calculate_uniqueness,
    choose_candidate_strategy,
    get_approx_uniqueness,
    order_mappings_by_selectivity,
    should_deduplicate_inputs,
)
