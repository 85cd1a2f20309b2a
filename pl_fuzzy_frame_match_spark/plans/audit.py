"""Physical-plan audit: programmatic pre-flight checks over
``df.explain()`` output, for CI plan guards and for eyeballing a query
before pointing it at 100 TB.

The properties worth asserting are the ones that decide whether a plan
survives a 1000-executor scale-up:

- no accidental ``BroadcastNestedLoopJoin`` / ``CartesianProduct``
  (an equi-join that degenerated, or an inequality predicate Spark
  couldn't hash);
- shuffle (``Exchange``) count matches the operator's shuffle budget
  (PLANS.md §5 inventory);
- filters and projections actually reached the parquet scan
  (``PushedFilters`` / ``ReadSchema``);
- the hot expressions sit inside ``WholeStageCodegen`` spans.

``audit(df)`` returns the counters; the ``assert_*`` helpers raise
``PlanAssertionError`` with the offending plan attached, so a CI
failure shows WHAT plan regressed, not just that one did.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame


class PlanAssertionError(AssertionError):
    def __init__(self, message: str, plan: str):
        super().__init__(f"{message}\n--- physical plan ---\n{plan}")
        self.plan = plan


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as text (same as
    ``df.explain()`` output, returned instead of printed)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanAudit:
    exchanges: int
    broadcast_exchanges: int
    nested_loop_joins: int
    cartesian_products: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    codegen_spans: int
    pushed_filters: bool
    plan: str


def audit(df: DataFrame) -> PlanAudit:
    """Count the scale-relevant operators in the physical plan.
    ``exchanges`` excludes broadcast exchanges (which move the SMALL
    side only and are the cheap kind)."""
    plan = physical_plan(df)
    broadcast_ex = len(re.findall(r"BroadcastExchange", plan))
    # \bExchange\b cannot match inside "BroadcastExchange" ('t' is a
    # word char, so there is no boundary before the 'E'), so this count
    # is shuffle Exchanges ONLY — do not subtract broadcast_exchanges
    # from it again downstream.
    all_ex = len(re.findall(r"\bExchange\b", plan))
    return PlanAudit(
        exchanges=all_ex,
        broadcast_exchanges=broadcast_ex,
        nested_loop_joins=len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        cartesian_products=len(re.findall(r"CartesianProduct", plan)),
        broadcast_hash_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        codegen_spans=len(re.findall(r"WholeStageCodegen", plan)),
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        plan=plan,
    )


def assert_no_nested_loop(df: DataFrame) -> None:
    """Fail if the plan contains a BroadcastNestedLoopJoin or a
    CartesianProduct — the join shapes that do per-pair work and die
    at scale. (The fuzzy matcher's exact candidate stage uses a
    DELIBERATE cross join; don't point this at it.)"""
    a = audit(df)
    if a.nested_loop_joins or a.cartesian_products:
        raise PlanAssertionError(
            f"nested-loop/cartesian join in plan "
            f"(BNLJ={a.nested_loop_joins}, cartesian={a.cartesian_products})",
            a.plan,
        )


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """Fail if the plan has more than ``n`` non-broadcast Exchanges —
    the operator's shuffle budget (PLANS.md §5). ``audit().exchanges``
    already excludes BroadcastExchange (the regex can't match inside
    the longer token), so it is used directly — subtracting
    ``broadcast_exchanges`` again would under-count and wave through
    over-budget plans that contain broadcast joins."""
    a = audit(df)
    real = a.exchanges
    if real > n:
        raise PlanAssertionError(
            f"{real} shuffles in plan, budget is {n}", a.plan
        )


def assert_scan_pruned(
    df: DataFrame, expect_columns: Optional[set] = None
) -> None:
    """Fail if the parquet scan reads more than the expected columns
    (column pruning regressed), or — when ``expect_columns`` is None —
    if no ReadSchema is visible at all."""
    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        raise PlanAssertionError("no ReadSchema in plan (not a scan?)", plan)
    if expect_columns is not None:
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        if cols - set(expect_columns):
            raise PlanAssertionError(
                f"scan reads {sorted(cols)}, expected within "
                f"{sorted(expect_columns)}",
                plan,
            )


def assert_rank_limit_pushed(df: DataFrame) -> None:
    """Fail unless a global/grouped top-k ranking plan carries a rank
    pushdown operator — ``WindowGroupLimit`` (Spark >= 3.5's
    InferWindowGroupLimit rewrite of ``rank() <= k`` filters) or a
    ``TakeOrderedAndProject``. Without one, a global window ranking
    degenerates to sorting ALL rows in ONE partition — the canonical
    does-not-survive-100x plan. Pinned by CI so a conf change or Spark
    regression can't silently bring the single-partition sort back
    (VERDICT r3 #4)."""
    a = audit(df)
    if not re.search(r"WindowGroupLimit|TakeOrderedAndProject", a.plan):
        raise PlanAssertionError(
            "no WindowGroupLimit/TakeOrderedAndProject in ranking plan "
            "(global top-k would single-partition sort)",
            a.plan,
        )
