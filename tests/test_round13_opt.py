"""Round-13 optimization tests: basket-form skew guards, the bounded
negative-sampling rank fast path, and the skipgram empty-path guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pl_fuzzy_frame_match_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_round13_opt")


def _reference_pairs(spark, rows, weighted=False):
    """Join-form reference for cooccurrence_edges (the pre-r12 shape)."""
    df = spark.createDataFrame(rows, "g long, u long")
    items = df.where(
        F.col("g").isNotNull() & F.col("u").isNotNull()
    ).distinct()
    other = items.select("g", F.col("u").alias("v"))
    pairs = items.join(other, "g").where(F.col("u") < F.col("v"))
    if weighted:
        return {
            (r["u"], r["v"], r["w"])
            for r in pairs.groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("double").alias("w"))
            .collect()
        }
    return {(r["u"], r["v"]) for r in pairs.select("u", "v").distinct().collect()}


def _hot_rows():
    """One hot group (id 0, 60 items -> quadratic 1770 pairs) plus
    small baskets, with cross-group repeat pairs so the weighted path
    is exercised across the hot/cold route boundary."""
    rows = [(0, i) for i in range(60)]  # hot group
    rows += [(1, 1), (1, 2), (1, 3)]
    rows += [(2, 1), (2, 2)]  # (1,2) repeats in group 1, 2 and hot 0
    rows += [(3, 7), (3, 8), (3, 7)]  # duplicate item in basket
    return rows


@pytest.mark.parametrize("weighted", [False, True])
def test_cooccurrence_hot_group_guard_matches_join_form(spark, weighted):
    from pl_fuzzy_frame_match_spark.operators.graph import (
        cooccurrence_edges,
    )

    rows = _hot_rows()
    df = spark.createDataFrame(rows, "g long, u long")
    # max_basket below the hot group size: group 0 must route through
    # the join form, groups 1-3 through the in-array basket form
    out = cooccurrence_edges(df, "g", "u", weighted=weighted, max_basket=10)
    ref = _reference_pairs(spark, rows, weighted=weighted)
    if weighted:
        got = {(r["u"], r["v"], r["w"]) for r in out.collect()}
    else:
        got = {(r["u"], r["v"]) for r in out.collect()}
    assert got == ref


def test_cooccurrence_guard_default_and_disabled_agree(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import (
        cooccurrence_edges,
    )

    rows = _hot_rows()
    df = spark.createDataFrame(rows, "g long, u long")
    ref = _reference_pairs(spark, rows)
    for max_basket in (None, 2, 10_000):
        out = cooccurrence_edges(df, "g", "u", max_basket=max_basket)
        assert {(r["u"], r["v"]) for r in out.collect()} == ref


def test_association_rules_hot_basket_guard(spark):
    from pl_fuzzy_frame_match_spark.operators.rules import (
        association_rules,
    )

    rows = _hot_rows()
    df = spark.createDataFrame(rows, "g long, item long")
    guarded = association_rules(
        df, "g", "item", min_support_count=1, max_basket=10
    ).collect()
    unguarded = association_rules(
        df, "g", "item", min_support_count=1, max_basket=None
    ).collect()

    def key(rows_):
        return {
            (
                r["antecedent"],
                r["consequent"],
                r["pair_count"],
                r["antecedent_count"],
                r["support"],
                r["confidence"],
                r["lift"],
            )
            for r in rows_
        }

    assert key(guarded) == key(unguarded)
    # sanity: the hot basket's quadratic directional pairs are present
    got = {(r["antecedent"], r["consequent"]) for r in guarded}
    assert (5, 6) in got and (6, 5) in got  # both directions, hot basket


def test_negative_sampled_pairs_fast_path_matches_distributed(spark):
    import pl_fuzzy_frame_match_spark.operators.graph as graph_mod

    pairs = spark.createDataFrame(
        [(1, 2, 3), (2, 5, 1), (9, 1, 2)],
        "center long, context long, cnt long",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 5, 9, 12, 7)], "node long"
    )
    fast = graph_mod.negative_sampled_pairs(
        pairs, nodes, negatives=2, seed="n"
    ).collect()
    # force the distributed rank path by shrinking the bound
    orig = graph_mod.PAGERANK_BROADCAST_NODES
    graph_mod.PAGERANK_BROADCAST_NODES = 0
    try:
        slow = graph_mod.negative_sampled_pairs(
            pairs, nodes, negatives=2, seed="n"
        ).collect()
    finally:
        graph_mod.PAGERANK_BROADCAST_NODES = orig

    def key(rows_):
        return sorted(
            (r["center"], r["context"], r["label"], r["cnt"]) for r in rows_
        )

    assert key(fast) == key(slow)
    # 3 positives + 3*2 negatives
    assert len(fast) == 9


def test_skipgram_pairs_from_paths_empty_path_guard(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import (
        skipgram_pairs_from_paths,
    )

    paths = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, []), (3, None)],
        "start long, path array<long>",
    )
    out = skipgram_pairs_from_paths(paths, window=2).collect()
    got = {(r["center"], r["context"]): r["cnt"] for r in out}
    # only walk 1 contributes; empty/null paths yield no rows (and no
    # runtime error — ADVICE r12 item 1)
    assert got == {
        (1, 2): 1,
        (1, 3): 1,
        (2, 1): 1,
        (2, 3): 1,
        (3, 1): 1,
        (3, 2): 1,
    }
