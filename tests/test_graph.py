"""Connected-components / cluster-dedup operator tests."""

import pytest
from pyspark.sql import functions as F

from pl_fuzzy_frame_match_spark.operators.graph import (
    canonical_corpus,
    connected_components,
    dedup_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["left_id", "right_id"])
    return {
        (r["node"], r["component"])
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_cycle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges_logarithmically(spark, monkeypatch):
    # a 64-node path: naive min-propagation needs ~63 rounds; the
    # pointer-jumping frontier must finish well inside max_rounds=12.
    # Force the distributed loop (small edge sets otherwise take the
    # driver union-find fast path).
    from pl_fuzzy_frame_match_spark.operators import graph as G

    monkeypatch.setattr(G, "SMALL_GRAPH_EDGE_LIMIT", -1)
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_rounds=12)
    assert got == {(i, 0) for i in range(64)}


def test_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The small-graph driver union-find and the pointer-jumping loop
    are the same operator — their labelings must be identical (min
    reachable id is a unique fixpoint) on a mixed graph of chains,
    cycles, stars and singleton bridges."""
    import random

    from pl_fuzzy_frame_match_spark.operators import graph as G

    rng = random.Random(41)
    edges = [(i, i + 1) for i in range(0, 30)]          # chain
    edges += [(100 + i, 100 + (i + 1) % 7) for i in range(7)]  # cycle
    edges += [(200, 200 + i) for i in range(1, 9)]      # star
    edges += [(rng.randrange(300, 340), rng.randrange(300, 340))
              for _ in range(25)]                        # random blob
    fast = _cc(spark, edges)
    monkeypatch.setattr(G, "SMALL_GRAPH_EDGE_LIMIT", -1)
    slow = _cc(spark, edges)
    assert fast == slow


def test_min_id_not_an_endpoint_ordering(spark):
    # min id enters the cluster "late" via a high-id bridge
    got = _cc(spark, [(7, 9), (9, 3), (3, 5), (5, 0)])
    assert got == {(7, 0), (9, 0), (3, 0), (5, 0), (0, 0)}


def test_dedup_components_labels_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], ["left_id", "right_id"])
    labeled = dedup_components(df, pairs, "doc_id")
    got = {(r["doc_id"], r["component"]) for r in labeled.collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3), (4, 1), (5, 1)}


def test_canonical_corpus_keeps_min_per_cluster(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 4), (4, 5), (2, 3)], ["left_id", "right_id"]
    )
    kept = canonical_corpus(df, pairs, "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2}


def test_empty_edges(spark):
    pairs = spark.createDataFrame([], "left_id long, right_id long")
    assert connected_components(pairs).count() == 0
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    assert canonical_corpus(df, pairs, "doc_id").count() == 2


def test_nonconvergence_raises(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark.operators import graph as G

    monkeypatch.setattr(G, "SMALL_GRAPH_EDGE_LIMIT", -1)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["left_id", "right_id"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_distributed_rounds_log_bound(spark, monkeypatch):
    """Iteration-count CONTRACT for the pointer-jumping loop (VERDICT
    r7 #4): on a path graph of diameter d it converges in at most
    ceil(log2(d)) + 3 rounds (hash-to-min doubles the reach of every
    label per round; +3 covers init, the detect-no-change round, and
    one slack round), and the round counter instrumentation reports
    how many it actually took. scripts/probe_graph_scale.py measures
    the same bound past the 2M-edge crossover (PLANS.md round 8)."""
    import math

    from pl_fuzzy_frame_match_spark.operators import graph as G

    monkeypatch.setattr(G, "SMALL_GRAPH_EDGE_LIMIT", -1)

    def cc_rounds(edges):
        df = spark.createDataFrame(edges, ["left_id", "right_id"])
        out, rounds = connected_components(df, return_rounds=True)
        return {(r["node"], r["component"]) for r in out.collect()}, rounds

    for n in (64, 511):
        got, rounds = cc_rounds([(i, i + 1) for i in range(n - 1)])
        assert got == {(i, 0) for i in range(n)}
        bound = math.ceil(math.log2(n - 1)) + 3
        assert 0 < rounds <= bound, (n, rounds, bound)
    # star cluster: diameter 2 -> constant rounds regardless of size
    got, rounds = cc_rounds([(0, i) for i in range(1, 40)])
    assert got == {(i, 0) for i in range(40)}
    assert rounds <= 3
