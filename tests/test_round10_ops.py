"""Round-10 additions: ADVICE-r9 hardening — defensive edge
canonicalization in the graph family, adjacency-cache lifetime,
bounded-by-default entity-resolution blocking, and the
blocking-quality degenerate-input guard."""

from __future__ import annotations

import inspect


# ---------------------------------------------------------------------------
# Graph: both-orientation edge lists must not double degrees/triangles
# (ADVICE r9 — _canonical_edges)
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "u long, v long")


def test_pagerank_both_orientations_equal_canonical(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import pagerank

    canonical = [(1, 2), (2, 3), (1, 3), (3, 4)]
    both = canonical + [(v, u) for u, v in canonical]
    a = {r["node"]: round(r["rank"], 9)
         for r in pagerank(_edges(spark, canonical), iterations=3).collect()}
    b = {r["node"]: round(r["rank"], 9)
         for r in pagerank(_edges(spark, both), iterations=3).collect()}
    assert a == b


def test_weighted_pagerank_merges_orientations(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import pagerank

    # (1,2,w=1)+(2,1,w=2) must behave as ONE undirected edge of weight 3
    merged = spark.createDataFrame(
        [(1, 2, 3.0), (2, 3, 1.0)], "u long, v long, w double"
    )
    split = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 2.0), (2, 3, 1.0)], "u long, v long, w double"
    )
    a = {r["node"]: round(r["rank"], 9)
         for r in pagerank(merged, iterations=3, weight_col="w").collect()}
    b = {r["node"]: round(r["rank"], 9)
         for r in pagerank(split, iterations=3, weight_col="w").collect()}
    assert a == b


def test_triangle_stats_both_orientations_equal_canonical(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import triangle_stats

    canonical = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    both = canonical + [(v, u) for u, v in canonical]
    key = lambda rows: sorted(
        (r["node"], r["degree"], r["triangles"], round(r["clustering"], 9))
        for r in rows
    )
    assert key(triangle_stats(_edges(spark, canonical)).collect()) == key(
        triangle_stats(_edges(spark, both)).collect()
    )
    # sanity: degrees are the true undirected degrees, not doubled
    got = {r["node"]: r["degree"]
           for r in triangle_stats(_edges(spark, both)).collect()}
    assert got == {1: 2, 2: 3, 3: 3, 4: 2}


def test_label_propagation_both_orientations_equal_canonical(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import label_propagation

    canonical = [(1, 2), (2, 3), (10, 11)]
    both = canonical + [(v, u) for u, v in canonical]
    key = lambda df: sorted((r["node"], r["label"]) for r in df.collect())
    assert key(label_propagation(_edges(spark, canonical), rounds=2)) == key(
        label_propagation(_edges(spark, both), rounds=2)
    )


# ---------------------------------------------------------------------------
# Graph: iterative operators release their adjacency cache (ADVICE r9)
# ---------------------------------------------------------------------------


def _n_cached(spark):
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_iterative_graph_ops_release_cache(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import (
        eigenvector_centrality,
        label_propagation,
        pagerank,
    )

    edges = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    before = _n_cached(spark)
    pagerank(edges, iterations=2).count()
    eigenvector_centrality(edges, iterations=2).count()
    label_propagation(edges, rounds=2).count()
    # localCheckpoint RDDs of the RESULTS may remain; the persisted
    # adjacency frames must not accumulate (one per call = +3 here).
    # Allow the checkpoint residue but catch adjacency leaks: the
    # cached-RDD count may not grow by the three adjacency frames.
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    after = _n_cached(spark)
    leaked_adjacency = after - before >= 6  # 3 adj + 3 result ckpts
    assert not leaked_adjacency, (before, after)


# ---------------------------------------------------------------------------
# Blocking: bounded-by-default resolve_entities (ADVICE r9)
# ---------------------------------------------------------------------------


def test_resolve_entities_default_is_bounded():
    from pl_fuzzy_frame_match_spark.operators import blocking

    sig = inspect.signature(blocking.resolve_entities)
    assert sig.parameters["max_block"].default == blocking.DEFAULT_MAX_BLOCK
    assert blocking.DEFAULT_MAX_BLOCK is not None
    assert 0 < blocking.DEFAULT_MAX_BLOCK <= 1000


def test_resolve_entities_default_matches_unbounded_on_small_corpus(spark):
    # every block far under the cap -> bounded default must equal the
    # exhaustive (oracle-parity) configuration
    from pl_fuzzy_frame_match_spark.operators.blocking import resolve_entities

    df = spark.createDataFrame(
        [("smith john",), ("smith jon",), ("doe jane",), ("doe janet",),
         ("unique name",)],
        "name string",
    )
    key = lambda frame: sorted(
        (r["name"], r["canonical_name"]) for r in frame.collect()
    )
    assert key(resolve_entities(df, "name")) == key(
        resolve_entities(df, "name", max_block=None)
    )


# ---------------------------------------------------------------------------
# Blocking: degenerate-input guard in blocking_quality (ADVICE r9)
# ---------------------------------------------------------------------------


def test_blocking_quality_single_name_clean_fixed_points(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import blocking_quality

    df = spark.createDataFrame([("only name",)], "name string")
    rows = blocking_quality(df, "name").collect()
    assert len(rows) == 3  # one row per tier, none dropped
    for r in rows:
        assert r["n_candidates"] == 0
        assert r["n_found"] == 0
        assert r["n_true"] == 0
        assert r["recall"] == 1.0  # vacuous: empty truth set
        assert r["reduction_ratio"] == 1.0  # nothing to reduce


def test_blocking_quality_empty_input(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import blocking_quality

    df = spark.createDataFrame([], "name string")
    rows = blocking_quality(df, "name").collect()
    assert len(rows) == 3
    assert all(
        r["recall"] == 1.0 and r["reduction_ratio"] == 1.0 for r in rows
    )


# ---------------------------------------------------------------------------
# ER survivorship quality (VERDICT r9 #8) — pair-counting precision/recall
# ---------------------------------------------------------------------------


def test_er_quality_perfect_on_easy_clusters(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import er_quality

    # two tight clusters (prefix+phonetic blocks catch them) + singleton
    df = spark.createDataFrame(
        [("smith john",), ("smith johm",), ("brown alice",),
         ("brown alica",), ("zzz unique",)],
        "name string",
    )
    row = er_quality(df, "name", threshold=0.88).collect()[0]
    assert row["n_names"] == 5
    assert row["resolved_pairs"] == row["truth_pairs"] == row["common_pairs"]
    assert row["pair_precision"] == 1.0 and row["pair_recall"] == 1.0


def test_er_quality_no_matches_vacuous(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import er_quality

    df = spark.createDataFrame(
        [("alpha",), ("kilo victor",), ("whiskey xray",)], "name string"
    )
    row = er_quality(df, "name", threshold=0.99).collect()[0]
    assert row["resolved_pairs"] == 0 and row["truth_pairs"] == 0
    assert row["pair_precision"] == 1.0 and row["pair_recall"] == 1.0


def test_er_quality_precision_never_counts_false_pairs(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import er_quality

    # blocked resolution can only MISS truth pairs (its match test is
    # the same threshold over a candidate subset + closure), so common
    # <= truth always; precision can drop only through closure chains,
    # which the truth closure also contains -> precision stays 1.0
    df = spark.createDataFrame(
        [("gamma ray",), ("gamma rey",), ("gamma roy",), ("delta one",)],
        "name string",
    )
    row = er_quality(df, "name", threshold=0.88).collect()[0]
    assert row["common_pairs"] <= row["truth_pairs"]
    assert row["pair_precision"] == 1.0


# ---------------------------------------------------------------------------
# O9 mid-volume-window promotion (VERDICT r9 #5): cap-1 neighborhood
# join replaces the lossy sketch scan when the probed candidate volume
# is small — lossless, probe-gated
# ---------------------------------------------------------------------------


def _xl_frames(spark):
    from pyspark.sql import functions as F

    cust = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).select("c_custkey", "c_name")
    return cust, cust.select(
        F.col("c_custkey").alias("r_key"), F.col("c_name").alias("r_name")
    )


def test_o9_mid_window_promotion_is_lossless(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs
    from pl_fuzzy_frame_match_spark.operators import matcher

    fired = {}
    real = matcher.neighborhood_scored_pairs

    def spy(*a, **kw):
        fired["o9"] = True
        return real(*a, **kw)

    monkeypatch.setattr(matcher, "neighborhood_scored_pairs", spy)
    left, right = _xl_frames(spark)
    maps = [FuzzyMapping("c_name", "r_name", threshold_score=92.0)]
    # cross_over=100 puts this shape in the mid-volume ANN window;
    # threshold 92 on ~18-char names -> edit cap 1 -> probe eligible
    mid = fuzzy_match_dfs(
        left, right, maps, cross_over_for_appr_nearest_neighbor=100.0
    )
    assert fired.get("o9"), "mid-window cap-1 shape did not promote to O9"
    exact = fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=False)
    score_col = mid.columns[-1]
    assert score_col == exact.columns[-1]
    key = lambda df: sorted(
        (r["c_custkey"], r["r_key"], round(r[score_col], 9))
        for r in df.collect()
    )
    assert key(mid) == key(exact)  # lossless: equals the exact join


def test_o9_mid_window_probe_rejects_dense_buckets(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs
    from pl_fuzzy_frame_match_spark.operators import matcher

    routed = {}
    real_o9 = matcher.neighborhood_scored_pairs
    real_ann = matcher.approx_scored_pairs

    def spy_o9(*a, **kw):
        routed["o9"] = True
        return real_o9(*a, **kw)

    def spy_ann(*a, **kw):
        routed["ann"] = True
        return real_ann(*a, **kw)

    monkeypatch.setattr(matcher, "neighborhood_scored_pairs", spy_o9)
    monkeypatch.setattr(matcher, "approx_scored_pairs", spy_ann)
    # force the probe verdict to "too dense": volume cap of 1
    monkeypatch.setattr(matcher, "NEIGHBORHOOD_MID_VOLUME_CAP", 1)
    left, right = _xl_frames(spark)
    maps = [FuzzyMapping("c_name", "r_name", threshold_score=92.0)]
    fuzzy_match_dfs(
        left, right, maps, cross_over_for_appr_nearest_neighbor=100.0
    ).count()
    assert routed.get("ann") and not routed.get("o9")


def test_neighborhood_candidate_volume_exact_tiny(spark):
    from pl_fuzzy_frame_match_spark.operators.candidates import (
        neighborhood_candidate_volume,
    )

    left = spark.createDataFrame([("abc",), ("xyz",)], "k string")
    right = spark.createDataFrame([("abd",), ("qqq",)], "k2 string")
    # U_1(abc) = {abc, ab, ac, bc}; U_1(abd) = {abd, ab, ad, bd}:
    # shared variant "ab" -> 1 candidate; xyz/qqq share nothing
    assert neighborhood_candidate_volume(left, right, "k", "k2", cap=1) == 1
