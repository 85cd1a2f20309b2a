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
    import time

    # the ContextCleaner unpersists dropped checkpoint RDDs
    # asynchronously — give it a bounded settle window before judging
    # (observed flake when this file runs inside a long session)
    for _ in range(5):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        after = _n_cached(spark)
        if after - before < 6:
            break
        time.sleep(1.0)
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
# O9 variant-join parallelism floor (round 10): the rescore chain must
# run cluster-wide once the estimated volume crosses one task
# ---------------------------------------------------------------------------


def test_neighborhood_join_parallelism_floored_at_cores(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.candidates import (
        neighborhood_scored_pairs,
    )

    cust = spark.read.parquet(
        "/root/testdata/sf0.01/customer.parquet"
    ).select("c_name").where(F.col("c_name").isNotNull()).distinct()
    rk = cust.select(F.col("c_name").alias("r_name"))
    out = neighborhood_scored_pairs(
        cust, rk, "c_name", "r_name", 0.08,
        n_left_keys=1500, n_right_keys=1500, cap=1,
    )
    # est 1500 * 32 = 48K pairs < one task -> no repartition forced;
    # the point is the LARGE shape: assert the floor arithmetic via a
    # shape that crosses PAIRS_PER_TASK
    big = cust.crossJoin(spark.range(10).select(F.lit("x").alias("__p")))
    bigk = big.select(
        F.concat_ws("-", "c_name", F.monotonically_increasing_id().cast("string")).alias("c_name")
    ).localCheckpoint(eager=True)
    n = bigk.count()
    bigr = bigk.select(F.col("c_name").alias("r_name"))
    wide = neighborhood_scored_pairs(
        bigk, bigr, "c_name", "r_name", 0.08,
        n_left_keys=n, n_right_keys=n, cap=1,
    )
    cores = spark.sparkContext.defaultParallelism
    # the variant join's probe side must be hash-repartitioned at >=
    # core-count width (the round-10 fix: est volume lowballed the
    # join output and the rescore serialized on 2 tasks); the FINAL
    # frame's partition count is AQE-coalesced, so assert on the plan
    plan = wide._jdf.queryExecution().analyzed().toString()
    import re

    widths = [
        int(m) for m in re.findall(r"RepartitionByExpression.*?, (\d+)", plan)
    ]
    assert widths and max(widths) >= cores, (widths, cores, plan[:500])
    assert out.count() >= 0


# ---------------------------------------------------------------------------
# IVF-PQ recall gate on the REAL gate corpus (VERDICT r9 #7): the
# synthetic clusterable corpus measures 1.0; the sf0.01 embeddings are
# near-unstructured 64-dim vectors — the regime where coarse pruning
# actually loses neighbors. Deterministic (seeded init, md5-ordered
# train sample, fixed iteration counts), so an exact gate is safe.
# ---------------------------------------------------------------------------


def test_ivfpq_recall_on_gate_corpus(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 50)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            probes, emb, "embedding", "vec_id", k=5
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            probes, emb, "embedding", "vec_id", k=5, n_clusters=16,
            n_probe=10, m=8, ksub=256, refine=12,
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.85, f"IVF-PQ gate-corpus recall too low: {recall}"


# ---------------------------------------------------------------------------
# HyperLogLog (round 10): mergeable md5-register sketch, exactly
# SQL-replayable; merge(sketch(A), sketch(B)) == sketch(A u B) EXACTLY
# ---------------------------------------------------------------------------


def test_hll_merge_equals_sketch_of_union(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    union = a.unionByName(b)
    merged = {
        (r["reg_idx"], r["rho"])
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    }
    direct = {
        (r["reg_idx"], r["rho"])
        for r in hll_registers(union, "k").collect()
    }
    assert merged == direct  # exact register equality, not approximate


def test_hll_estimate_within_error_bound(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_error_bound,
        hll_estimate,
        hll_registers,
    )

    n = 20000
    df = spark.range(n).select(F.col("id").alias("k"))
    row = hll_estimate(hll_registers(df, "k")).collect()[0]
    bound = 4 * hll_error_bound()  # 4 sigma of the 1.04/sqrt(m) SE
    assert abs(row["hll_estimate"] - n) / n <= bound, row
    assert row["m"] == 4096


def test_hll_determinism_and_null_keys(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_distinct_report,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (2, "b")], "uid long, name string"
    )
    r1 = {tuple(r) for r in hll_distinct_report(df, ["uid", "name"]).collect()}
    r2 = {tuple(r) for r in hll_distinct_report(df, ["uid", "name"]).collect()}
    assert r1 == r2
    by_key = {r[0]: r for r in r1}
    assert by_key["uid"][4] == 3  # exact_distinct
    assert by_key["name"][4] == 2  # nulls excluded
    # tiny cardinalities sit in the linear-counting regime: exact-ish
    assert abs(by_key["uid"][3] - 3) < 0.1


# ---------------------------------------------------------------------------
# Link prediction (round 10): hand-checked scores on a tiny graph
# ---------------------------------------------------------------------------


def test_link_prediction_hand_graph(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import link_prediction

    # path 1-2-3 plus 2-4: distance-2 pairs through middle 2 (deg 3):
    # (1,3), (1,4), (3,4) — each cn=1, aa=1/ln(3); no other middles
    edges = _edges(spark, [(1, 2), (2, 3), (2, 4)])
    rows = {(r["u"], r["v"]): r for r in link_prediction(edges, k=10).collect()}
    import math

    assert set(rows) == {(1, 3), (1, 4), (3, 4)}
    for r in rows.values():
        assert r["common_neighbors"] == 1
        assert abs(r["adamic_adar"] - round(1.0 / math.log(3), 6)) < 1e-9
        # deg(1)=deg(3)=deg(4)=1 -> jaccard = 1/(1+1-1) = 1.0
        assert r["jaccard"] == 1.0


def test_link_prediction_excludes_existing_edges_and_purges_hubs(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import link_prediction

    # triangle 1-2-3: every distance-2 pair is already adjacent
    tri = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert link_prediction(tri, k=10).count() == 0
    # star through a hub: purging the hub removes every candidate
    star = _edges(spark, [(100, i) for i in range(1, 8)])
    assert link_prediction(star, k=10, max_degree=3).count() == 0
    assert link_prediction(star, k=100, max_degree=None).count() == 21


# ---------------------------------------------------------------------------
# Exact distributed quantiles (round 10): quantile_disc contract via
# range-partition prefix sums — hand-checked + native-agreement
# ---------------------------------------------------------------------------


def test_exact_quantiles_hand_case_with_duplicates(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [(10.0,), (10.0,), (20.0,), (30.0,)], "x double"
    )
    got = {r["q"]: (r["x"], r["position"]) for r in
           exact_quantiles(df, "x", [0.0, 0.25, 0.5, 0.75, 1.0]).collect()}
    # n=4: positions max(1, ceil(q*4)) = 1,1,2,3,4 -> 10,10,10,20,30
    assert got == {0.0: (10.0, 1), 0.25: (10.0, 1), 0.5: (10.0, 2),
                   0.75: (20.0, 3), 1.0: (30.0, 4)}


def test_exact_quantiles_matches_duckdb_native(spark):
    import duckdb

    from pl_fuzzy_frame_match_spark.operators.quantiles import exact_quantiles

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = {r["q"]: r["l_quantity"] for r in
           exact_quantiles(li, "l_quantity", qs).collect()}
    native = duckdb.sql(
        "SELECT quantile_disc(l_quantity, "
        f"{qs}) FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchall()[0][0]
    assert [got[q] for q in qs] == list(native)


def test_exact_quantiles_empty_and_validation(spark):
    import pytest

    from pl_fuzzy_frame_match_spark.operators.quantiles import exact_quantiles

    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0
    with pytest.raises(ValueError):
        exact_quantiles(empty, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(empty, "x", [1.5])


# ---------------------------------------------------------------------------
# Count-Min sketch (round 10): one-sided error, exact sum-merge
# ---------------------------------------------------------------------------


def test_cm_never_undercounts_and_is_exact_when_sparse(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_sketch,
    )

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sk = cm_sketch(df, "k")
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("never",)], "k string")
    got = {r["k"]: r["cm_estimate"] for r in cm_estimate(sk, keys, "k").collect()}
    exact = {"a": 100, "b": 10, "c": 1, "never": 0}
    for k, true in exact.items():
        assert got[k] >= true  # one-sided
    # 3 keys into 1024 buckets x 4 rows: min-of-rows is exact w.h.p.
    # and deterministically so for this fixed md5 layout
    assert got == exact


def test_cm_merge_equals_sketch_of_concatenation(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_merge,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "k string")
    b = spark.createDataFrame([("y",)] * 5 + [("z",)] * 2, "k string")
    both = a.unionByName(b)
    merged = {(r["row"], r["bucket"], r["cnt"])
              for r in cm_merge(cm_sketch(a, "k"), cm_sketch(b, "k")).collect()}
    direct = {(r["row"], r["bucket"], r["cnt"])
              for r in cm_sketch(both, "k").collect()}
    assert merged == direct  # exact cell-level equality


# ---------------------------------------------------------------------------
# BM25 + RRF (round 10): hand-checked scoring and fusion
# ---------------------------------------------------------------------------


def test_bm25_hand_scores(spark):
    import math

    from pl_fuzzy_frame_match_spark.operators.retrieval import (
        bm25_idf,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat fish"), (3, "bird")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            bm25_topk(docs, "text", "doc_id", ["cat"], k=10).collect()}
    assert set(rows) == {1, 2}  # doc 3 has no query term
    # N=3, df(cat)=2; doc1: tf=1, dl=2; doc2: tf=3, dl=4; avgdl=7/3
    idf = bm25_idf(3, 2)
    avgdl = 7.0 / 3.0
    s1 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl))
    s2 = idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 4 / avgdl))
    assert abs(rows[1]["bm25"] - round(s1, 6)) < 1e-9
    assert abs(rows[2]["bm25"] - round(s2, 6)) < 1e-9
    assert rows[2]["rank"] == 1 and rows[1]["rank"] == 2  # tf wins


def test_rrf_fusion_hand_case(spark):
    from pl_fuzzy_frame_match_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in
           rrf_fuse([a, b], "doc_id", k=10).collect()}
    # 20 appears in both lists -> highest fused score
    assert got[20][1] == 1
    assert got[20][0] == round(1 / 62 + 1 / 61, 6)
    assert got[10][0] == round(1 / 61, 6)
    assert got[30][0] == round(1 / 62, 6)
    # tie between 10 (1/61) and 30 (1/62): 10 scores higher
    assert got[10][1] == 2 and got[30][1] == 3


# ---------------------------------------------------------------------------
# Streaming twins of the round-10 sketches: batch == stream exactly
# ---------------------------------------------------------------------------


def _write_event_batches(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    src = os.path.join(str(tmp_path), "src")
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 5000).select(F.col("id").alias("k"))
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    return src, a.unionByName(b)


def test_stream_hll_registers_equals_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.hll import hll_registers
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_hll_registers,
    )

    src, all_rows = _write_event_batches(spark, tmp_path)
    out = stream_hll_registers(spark, src, "k long", "k")
    q = (
        out.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["reg_idx"], r["rho"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    batch = {
        (r["reg_idx"], r["rho"])
        for r in hll_registers(all_rows, "k").collect()
    }
    assert streamed == batch


def test_stream_cm_sketch_equals_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.countmin import cm_sketch
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_cm_sketch,
    )

    src, all_rows = _write_event_batches(spark, tmp_path)
    out = stream_cm_sketch(spark, src, "k long", "k")
    q = (
        out.writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["row"], r["bucket"], r["cnt"])
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    batch = {
        (r["row"], r["bucket"], r["cnt"])
        for r in cm_sketch(all_rows, "k").collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# PII scan/redact (round 10): hand-checked detection and scrubbing
# ---------------------------------------------------------------------------


def test_pii_scan_hand_counts(spark):
    from pl_fuzzy_frame_match_spark.functions.pii import pii_scan

    df = spark.createDataFrame(
        [(1, "mail a.b+c@test.org and x@y.io, ip 10.0.0.1"),
         (2, "ssn 123-45-6789 and phone 555-123-4567"),
         (3, "clean text, version 1.2 only")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(df, "text", "doc_id").collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 1
    assert got[1]["n_pii_total"] == 3
    # SSN precedence: the SSN must not double-count as a phone
    assert got[2]["n_ssn"] == 1 and got[2]["n_phone"] == 1
    assert got[2]["n_pii_total"] == 2
    assert got[3]["n_pii_total"] == 0


def test_pii_redact_scrubs_every_form(spark):
    from pl_fuzzy_frame_match_spark.functions.pii import (
        PII_PATTERNS,
        pii_redact,
        synthesize_pii_corpus,
    )
    import re

    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(0, 40)],
        "doc_id long, text string",
    )
    aug = synthesize_pii_corpus(base, "text", "doc_id")
    red = pii_redact(aug, "text", "doc_id")
    rows = {r["doc_id"]: r for r in red.collect()}
    # doc 0 is divisible by 3, 5, 7 and 11: all four forms planted
    assert rows[0]["n_redacted"] == 4
    assert rows[1]["n_redacted"] == 0
    # apply the same redaction order in Python and verify nothing
    # matching any pattern survives in the redacted text
    aug_rows = {r["doc_id"]: r["text"] for r in aug.collect()}
    for i, txt in aug_rows.items():
        clean = txt
        for kind in ("email", "ssn", "phone", "ipv4"):
            clean = re.sub(PII_PATTERNS[kind], f"[{kind.upper()}]", clean)
        for kind, pat in PII_PATTERNS.items():
            assert not re.search(pat, clean), (i, kind, clean)
    # determinism of the fingerprint
    again = {r["doc_id"]: r["redacted_md5"] for r in red.collect()}
    assert again == {i: r["redacted_md5"] for i, r in rows.items()}


# ---------------------------------------------------------------------------
# Markov transitions (round 10): hand-checked chain + row-normalization
# ---------------------------------------------------------------------------


def test_markov_transitions_hand_chain(spark):
    import datetime as dt

    from pl_fuzzy_frame_match_spark.queries import events_markov_transitions

    # build a tiny events table in a temp view shape the query reads?
    # events_markov_transitions reads from parquet — test the logic
    # inline instead with the same plan
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, 10, t0, "a"), (2, 10, t0 + dt.timedelta(minutes=1), "b"),
        (3, 10, t0 + dt.timedelta(minutes=2), "a"),
        (4, 20, t0, "a"), (5, 20, t0 + dt.timedelta(minutes=1), "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["event_type"], r["next_type"]): r["n"] for r in trans.collect()}
    # user 10: a->b, b->a; user 20: a->a
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


def test_markov_probs_row_normalize(spark):
    from pl_fuzzy_frame_match_spark.queries import events_markov_transitions

    out = events_markov_transitions(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        sums[r["event_type"]] += r["prob"]
    for et, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (et, s)  # rows normalize per source
