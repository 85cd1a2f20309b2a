"""Round-11 regression tests: the four ADVICE r10 items plus the
pagerank loop rework (VERDICT r10 #2)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


# ---------------------------------------------------------------------------
# ADVICE r10 #2: cm_estimate depth mismatch must fail fast, not
# silently undercount to 0
# ---------------------------------------------------------------------------


def test_cm_estimate_rejects_depth_above_build_depth(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, ["k"])
    sk = cm_sketch(df, "k", depth=2)
    keys = spark.createDataFrame([("a",), ("b",)], ["k"])
    with pytest.raises(ValueError, match="build depth"):
        cm_estimate(sk, keys, "k", depth=4)
    # matching depth still never undercounts
    got = {
        r["k"]: r["cm_estimate"]
        for r in cm_estimate(sk, keys, "k", depth=2).collect()
    }
    assert got["a"] >= 5 and got["b"] >= 3


def test_cm_estimate_empty_sketch_is_zero(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_sketch,
    )

    empty = spark.createDataFrame([], "k string")
    sk = cm_sketch(empty, "k", depth=4)
    keys = spark.createDataFrame([("never",)], ["k"])
    rows = cm_estimate(sk, keys, "k", depth=4).collect()
    assert rows[0]["cm_estimate"] == 0


# ---------------------------------------------------------------------------
# ADVICE r10 #3: hll_distinct_report rel_error zero-guard
# ---------------------------------------------------------------------------


def test_hll_report_all_null_column_rel_error_zero(spark):
    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_distinct_report,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (None,)], "k string"
    )
    row = hll_distinct_report(df, ["k"]).collect()[0]
    assert row["exact_distinct"] == 0
    assert row["hll_estimate"] == 0
    assert row["rel_error"] == 0.0


# ---------------------------------------------------------------------------
# ADVICE r10 #1: purged-block visibility for resolve_entities' bounded
# default
# ---------------------------------------------------------------------------


def test_purged_block_report_counts_hot_blocks(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        purged_block_report,
    )

    # 5 names sharing soundex code AND 3-prefix ("smith..."), 2 loners
    names = [f"smith{i}" for i in range(5)] + ["jones", "garcia"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    rep = {
        r["tier"]: r
        for r in purged_block_report(df, "name", max_block=3).collect()
    }
    assert rep["prefix"]["n_purged_blocks"] == 1
    assert rep["prefix"]["n_keys_in_purged"] == 5
    assert rep["prefix"]["largest_block"] == 5
    assert rep["phonetic"]["n_purged_blocks"] >= 1


def test_purged_block_report_clean_when_under_cap(spark):
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        purged_block_report,
    )

    df = spark.createDataFrame(
        [("alpha",), ("bravo",), ("circle",)], ["name"]
    )
    for r in purged_block_report(df, "name", max_block=3).collect():
        assert r["n_purged_blocks"] == 0
        assert r["n_keys_in_purged"] == 0
        assert r["largest_block"] == 0


# ---------------------------------------------------------------------------
# ADVICE r10 #4: the bench headline-length guard runs at startup
# ---------------------------------------------------------------------------


def test_bench_headline_guard_is_startup_checkable():
    import bench

    # must not raise with the shipped FLAGSHIP list, and must be
    # callable with zero bench state (second-0 validation)
    bench._check_headline_fits()
    line = bench._headline_line(
        {n: 99999.999 for n in bench.FLAGSHIP},
        99999.999, 99999.999, 9999, 99.999,
    )
    assert len(line) < 1800


# ---------------------------------------------------------------------------
# VERDICT r10 #2: pagerank rework — broadcast loop vs shuffle fallback
# equivalence, and duplicate-row semantics preserved
# ---------------------------------------------------------------------------


def test_pagerank_broadcast_and_shuffle_paths_agree(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], ["u", "v"]
    )
    fast = {
        r["node"]: round(r["rank"], 9)
        for r in graph.pagerank(edges, iterations=4).collect()
    }
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_NODES", 0)
    slow = {
        r["node"]: round(r["rank"], 9)
        for r in graph.pagerank(edges, iterations=4).collect()
    }
    assert fast.keys() == slow.keys()
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-9


# ---------------------------------------------------------------------------
# Round 11: mergeable histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hist_merge_equals_sketch_of_union(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_merge,
        hist_sketch,
    )

    a = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    b = spark.createDataFrame(
        [(float(i) * 3.7,) for i in range(60)], ["x"]
    )
    merged = {
        (r["bin"], r["cnt"])
        for r in hist_merge(
            hist_sketch(a, "x", 0.0, 250.0, 64),
            hist_sketch(b, "x", 0.0, 250.0, 64),
        ).collect()
    }
    union = {
        (r["bin"], r["cnt"])
        for r in hist_sketch(a.unionByName(b), "x", 0.0, 250.0, 64).collect()
    }
    assert merged == union


def test_hist_quantiles_one_bin_accuracy_vs_exact(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        exact_quantiles,
        hist_quantiles,
        hist_sketch,
    )

    df = spark.createDataFrame(
        [(float(i * i % 997),) for i in range(2000)], ["x"]
    )
    qs = (0.25, 0.5, 0.9)
    sk = hist_sketch(df, "x", 0.0, 1000.0, 200)  # 5.0-wide bins
    approx = {
        r["q"]: r["upper_edge"]
        for r in hist_quantiles(sk, qs, 0.0, 1000.0, 200).collect()
    }
    exact = {
        r["q"]: float(r["x"])
        for r in exact_quantiles(df, "x", qs).collect()
    }
    for q in qs:
        # upper edge is >= the exact quantile, within one bin width
        assert approx[q] >= exact[q]
        assert approx[q] - exact[q] <= 5.0 + 1e-9


def test_hist_sketch_saturates_out_of_range(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import hist_sketch

    df = spark.createDataFrame(
        [(-50.0,), (0.0,), (99.0,), (5000.0,), (None,)], ["x"]
    )
    cells = {
        r["bin"]: r["cnt"] for r in hist_sketch(df, "x", 0.0, 100.0, 10).collect()
    }
    assert cells[0] == 2  # -50 clamps into bin 0, 0.0 lands there
    assert cells[9] == 2  # 99 in last bin, 5000 clamps into it
    assert sum(cells.values()) == 4  # null excluded


# ---------------------------------------------------------------------------
# Round 11: k-core decomposition
# ---------------------------------------------------------------------------


def test_kcore_hand_graph_peels_tail(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import kcore

    # triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    got = {r["node"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert kcore(edges, k=3).count() == 0


def test_kcore_both_orientations_equal_canonical(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import kcore

    canon = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    both = canon + [(v, u) for u, v in canon]
    a = {
        (r["node"], r["core_degree"])
        for r in kcore(spark.createDataFrame(canon, ["u", "v"]), k=2).collect()
    }
    b = {
        (r["node"], r["core_degree"])
        for r in kcore(spark.createDataFrame(both, ["u", "v"]), k=2).collect()
    }
    assert a == b


def test_kcore_round_cap_raises(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import kcore

    # a long chain peels one node per end per round: cap of 1 must
    # fail loudly, not loop
    chain = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(chain, ["u", "v"])
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore(edges, k=2, max_rounds=1)


# ---------------------------------------------------------------------------
# VERDICT r10 #9: watermark late-data semantics — one stream, both
# outcomes: a beyond-watermark late row is DROPPED, a within-watermark
# late row is ACCEPTED
# ---------------------------------------------------------------------------


def test_stream_watermark_drops_late_accepts_in_window(spark, tmp_path):
    import datetime as dt
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_windowed_counts,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)  # noqa: E731
    src = str(tmp_path / "late_events")
    _os.makedirs(src)

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": [r[1] for r in rows],
                "value": [r[2] for r in rows],
            }
        )
        path = f"{src}/{name}"
        pq.write_table(tbl, path)
        _os.utime(path, (mtime, mtime))

    # batch 0: on-time rows; watermark afterwards = 01:00 - 10min = 00:50
    write("f1.parquet", [(t(1), "a", 1.0), (t(60), "a", 1.0)], 1_000)
    # batch 1 (watermark 00:50): finalizes + emits window 00:00 and
    # advances the watermark to 01:10
    write("f2.parquet", [(t(80), "a", 1.0)], 2_000)
    # batch 2 (watermark 01:10): 00:02 falls in a window finalized in
    # an EARLIER batch -> dropped; 00:55's window [00:50, 01:00) was
    # never finalized -> accepted and emitted this batch; 03:00 is the
    # on-time tail
    write(
        "f3.parquet",
        [(t(2), "a", 1.0), (t(55), "a", 1.0), (t(180), "a", 1.0)],
        3_000,
    )

    out = stream_windowed_counts(
        spark,
        src,
        spark.read.parquet(src).schema,
        window_seconds=600,
        watermark="10 minutes",
    )
    query = (
        out.writeStream.format("memory")
        .queryName("late_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("SELECT * FROM late_win").collect()
    }
    base = int(t(0).replace(tzinfo=dt.timezone.utc).timestamp())
    # the 00:02 row would make this 2 if the watermark did not drop it
    assert got[base] == 1
    # the 00:55 row was later than batch 1 but inside the watermark
    assert got[base + 50 * 60] == 1
    # static reference: without streaming semantics both rows count
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        windowed_event_counts,
    )

    batch = {
        r["window_start"]: r["n_events"]
        for r in windowed_event_counts(
            spark.read.parquet(src), window_seconds=600
        ).collect()
    }
    assert batch[base] == 2


# ---------------------------------------------------------------------------
# VERDICT r10 #3: walks broadcast-adjacency fast path == ranked-join
# fallback, hop for hop
# ---------------------------------------------------------------------------


def test_walks_broadcast_and_ranked_paths_agree(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)], ["u", "v"]
    )
    fast = {
        (r["start"], r["step"], r["node"])
        for r in graph.deterministic_walks(edges, length=5, seed="t").collect()
    }
    monkeypatch.setattr(graph, "WALK_ADJ_BROADCAST_EDGES", 0)
    slow = {
        (r["start"], r["step"], r["node"])
        for r in graph.deterministic_walks(edges, length=5, seed="t").collect()
    }
    assert fast == slow
    # every walk runs the full length (no dead ends on a connected
    # graph): 5 nodes x (5 steps + step 0)
    assert len(fast) == 5 * 6


def test_stream_hist_sketch_equals_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.quantiles import hist_sketch
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_hist_sketch,
    )

    src = os.path.join(str(tmp_path), "hist_src")
    a = spark.range(0, 3000).selectExpr("CAST(id AS DOUBLE) AS x")
    b = spark.range(1500, 5000).selectExpr("CAST(id * 1.7 AS DOUBLE) AS x")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    out = stream_hist_sketch(
        spark, src, "x double", "x", 0.0, 9000.0, 128
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hist_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["bin"], r["cnt"])
        for r in spark.sql("SELECT * FROM hist_cells").collect()
    }
    batch = {
        (r["bin"], r["cnt"])
        for r in hist_sketch(
            a.unionByName(b), "x", 0.0, 9000.0, 128
        ).collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# VERDICT r10 #8: corpus-size-scaled IVF-PQ parameters hold the 0.85
# recall gate (fixed gate-scale constants measured collapsing to
# 0.40-0.58 at a 10x unstructured corpus — PLANS.md round 11)
# ---------------------------------------------------------------------------


def test_ivfpq_auto_params_hold_recall_gate(spark):
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_auto_topk,
        ivfpq_recommended_params,
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
        for r in ivfpq_auto_topk(
            probes, emb, "embedding", "vec_id", k=5
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.85
    # the measured scaling law: refine grows with the corpus
    assert ivfpq_recommended_params(20_000, 5)["refine"] >= 100
    assert ivfpq_recommended_params(2_000, 5)["refine"] >= 13


# ---------------------------------------------------------------------------
# Round 11: grouped HLL — per-group sketches merge exactly and match
# the global sketch when there is one group
# ---------------------------------------------------------------------------


def test_grouped_hll_matches_global_and_merges(spark):
    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    # single group == global sketch, register for register
    one = df.select(F.lit("x").alias("g"), "k")
    grouped = {
        (r["reg_idx"], r["rho"])
        for r in hll_registers_by(one, "k", ["g"]).drop("g").collect()
    }
    glob = {
        (r["reg_idx"], r["rho"])
        for r in hll_registers(one, "k").collect()
    }
    assert grouped == glob
    # per-group estimates land within the 4-sigma HLL bound of truth
    ests = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate_by(
            hll_registers_by(df, "k", ["g"]), ["g"]
        ).collect()
    }
    for g, est in ests.items():
        assert abs(est - 2000) / 2000 < 4 * 1.04 / (4096 ** 0.5)
    # and the one-group path agrees with hll_estimate
    est_one = hll_estimate(hll_registers(one, "k")).collect()[0]
    est_by = hll_estimate_by(
        hll_registers_by(one, "k", ["g"]), ["g"]
    ).collect()[0]
    assert est_one["hll_estimate"] == est_by["hll_estimate"]
    assert est_one["used_registers"] == est_by["used_registers"]


# ---------------------------------------------------------------------------
# Round 11: Count-Min join-size estimation (sketch inner product)
# ---------------------------------------------------------------------------


def test_cm_join_size_exact_when_collision_free(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_join_size,
        cm_sketch,
    )

    a = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 2 + [("z",)], ["k"]
    )
    b = spark.createDataFrame([("x",)] * 4 + [("y",)] * 5, ["k"])
    est = cm_join_size(cm_sketch(a, "k"), cm_sketch(b, "k")).collect()[0]
    # true join size: 3*4 + 2*5 = 22; 3 keys in 1024 buckets never
    # collide into an overestimate below the min-of-rows
    assert est["cm_join_size"] == 22


def test_cm_join_size_never_undercounts_and_wider_is_tighter(spark):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_join_size,
        cm_sketch,
    )

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 4500).select(F.col("id").alias("k"))
    exact = 1500  # overlap, one row each side
    narrow = cm_join_size(
        cm_sketch(a, "k", width=64), cm_sketch(b, "k", width=64)
    ).collect()[0]["cm_join_size"]
    wide = cm_join_size(
        cm_sketch(a, "k", width=4096), cm_sketch(b, "k", width=4096)
    ).collect()[0]["cm_join_size"]
    assert narrow >= exact and wide >= exact  # one-sided, always
    assert wide <= narrow  # width shrinks the collision term
    # theory: E[overestimate] ~ Na * Nb / width; allow 3x slack
    assert wide - exact <= 3 * (3000 * 3000) // 4096
    assert narrow - exact <= 3 * (3000 * 3000) // 64


def test_cm_join_size_depth_mismatch_and_empty(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_join_size,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)], ["k"])
    empty = spark.createDataFrame([], "k string")
    with pytest.raises(ValueError, match="depth mismatch"):
        cm_join_size(cm_sketch(a, "k", depth=2), cm_sketch(a, "k", depth=4))
    est = cm_join_size(cm_sketch(a, "k"), cm_sketch(empty, "k")).collect()[0]
    assert est["cm_join_size"] == 0


# ---------------------------------------------------------------------------
# Round 11: bucketed co-located join — the 100 TB layout answer for a
# repeated big-big equi-join: both sides pre-bucketed on the key join
# with ZERO exchanges in the physical plan
# ---------------------------------------------------------------------------


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    import pyspark.sql.functions as F

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS r11_orders_b")
    spark.sql("DROP TABLE IF EXISTS r11_lineitem_b")
    try:
        (
            orders.select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("r11_orders_b")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("r11_lineitem_b")
        )
        ob = spark.table("r11_orders_b")
        lb = spark.table("r11_lineitem_b")
        # merge-join hint: at this test SF the orders side is small
        # enough that AQE would broadcast it (a BroadcastExchange, no
        # shuffle either) — force the big-big sort-merge shape the
        # bucketing exists for
        joined = ob.hint("merge").join(
            lb, ob["o_orderkey"] == lb["l_orderkey"]
        ).groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("sum_qty")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed layout satisfies the join AND the aggregation
        # clustering: no hash-repartitioning shuffle anywhere
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        got = {
            (r["o_orderkey"], float(r["sum_qty"]))
            for r in joined.collect()
        }
        want = {
            (r["o_orderkey"], float(r["sum_qty"]))
            for r in orders.join(
                lineitem,
                orders["o_orderkey"] == lineitem["l_orderkey"],
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS r11_orders_b")
        spark.sql("DROP TABLE IF EXISTS r11_lineitem_b")


# ---------------------------------------------------------------------------
# Round 11: grouped histogram quantiles
# ---------------------------------------------------------------------------


def test_grouped_hist_single_group_matches_global(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_quantiles,
        hist_quantiles_by,
        hist_sketch,
        hist_sketch_by,
    )

    df = spark.createDataFrame(
        [(float(i * 7 % 500),) for i in range(1200)], ["x"]
    ).select(F.lit("g").alias("g"), "x")
    cells_by = {
        (r["bin"], r["cnt"])
        for r in hist_sketch_by(df, "x", ["g"], 0.0, 500.0, 50)
        .drop("g")
        .collect()
    }
    cells = {
        (r["bin"], r["cnt"])
        for r in hist_sketch(df, "x", 0.0, 500.0, 50).collect()
    }
    assert cells_by == cells
    qs = (0.5, 0.9)
    by = {
        r["q"]: (r["bin"], r["upper_edge"], r["position"], r["n"])
        for r in hist_quantiles_by(
            hist_sketch_by(df, "x", ["g"], 0.0, 500.0, 50),
            ["g"], qs, 0.0, 500.0, 50,
        ).collect()
    }
    glob = {
        r["q"]: (r["bin"], r["upper_edge"], r["position"], r["n"])
        for r in hist_quantiles(
            hist_sketch(df, "x", 0.0, 500.0, 50), qs, 0.0, 500.0, 50
        ).collect()
    }
    assert by == glob


def test_grouped_hist_groups_are_independent(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_quantiles_by,
        hist_sketch_by,
    )

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(i * 10)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "x"])
    sk = hist_sketch_by(df, "x", ["g"], 0.0, 1000.0, 100)
    got = {
        (r["g"], r["q"]): r["upper_edge"]
        for r in hist_quantiles_by(
            sk, ["g"], (0.5,), 0.0, 1000.0, 100
        ).collect()
    }
    # group a: values 0..99, p50 ~ 49 -> bin 4, upper edge 50
    assert got[("a", 0.5)] == 50.0
    # group b: values 0..990 step 10, p50 ~ 490 -> bin 49, edge 500
    assert got[("b", 0.5)] == 500.0


def test_stream_grouped_hll_equals_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.hll import hll_registers_by
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_hll_registers_by,
    )

    src = os.path.join(str(tmp_path), "ghll_src")
    a = spark.range(0, 3000).selectExpr("id % 3 AS g", "id AS k")
    b = spark.range(1500, 5000).selectExpr("id % 3 AS g", "id AS k")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    out = stream_hll_registers_by(
        spark, src, "g bigint, k bigint", "k", ["g"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ghll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["g"], r["reg_idx"], r["rho"])
        for r in spark.sql("SELECT * FROM ghll_regs").collect()
    }
    batch = {
        (r["g"], r["reg_idx"], r["rho"])
        for r in hll_registers_by(
            a.unionByName(b), "k", ["g"]
        ).collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# Round 11: date-partitioned lake layout — a time filter must reach
# the scan as a PARTITION filter (pruned directories, not row filters)
# ---------------------------------------------------------------------------


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    import pyspark.sql.functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tgt = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(tgt)
    )
    lake = spark.read.parquet(tgt)
    days = sorted(
        r["day"] for r in lake.select("day").distinct().collect()
    )
    assert len(days) >= 3  # the shape needs something to prune
    one = lake.where(F.col("day") == days[0]).select("event_id")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the day predicate is satisfied by directory pruning: it shows as
    # a PartitionFilter on the scan and NOT as a post-scan Filter
    assert "PartitionFilters: [" in plan and "day" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    n_one = one.count()
    n_all = lake.count()
    assert 0 < n_one < n_all
