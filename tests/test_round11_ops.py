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
