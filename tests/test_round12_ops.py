"""Round-12 operator tests: the four ADVICE-r11 closures (Count-Min
width guard + single-materialization probe, hist-quantile empty-sketch
convention, purge-report default alignment) plus the round's new
surfaces (sketch shard-merge rollups, streaming restart recovery —
see their own sections below)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r11 (medium): Count-Min width mismatch must fail fast — a
# width-mismatched probe or inner product lands on misaligned buckets
# and silently undercounts, violating the one-sided guarantee.
# ---------------------------------------------------------------------------


def test_cm_sketch_records_build_width(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import cm_sketch

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    rows = cm_sketch(df, "k", width=64).collect()
    assert rows and all(r["width"] == 64 for r in rows)


def test_cm_estimate_rejects_width_mismatch(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame([("a",)] * 5, "k string")
    sk = cm_sketch(df, "k", width=64)
    keys = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="width"):
        cm_estimate(sk, keys, "k", width=1024)
    got = cm_estimate(sk, keys, "k", width=64).collect()
    assert got[0]["cm_estimate"] == 5


def test_cm_join_size_rejects_width_mismatch(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_join_size,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)] * 3, "k string")
    b = spark.createDataFrame([("x",)] * 2, "k string")
    with pytest.raises(ValueError, match="width"):
        cm_join_size(cm_sketch(a, "k", width=64), cm_sketch(b, "k", width=128))
    est = cm_join_size(
        cm_sketch(a, "k", width=64), cm_sketch(b, "k", width=64)
    ).collect()[0]
    assert est["cm_join_size"] == 6


def test_cm_mixed_width_merge_detected(spark):
    """Merging different-width sketches keeps distinct width values;
    the estimators' probe refuses the mixed table instead of summing
    misaligned buckets."""
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_merge,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)] * 3, "k string")
    mixed = cm_merge(cm_sketch(a, "k", width=64), cm_sketch(a, "k", width=128))
    keys = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="mixes build widths"):
        cm_estimate(mixed, keys, "k", width=64)


def test_cm_merge_same_width_still_exact(spark):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_merge,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "k string")
    b = spark.createDataFrame([("y",)] * 5 + [("z",)] * 2, "k string")
    merged = {
        (r["row"], r["bucket"], r["cnt"], r["width"])
        for r in cm_merge(cm_sketch(a, "k"), cm_sketch(b, "k")).collect()
    }
    direct = {
        (r["row"], r["bucket"], r["cnt"], r["width"])
        for r in cm_sketch(a.unionByName(b), "k").collect()
    }
    assert merged == direct


def test_cm_estimate_accepts_foreign_sketch_without_width(spark):
    """A sketch table built outside this module (no width column)
    skips the width check but keeps the depth guard — documented
    compatibility contract."""
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame([("a",)] * 4, "k string")
    foreign = cm_sketch(df, "k").drop("width")
    keys = spark.createDataFrame([("a",)], "k string")
    got = cm_estimate(foreign, keys, "k").collect()
    assert got[0]["cm_estimate"] == 4


# ---------------------------------------------------------------------------
# ADVICE r11 (low): empty histogram sketch yields ZERO rows, not one
# NULL row per q — same convention as exact_quantiles on empty input.
# ---------------------------------------------------------------------------


def test_hist_quantiles_empty_sketch_yields_no_rows(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_quantiles,
        hist_sketch,
    )

    empty = spark.createDataFrame([], "x double")
    sk = hist_sketch(empty, "x", 0.0, 100.0, 16)
    assert hist_quantiles(sk, (0.5, 0.9), 0.0, 100.0, 16).count() == 0


def test_hist_quantiles_by_absent_group_yields_no_rows(spark):
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_quantiles_by,
        hist_sketch_by,
    )

    df = spark.createDataFrame([("a", 5.0)], "g string, x double")
    sk = hist_sketch_by(df, "x", ["g"], 0.0, 100.0, 16)
    out = hist_quantiles_by(sk, ["g"], (0.5,), 0.0, 100.0, 16)
    assert [r["g"] for r in out.collect()] == ["a"]


# ---------------------------------------------------------------------------
# ADVICE r11 (low): blocking_purge_report probes the engine's actual
# DEFAULT_MAX_BLOCK, not a hypothetical cap.
# ---------------------------------------------------------------------------


def test_purge_report_query_uses_default_max_block(sf_dir=None):
    import inspect

    from pl_fuzzy_frame_match_spark import queries as q
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        DEFAULT_MAX_BLOCK,
    )

    src = inspect.getsource(q.blocking_purge_report)
    assert "DEFAULT_MAX_BLOCK" in src
    assert f"bn > {DEFAULT_MAX_BLOCK}" in q.oracle_sql()["blocking_purge_report"]


# ---------------------------------------------------------------------------
# VERDICT r11 #6: streaming restart/recovery — the 25 batch==stream
# twins pin values and late-data semantics, but exactly-once state
# recovery (what the bounded-state claims rely on) needs a query that
# STOPS mid-stream and resumes from its checkpointLocation with the
# state store intact.
# ---------------------------------------------------------------------------


def _write_user_batch(spark, src, counts):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    spark.createDataFrame(rows, "user_id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_stream_restart_recovers_stateful_counts(spark, tmp_path):
    """Kill a stateful running-count stream after batch 1, restart it
    from the same checkpoint once batch 2 exists: the resumed query
    must (a) NOT reprocess batch 1 (exactly-once), (b) recover batch
    1's per-user state from the state store, and (c) end with the
    same totals as an uninterrupted run over both batches."""
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_running_counts,
    )

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    batch1 = {0: 3, 1: 2, 2: 1}
    batch2 = {0: 4, 3: 5}
    _write_user_batch(spark, src, batch1)
    schema = spark.read.parquet(src).schema

    def run(out_dir, checkpoint):
        # foreachBatch -> parquet: the memory sink refuses checkpoint
        # recovery in update mode; this is the fault-tolerant
        # production sink shape
        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream_running_counts(spark, src, schema)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        finals = {}
        for r in spark.read.parquet(out_dir).collect():
            finals[r["user_id"]] = max(
                finals.get(r["user_id"], 0), r["total_events"]
            )
        return finals

    # leg 1: drain batch 1, then the query stops — the interruption
    assert run(str(tmp_path / "out_leg1"), cp) == batch1

    _write_user_batch(spark, src, batch2)

    # leg 2: SAME checkpoint — must resume, not replay
    resumed = run(str(tmp_path / "out_leg2"), cp)
    # (a)+(b): only batch-2 users emit, with batch-1 state folded in
    assert resumed == {0: batch1[0] + batch2[0], 3: batch2[3]}

    # (c): uninterrupted reference over both batches, fresh checkpoint
    full = run(str(tmp_path / "out_full"), str(tmp_path / "cp_full"))
    assert full == {0: 7, 1: 2, 2: 1, 3: 5}
    for k, v in resumed.items():
        assert full[k] == v


# ---------------------------------------------------------------------------
# VERDICT r11 #8: 10x sketch-merge demonstration — per-shard sketches
# built from a PARTITIONED WRITE (one sketch per shard directory, the
# fleet shape) tree-merge to exactly the monolithic sketch, for all
# three mergeable sketch families, at 10x the usual group count.
# ---------------------------------------------------------------------------


def test_sketch_shard_merge_from_partitioned_write(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.countmin import (
        cm_merge,
        cm_sketch,
    )
    from pl_fuzzy_frame_match_spark.operators.hll import (
        hll_registers_by,
    )
    from pl_fuzzy_frame_match_spark.operators.quantiles import (
        hist_merge,
        hist_sketch,
    )

    n_shards, n_groups = 16, 100  # 10x the 10-group fixture scale
    base = spark.range(20000).select(
        (F.col("id") % n_groups).alias("g"),
        (F.col("id") % 3777).alias("k"),
        (F.col("id") % 997).cast("double").alias("x"),
        (F.col("id") % n_shards).cast("int").alias("shard"),
    )
    path = str(tmp_path / "sharded")
    base.write.partitionBy("shard").parquet(path)

    shards = [
        spark.read.parquet(f"{path}/shard={i}") for i in range(n_shards)
    ]
    whole = spark.read.parquet(path)

    # grouped HLL at 100 groups: union + per-(g, reg_idx) max IS the
    # grouped rollup aggregate
    per_shard = shards[0].sparkSession.createDataFrame(
        [], "g long, reg_idx int, rho int"
    )
    for s in shards:
        per_shard = per_shard.unionByName(hll_registers_by(s, "k", ["g"]))
    merged_hll = per_shard.groupBy("g", "reg_idx").agg(
        F.max("rho").alias("rho")
    )
    direct_hll = hll_registers_by(whole, "k", ["g"])
    sym_diff = merged_hll.exceptAll(direct_hll).unionByName(
        direct_hll.exceptAll(merged_hll)
    )
    assert sym_diff.count() == 0
    assert direct_hll.select("g").distinct().count() == n_groups

    merged_hist = hist_merge(
        *[hist_sketch(s, "x", 0.0, 1000.0, 128) for s in shards]
    )
    direct_hist = hist_sketch(whole, "x", 0.0, 1000.0, 128)
    assert (
        merged_hist.exceptAll(direct_hist)
        .unionByName(direct_hist.exceptAll(merged_hist))
        .count()
        == 0
    )

    merged_cm = cm_merge(*[cm_sketch(s, "k", width=256) for s in shards])
    direct_cm = cm_sketch(whole, "k", width=256)
    assert (
        merged_cm.exceptAll(direct_cm)
        .unionByName(direct_cm.exceptAll(merged_cm))
        .count()
        == 0
    )


# ---------------------------------------------------------------------------
# CDC / changelog processing (round 12, operators/cdc.py): latest-wins
# snapshots via commutative max-struct (no window), incremental merge
# associativity, SCD2 validity intervals, and the streaming twin.
# ---------------------------------------------------------------------------


def _changelog(spark):
    """Hand changelog: key k, seq (s1, s2), op, payload v.
    k=1: update then delete            -> absent from snapshot
    k=2: delete then re-insert         -> present (revival)
    k=3: three updates, seq ties on s1 -> s2 breaks the tie
    k=4: single insert                 -> present
    """
    rows = [
        (1, 10, 0, "U", 100.0),
        (1, 20, 0, "D", None),
        (2, 10, 0, "D", None),
        (2, 30, 0, "U", 200.0),
        (3, 10, 0, "U", 1.0),
        (3, 10, 1, "U", 2.0),
        (3, 5, 9, "U", 3.0),
        (4, 7, 0, "U", 400.0),
    ]
    return spark.createDataFrame(rows, "k long, s1 long, s2 long, op string, v double")


def test_cdc_latest_snapshot_hand_values(spark):
    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot

    snap = {
        r["k"]: (r["s1"], r["s2"], r["op"], r["v"])
        for r in cdc_latest_snapshot(
            _changelog(spark), "k", ["s1", "s2"], op_col="op"
        ).collect()
    }
    assert set(snap) == {2, 3, 4}          # k=1 tombstoned out
    assert snap[2] == (30, 0, "U", 200.0)  # revival after delete
    assert snap[3] == (10, 1, "U", 2.0)    # s2 breaks the s1 tie
    assert snap[4] == (7, 0, "U", 400.0)


def test_cdc_latest_snapshot_keep_tombstones(spark):
    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot

    snap = {
        r["k"]: r["op"]
        for r in cdc_latest_snapshot(
            _changelog(spark), "k", ["s1", "s2"], op_col="op",
            keep_tombstones=True,
        ).collect()
    }
    assert snap[1] == "D" and len(snap) == 4


def test_cdc_apply_associative_at_every_split(spark):
    """cdc_apply(latest(log <= T), log > T) == latest(log) for EVERY
    split point T — including splits that strand a tombstone on
    either side (the property events_cdc_incremental_merge certifies
    at gate scale)."""
    from pl_fuzzy_frame_match_spark.operators.cdc import (
        cdc_apply,
        cdc_latest_snapshot,
    )

    log = _changelog(spark)
    want = sorted(
        tuple(r) for r in cdc_latest_snapshot(
            log, "k", ["s1", "s2"], op_col="op"
        ).collect()
    )
    for t in [0, 6, 10, 15, 25, 99]:
        pre = log.where(F.col("s1") <= t)
        post = log.where(F.col("s1") > t)
        snap = cdc_latest_snapshot(pre, "k", ["s1", "s2"], op_col="op")
        got = sorted(
            tuple(r) for r in cdc_apply(
                snap, post, "k", ["s1", "s2"], op_col="op"
            ).collect()
        )
        assert got == want, f"split at {t}"


def test_scd2_historize_intervals(spark):
    from pl_fuzzy_frame_match_spark.operators.cdc import scd2_historize

    hist = scd2_historize(
        _changelog(spark).where(F.col("k") == 3),
        "k",
        ["s1", "s2"],
        valid_to_cols={"s1": "s1_to", "s2": "s2_to"},
    ).collect()
    by_ver = {r["version"]: r for r in hist}
    # seq order for k=3: (5,9) -> (10,0) -> (10,1)
    assert [by_ver[i]["v"] for i in (1, 2, 3)] == [3.0, 1.0, 2.0]
    assert (by_ver[1]["s1_to"], by_ver[1]["s2_to"]) == (10, 0)
    assert (by_ver[2]["s1_to"], by_ver[2]["s2_to"]) == (10, 1)
    assert by_ver[3]["s1_to"] is None and by_ver[3]["s2_to"] is None


def test_stream_cdc_snapshot_equals_batch(spark, tmp_path):
    """26th streaming twin: the complete-mode CDC state table equals
    the batch snapshot of everything ingested — O(keys) state on an
    unbounded changelog, tombstone filtering included."""
    import os

    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_cdc_snapshot,
    )

    src = os.path.join(str(tmp_path), "cdc_src")
    log = _changelog(spark)
    # two files -> two triggers at maxFilesPerTrigger=2... write per
    # seq half so late changes arrive in a later micro-batch
    log.where(F.col("s1") <= 10).coalesce(1).write.mode("append").parquet(src)
    log.where(F.col("s1") > 10).coalesce(1).write.mode("append").parquet(src)
    out = stream_cdc_snapshot(
        spark, src, "k long, s1 long, s2 long, op string, v double",
        "k", ["s1", "s2"], op_col="op",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_snap")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM cdc_snap").collect()
    )
    batch = sorted(
        tuple(r) for r in cdc_latest_snapshot(
            log, "k", ["s1", "s2"], op_col="op"
        ).collect()
    )
    assert streamed == batch and len(batch) == 3


# ---------------------------------------------------------------------------
# Robust median/MAD outliers (round 12, operators/robust.py)
# ---------------------------------------------------------------------------


def test_mad_outliers_hand_values(spark):
    from pl_fuzzy_frame_match_spark.operators.robust import mad_outliers

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 100.0]] + [
        ("b", v) for v in [5.0, 5.0, 5.0, 9.0]
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in mad_outliers(df, "x", "g", k=3.0).collect()
    }
    # a: med = value at ceil(5/2)=3 -> 3.0; |x-3| sorted [0,1,1,2,97],
    # mad at pos 3 -> 1.0; threshold 4.4478 -> only 100 flags
    assert got["a"] == (5, 3.0, 1.0, 1)
    # b: med 5.0, mad 0.0 (majority identical) -> every non-median
    # value flags (the documented mad=0 behavior)
    assert got["b"] == (4, 5.0, 0.0, 1)


def test_mad_outliers_ignores_nulls(spark):
    from pl_fuzzy_frame_match_spark.operators.robust import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0)],
        "g string, x double",
    )
    [r] = mad_outliers(df, "x", "g").collect()
    assert (r["n"], r["med"]) == (3, 2.0)


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency (round 12, operators/sweepline.py)
# ---------------------------------------------------------------------------


def test_global_running_sum_matches_single_partition_window(spark):
    import random

    from pyspark.sql import Window

    from pl_fuzzy_frame_match_spark.operators.sweepline import (
        global_running_sum,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(100), rng.choice([-1, 1])) for _ in range(500)]
    # make the order total: add a unique third column via index
    rows = [(t, d, i) for i, (t, d) in enumerate(rows)]
    df = spark.createDataFrame(rows, "t long, delta long, i long")
    got = {
        (r["t"], r["delta"], r["i"]): r["run"]
        for r in global_running_sum(
            df,
            [F.col("t").asc(), F.col("delta").desc(), F.col("i").asc()],
            "delta",
            "run",
            num_partitions=7,
        ).collect()
    }
    w = Window.orderBy(
        F.col("t").asc(), F.col("delta").desc(), F.col("i").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["t"], r["delta"], r["i"]): r["run"]
        for r in df.withColumn("run", F.sum("delta").over(w)).collect()
    }
    assert got == want


def test_interval_concurrency_hand_values(spark):
    from pl_fuzzy_frame_match_spark.operators.sweepline import (
        interval_concurrency,
    )

    df = spark.createDataFrame(
        [(0, 10), (5, 15), (10, 20), (30, 30)], "s long, e long"
    )
    [r] = interval_concurrency(df, "s", "e", num_partitions=3).collect()
    # closed intervals: at t=10 the third interval STARTS before the
    # first ENDS -> peak 3; the zero-length [30,30] still opens
    assert (r["n_intervals"], r["max_concurrent"], r["at_t"]) == (4, 3, 10)


def test_interval_concurrency_drops_bad_intervals(spark):
    from pl_fuzzy_frame_match_spark.operators.sweepline import (
        interval_concurrency,
    )

    df = spark.createDataFrame(
        [(0, 10), (9, 2), (None, 5), (3, None)], "s long, e long"
    )
    [r] = interval_concurrency(df, "s", "e").collect()
    assert (r["n_intervals"], r["max_concurrent"]) == (1, 1)


# ---------------------------------------------------------------------------
# Table profiler (round 12, operators/profile.py)
# ---------------------------------------------------------------------------


def test_profile_columns_hand_values(spark):
    from pl_fuzzy_frame_match_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (1, None, "b"), (3, 4.0, None)],
        "k long, x double, s string",
    )
    got = {r["column"]: r.asDict() for r in profile_columns(df).collect()}
    assert got["k"]["n"] == 3 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 2  # exact, nulls excluded
    assert (got["k"]["min_num"], got["k"]["max_num"]) == (1.0, 3.0)
    assert got["k"]["min_str"] is None
    assert got["x"]["n_null"] == 1 and got["x"]["n_distinct"] == 2
    assert got["s"]["n_null"] == 1
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "b")
    assert got["s"]["min_num"] is None


def test_profile_columns_rejects_unknown(spark):
    from pl_fuzzy_frame_match_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])


# ---------------------------------------------------------------------------
# CDC join-merge: cdc_apply_joined == cdc_apply, and exchange-free
# over a bucketed snapshot + bucketed changelog (the 100 TB MERGE
# INTO layout answer)
# ---------------------------------------------------------------------------


def test_cdc_apply_joined_equals_apply(spark):
    from pl_fuzzy_frame_match_spark.operators.cdc import (
        cdc_apply,
        cdc_apply_joined,
        cdc_latest_snapshot,
    )

    log = _changelog(spark)
    for t in [0, 6, 10, 15, 25, 99]:
        pre = log.where(F.col("s1") <= t)
        post = log.where(F.col("s1") > t)
        snap = cdc_latest_snapshot(pre, "k", ["s1", "s2"], op_col="op")
        want = sorted(
            tuple(r) for r in cdc_apply(
                snap, post, "k", ["s1", "s2"], op_col="op"
            ).collect()
        )
        got = sorted(
            tuple(r) for r in cdc_apply_joined(
                snap, post, "k", ["s1", "s2"], op_col="op"
            ).collect()
        )
        assert got == want, f"split at {t}"


def test_cdc_apply_joined_bucketed_is_exchange_free(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.cdc import (
        cdc_apply,
        cdc_apply_joined,
        cdc_latest_snapshot,
    )

    log = _changelog(spark)
    snap = cdc_latest_snapshot(
        log.where(F.col("s1") <= 10), "k", ["s1", "s2"], op_col="op"
    )
    post = log.where(F.col("s1") > 10)
    spark.sql("DROP TABLE IF EXISTS r12_cdc_snap_b")
    spark.sql("DROP TABLE IF EXISTS r12_cdc_log_b")
    try:
        snap.write.bucketBy(4, "k").sortBy("k").mode(
            "overwrite"
        ).saveAsTable("r12_cdc_snap_b")
        post.write.bucketBy(4, "k").sortBy("k").mode(
            "overwrite"
        ).saveAsTable("r12_cdc_log_b")
        sb = spark.table("r12_cdc_snap_b")
        lb = spark.table("r12_cdc_log_b").hint("merge")
        merged = cdc_apply_joined(
            sb, lb, "k", ["s1", "s2"], op_col="op"
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        # bucketed layout satisfies the changelog's per-key reduction
        # AND the merge join: the snapshot is never re-shuffled
        assert "Exchange hashpartitioning" not in plan, plan
        got = sorted(tuple(r) for r in merged.collect())
        want = sorted(
            tuple(r) for r in cdc_apply(
                snap, post, "k", ["s1", "s2"], op_col="op"
            ).collect()
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS r12_cdc_snap_b")
        spark.sql("DROP TABLE IF EXISTS r12_cdc_log_b")


def test_cdc_latest_snapshot_matches_window_randomized(spark):
    """max-struct latest-wins == the row_number-desc window reference
    on a randomized changelog (seeded): 300 changes, 40 keys, random
    ops, seq uniqueness via the change index."""
    import random

    from pyspark.sql import Window

    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot

    rng = random.Random(12)
    rows = [
        (rng.randrange(40), rng.randrange(50), i,
         "D" if rng.random() < 0.3 else "U", float(i))
        for i in range(300)
    ]
    log = spark.createDataFrame(
        rows, "k long, s1 long, s2 long, op string, v double"
    )
    got = sorted(
        tuple(r) for r in cdc_latest_snapshot(
            log, "k", ["s1", "s2"], op_col="op"
        ).collect()
    )
    w = Window.partitionBy("k").orderBy(
        F.col("s1").desc(), F.col("s2").desc()
    )
    want = sorted(
        tuple(r) for r in log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .drop("rn")
        .collect()
    )
    assert got == want and len(want) > 5


def test_profile_scans_are_column_pruned(spark):
    """Each per-column aggregate's parquet scan must read ONLY its
    column — the design reason the profiler is one-agg-per-column
    instead of a multi-distinct Expand."""
    from pl_fuzzy_frame_match_spark.operators.profile import profile_columns

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = profile_columns(li, ["l_quantity", "l_returnflag"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_quantity:double>" in plan, plan
    assert "ReadSchema: struct<l_returnflag:string>" in plan, plan
    assert "Expand" not in plan, plan


def test_stream_cdc_merge_to_parquet_equals_full_replay(spark, tmp_path):
    """Streaming MERGE INTO: microbatch-merged on-disk snapshot ==
    the batch full-replay snapshot, whatever the batch boundaries
    (associativity end-to-end, tombstones included)."""
    import os

    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_cdc_merge_to_parquet,
    )

    src = os.path.join(str(tmp_path), "log_src")
    snap_dir = os.path.join(str(tmp_path), "snap")
    os.makedirs(snap_dir, exist_ok=True)
    log = _changelog(spark)
    # three files -> three microbatches at maxFilesPerTrigger=1
    log.where(F.col("s1") <= 7).coalesce(1).write.mode("append").parquet(src)
    log.where((F.col("s1") > 7) & (F.col("s1") <= 10)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    log.where(F.col("s1") > 10).coalesce(1).write.mode("append").parquet(src)
    q = stream_cdc_merge_to_parquet(
        spark, src, "k long, s1 long, s2 long, op string, v double",
        snap_dir, "k", ["s1", "s2"], op_col="op",
    )
    q.awaitTermination(120)
    gen = open(os.path.join(snap_dir, "MANIFEST")).read().strip()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(snap_dir, gen))
        .select("k", "s1", "s2", "op", "v")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in cdc_latest_snapshot(log, "k", ["s1", "s2"], op_col="op")
        .select("k", "s1", "s2", "op", "v")
        .collect()
    )
    assert got == want and len(want) == 3


def test_interval_concurrency_empty_input_convention(spark):
    """Empty interval set -> ONE row (0, NULL, NULL): n_intervals is
    a real zero, peak and its time are undefined (pinned so the empty
    case is a convention, not an accident — the hist_quantiles
    empty-sketch lesson from ADVICE r11)."""
    from pl_fuzzy_frame_match_spark.operators.sweepline import (
        interval_concurrency,
    )

    df = spark.createDataFrame([], "s long, e long")
    [r] = interval_concurrency(df, "s", "e").collect()
    assert r["n_intervals"] == 0
    assert r["max_concurrent"] is None and r["at_t"] is None


def test_cdc_null_seq_loses_to_any_value(spark):
    """A null seq sorts FIRST in the max-struct (oldest) — matching
    the SQL `ORDER BY seq DESC` convention where non-null rows
    outrank null ones; a key whose only change has a null seq still
    survives."""
    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot

    log = spark.createDataFrame(
        [(1, None, 0, "U", 1.0), (1, 5, 0, "U", 2.0),
         (2, None, 0, "U", 9.0)],
        "k long, s1 long, s2 long, op string, v double",
    )
    snap = {
        r["k"]: (r["s1"], r["v"])
        for r in cdc_latest_snapshot(
            log, "k", ["s1", "s2"], op_col="op"
        ).collect()
    }
    assert snap[1] == (5, 2.0)
    assert snap[2] == (None, 9.0)
