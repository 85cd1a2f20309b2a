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
