"""One measured decade of fuzzy-join scaling (VERDICT r10 #4).

The 100 TB story so far rests on design arguments plus sf0.1 bench
numbers; this probe measures one decade of PAIR-volume growth on the
two BASELINE-comparable headline shapes, with per-run shuffle-write
volume pulled from the Spark status REST API:

- exact shape (fuzzy_join_exact_xl): forced-exact scoring at 80M
  pairs (the BASELINE 10K x 8K row) and at 800M pairs (left side
  replicated 10x with distinct numeric suffixes — every pair still
  pays the banded levenshtein kernel).
- sketch shape (fuzzy_join_xl_4b): the auto-planner SimHash
  sketch-scan path at 4.05B pairs (405K x 10K, the BASELINE 400K x
  10K row) and at 40.5B pairs (right side replicated 100x instead of
  10x).

Replication uses the same concat-a-distinct-suffix construction the
registered xl_4b query itself uses (names stay real TPC-H shapes,
match structure is preserved), so this is an amplification probe of
driver-generated data, not synthetic inputs.

Run:  python scripts/probe_fuzzy_sf1.py            # both shapes
      python scripts/probe_fuzzy_sf1.py exact      # one shape
Prints one JSON line per (shape, scale) with wall seconds and
shuffle-write bytes; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _shuffle_write_bytes(spark) -> int:
    """Sum shuffle-write bytes over all completed stages via the UI
    REST API (enabled for this probe only)."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as resp:
            stages = json.load(resp)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def _replicate(df, key_col, name_col, reps: int, spark):
    import pyspark.sql.functions as F

    r = spark.range(reps).select(F.col("id").alias("__rep"))
    return df.crossJoin(F.broadcast(r)).select(
        key_col,
        F.concat_ws(
            " ", name_col, F.col("__rep").cast("string")
        ).alias(name_col),
    )


def run_exact(spark, amplify: int) -> dict:
    import pyspark.sql.functions as F

    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    left = cust.filter(F.col("c_custkey") <= 10000)
    if amplify > 1:
        left = _replicate(left, "c_custkey", "c_name", amplify, spark)
    right = cust.filter(F.col("c_custkey") % 15 < 8)
    n_l, n_r = left.count(), right.count()
    base = _shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    # force the exact path (at 800M pairs the auto planner would
    # otherwise switch to the sketch tier — measured separately)
    out = fuzzy_match_dfs(
        left,
        right,
        [FuzzyMapping("c_name", "c_name", threshold_score=90.0)],
        use_appr_nearest_neighbor=False,
    )
    out.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    return {
        "shape": "exact_xl_forced",
        "amplify": amplify,
        "pairs": n_l * n_r,
        "wall_sec": round(wall, 2),
        "shuffle_write_bytes": _shuffle_write_bytes(spark) - base,
    }


def run_sketch(spark, right_reps: int) -> dict:
    import pyspark.sql.functions as F  # noqa: F401

    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    left = _replicate(cust, "c_custkey", "c_name", 27, spark)
    right = _replicate(supp, "s_suppkey", "s_name", right_reps, spark)
    n_l, n_r = left.count(), right.count()
    base = _shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    out = fuzzy_match_dfs(
        left, right, [FuzzyMapping("c_name", "s_name", threshold_score=75.0)]
    )
    out.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    return {
        "shape": "xl_4b_sketch",
        "right_reps": right_reps,
        "pairs": n_l * n_r,
        "wall_sec": round(wall, 2),
        "shuffle_write_bytes": _shuffle_write_bytes(spark) - base,
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from pl_fuzzy_frame_match_spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # fresh session with the UI on so the REST metrics exist
    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = (
        SparkSession.builder.appName("probe_fuzzy_sf1")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "96g"
        ))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    get_spark  # imported for parity documentation only

    results = []
    if which in ("both", "exact"):
        # warmup the code path once at the base scale
        run_exact(spark, 1)
        for amplify in (1, 10):
            results.append(run_exact(spark, amplify))
            print(json.dumps(results[-1]), flush=True)
    if which in ("both", "sketch"):
        run_sketch(spark, 10)
        for reps in (10, 100):
            results.append(run_sketch(spark, reps))
            print(json.dumps(results[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
