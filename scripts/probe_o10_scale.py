#!/usr/bin/env python
"""Measure O10's asymptotic claim (VERDICT r7 #5).

O10 (`plans/planner.py::promote_exact_mappings`) reorders a
two-mapping exact+fuzzy conjunction so the threshold-100 (equality)
mapping runs FIRST as a hash equi-join, shrinking the pair set the
fuzzy round must score from the name-cartesian to the equi-survivors.
The claim is asymptotic: fuzzy-first scores |distinct L names| x
|distinct R names| pairs (grows with the product), exact-first scores
only the equi-join survivors (grows with sum over keys of nL_k * nR_k
— cartesian / #keys under uniform keys).

This probe runs the bench two-mapping shape (customer x supplier,
fuzzy name + exact nation key) at 1x and 10x customer replication,
with promotion ON and OFF (toggled via the planner's
EXACT_FIRST_PAIR_CAP), forcing the exact candidate tier both ways so
the scored-pair count is the entire cost difference (no ANN recall
asymmetry). Scored pairs are measured by replaying the candidate
arithmetic on the same distinct key frames the matcher builds:

- fuzzy-first:  |distinct c_name| * |distinct s_name|
- exact-first:  count of distinct(c_name, nk) equi-join distinct(s_name, nk)

Usage: python scripts/probe_o10_scale.py [replicas]
Prints one JSON line per (scale, promotion) cell; results are pinned
in PLANS.md (round 8).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir: str, replicas: int):
    left = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey")
        .withColumn("c_nk", F.col("c_nationkey").cast("string"))
    )
    if replicas > 1:
        reps = spark.range(replicas).select(F.col("id").alias("__r"))
        left = left.crossJoin(F.broadcast(reps)).select(
            (F.col("c_custkey") + F.col("__r") * F.lit(10_000_000)).alias(
                "c_custkey"
            ),
            F.concat(
                F.col("c_name"), F.lit(" rep"), F.col("__r").cast("string")
            ).alias("c_name"),
            "c_nationkey",
            "c_nk",
        )
    right = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_name", "s_nationkey")
        .withColumn("s_nk", F.col("s_nationkey").cast("string"))
    )
    return left.localCheckpoint(eager=True), right.localCheckpoint(
        eager=True
    )


def scored_pairs(left, right, promoted: bool) -> int:
    if promoted:
        l = left.select("c_name", "c_nk").distinct()
        r = right.select("s_name", "s_nk").distinct()
        return l.join(r, l["c_nk"] == r["s_nk"], "inner").count()
    nl = left.select("c_name").distinct().count()
    nr = right.select("s_name").distinct().count()
    return nl * nr


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pl_fuzzy_frame_match_spark.models import FuzzyMapping
    from pl_fuzzy_frame_match_spark.operators.matcher import fuzzy_match_dfs
    from pl_fuzzy_frame_match_spark.plans import planner
    from pl_fuzzy_frame_match_spark.session import get_spark

    global _CAP0, _FLOOR0
    _CAP0 = planner.EXACT_FIRST_PAIR_CAP
    _FLOOR0 = planner.PROMOTE_MIN_FUZZY_PAIRS
    spark = get_spark("probe_o10_scale")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for scale in (1, replicas):
        left, right = build(spark, sf_dir, scale)
        nl, nr = left.count(), right.count()
        # arm order is swappable to separate arm effects from slot
        # effects (round 8: identical promoted plans timed 2x apart
        # depending on which slot they ran in at 30x)
        order = tuple(
            os.environ.get("O10_ARM_ORDER", "on,off,auto").split(",")
        )
        for arm in order:
            # "on"/"off" force the rewrite by saturating/zeroing the
            # cap+floor; "auto" leaves the production constants so the
            # printed row shows which plan the planner itself picks
            if arm == "on":
                planner.EXACT_FIRST_PAIR_CAP = 10**12
                planner.PROMOTE_MIN_FUZZY_PAIRS = 0
            elif arm == "off":
                planner.EXACT_FIRST_PAIR_CAP = 0
                planner.PROMOTE_MIN_FUZZY_PAIRS = 10**18
            else:
                planner.EXACT_FIRST_PAIR_CAP = _CAP0
                planner.PROMOTE_MIN_FUZZY_PAIRS = _FLOOR0
            maps = [
                FuzzyMapping("c_name", "s_name", threshold_score=65.0),
                FuzzyMapping("c_nk", "s_nk", threshold_score=100.0),
            ]
            if arm == "auto":
                # replay the planner decision with the real distinct
                # counts so the row reports which plan auto picked
                uniq_l = {
                    c: left.select(c).distinct().count()
                    for c in ("c_name", "c_nk")
                }
                uniq_r = {
                    c: right.select(c).distinct().count()
                    for c in ("s_name", "s_nk")
                }
                promoted = (
                    planner.promote_exact_mappings(
                        maps, uniq_l, uniq_r, nl, nr
                    )[0].left_col
                    == "c_nk"
                )
            else:
                promoted = arm == "on"
            # one untimed warmup per arm (each arm has its own physical
            # path to JIT/compile) then median of 3 — the first probe
            # version timed single cold runs in arm order, biasing
            # against whichever arm ran first
            samples = []
            n_out = -1
            for trial in range(4):
                gc.collect()
                t0 = time.perf_counter()
                out = fuzzy_match_dfs(
                    left, right, maps, use_appr_nearest_neighbor=False
                )
                n_out = out.count()
                if trial > 0:
                    samples.append(time.perf_counter() - t0)
                del out
            samples.sort()
            wall = round(samples[1], 2)
            print(
                json.dumps(
                    {
                        "scale": scale,
                        "left_rows": nl,
                        "right_rows": nr,
                        "promotion": arm,
                        "fuzzy_round_scored_pairs": scored_pairs(
                            left, right, promoted
                        ),
                        "result_rows": n_out,
                        "wall_sec_median": wall,
                        "wall_sec_min": round(samples[0], 2),
                    }
                ),
                flush=True,
            )
        del left, right
        gc.collect()

    planner.EXACT_FIRST_PAIR_CAP = _CAP0
    planner.PROMOTE_MIN_FUZZY_PAIRS = _FLOOR0
    spark.stop()


if __name__ == "__main__":
    main()
