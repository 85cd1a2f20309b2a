#!/usr/bin/env python
"""One measured decade of entity-resolution scaling (VERDICT r11 #3).

The fuzzy-join tiers have their measured decade (probe_fuzzy_sf1);
this probe gives the dedup/ER family the same evidence: the full
`resolve_entities` pipeline and each of its three candidate tiers at
100K names and at 1M names (one decade of input growth), with wall
seconds, candidates kept, and shuffle-write bytes per step pulled
from the Spark status REST API. The linear-blocking-tier claim the
100-TB grade rests on predicts ~10x candidates / ~10x shuffle bytes /
roughly-linear wall across the decade — block purging (max_block=50,
the production default) is what keeps the hot Soundex/prefix blocks
from going quadratic (the unpurged 1M-name blowup is documented in
probe_blocking_scale.py).

Names use the same distributed syllable+numeric-tail generator as
probe_blocking_scale.py — heavy phonetic-code collisions like real
name data, nothing driver-side.

Run contention-free from the repo root:
    python scripts/probe_er_decade.py
Prints one JSON line per (scale, step); paste the table into
PLANS.md (round 12).
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

SYL = ["an", "bel", "cor", "dan", "el", "far", "gil", "han", "ir",
       "jor", "kal", "lin", "mor", "nel", "or", "per", "quin", "ros",
       "sten", "tor", "ul", "ven", "wil", "xan", "yor", "zel"]


def _shuffle_write_bytes(spark) -> int:
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


def make_names(spark, n: int):
    from pyspark.sql import functions as F

    syl = F.array(*[F.lit(s) for s in SYL])
    return (
        spark.range(n)
        .select(
            F.concat(
                F.element_at(syl, (F.col("id") % 26 + 1).cast("int")),
                F.element_at(syl, (F.col("id") / 26 % 26 + 1).cast("int")),
                F.lit(" "),
                F.element_at(syl, (F.col("id") / 676 % 26 + 1).cast("int")),
                (F.col("id") % 997).cast("string"),
            ).alias("name")
        )
        .localCheckpoint(eager=True)
    )


def probe_scale(spark, n: int) -> None:
    from pl_fuzzy_frame_match_spark.functions.phonetic import (
        phonetic_blocked_pairs,
    )
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        prefix_block_pairs,
        resolve_entities,
        sorted_neighborhood_pairs,
    )

    names = make_names(spark, n)
    print(json.dumps({"scale": n, "names": names.count()}), flush=True)
    steps = [
        ("phonetic_purged",
         lambda: phonetic_blocked_pairs(
             names, "name", threshold=0.88, max_block=50)),
        ("sorted_neighborhood",
         lambda: sorted_neighborhood_pairs(
             names, "name", window=4, threshold=0.88)),
        ("prefix_purged",
         lambda: prefix_block_pairs(
             names, "name", prefix_len=4, threshold=0.88, max_block=50)),
    ]
    for step, make in steps:
        base = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        kept = make().count()
        print(json.dumps({
            "scale": n,
            "step": step,
            "candidates_kept": kept,
            "wall_s": round(time.perf_counter() - t0, 1),
            "shuffle_write_bytes": _shuffle_write_bytes(spark) - base,
        }), flush=True)
    base = _shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    ents = resolve_entities(names, "name", threshold=0.88, window=4,
                            prefix_len=4, max_block=50)
    n_ent = ents.select("canonical_name").distinct().count()
    print(json.dumps({
        "scale": n,
        "step": "resolve_entities_full",
        "entities": n_ent,
        "wall_s": round(time.perf_counter() - t0, 1),
        "shuffle_write_bytes": _shuffle_write_bytes(spark) - base,
    }), flush=True)
    names.unpersist()


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("probe_er_decade")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "96g"
        ))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # code-path warmup at a scale below both measured points
    probe_scale(spark, 10_000)
    for n in (100_000, 1_000_000):
        probe_scale(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
