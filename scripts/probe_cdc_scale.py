#!/usr/bin/env python
"""CDC snapshot scaling decade (round 12): `cdc_latest_snapshot`'s
max-struct aggregate vs the classic row_number-desc window at 1M and
10M synthetic changes over 100K keys — wall seconds and shuffle-write
bytes. The max-struct shape exists because its map-side partial
aggregate bounds the exchange at (keys x input partitions) rows,
while the window must shuffle and per-key sort EVERY change row; this
probe measures that gap and its growth across a decade of changelog
volume.

Run contention-free from the repo root:
    python scripts/probe_cdc_scale.py
Prints one JSON line per (scale, impl); paste into PLANS.md round 12.
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

N_KEYS = 100_000


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


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.cdc import cdc_latest_snapshot

    spark = (
        SparkSession.builder.appName("probe_cdc_scale")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "96g"
        ))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def changelog(n: int):
        # deterministic synthetic changelog: key from a multiplicative
        # hash, seq = change index (unique), ~20% tombstones, payload
        # value + a 32-char filler column so rows have realistic width
        return (
            spark.range(n)
            .select(
                (F.col("id") * 2654435761 % N_KEYS).alias("k"),
                F.col("id").alias("seq"),
                F.when((F.col("id") * 40503 % 10) < 2, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                (F.col("id") % 9973).cast("double").alias("v"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            .localCheckpoint(eager=True)
        )

    def window_reference(log):
        w = Window.partitionBy("k").orderBy(F.col("seq").desc())
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & (F.col("op") != "D"))
            .drop("__rn")
        )

    for n in (1_000_000, 10_000_000):
        log = changelog(n)
        for impl, make in [
            ("max_struct", lambda: cdc_latest_snapshot(
                log, "k", ["seq"], op_col="op")),
            ("window_rownum", lambda: window_reference(log)),
        ]:
            make().write.mode("overwrite").format("noop").save()  # warm
            trials, shuf = [], []
            for _ in range(3):
                base = _shuffle_write_bytes(spark)
                t0 = time.perf_counter()
                make().write.mode("overwrite").format("noop").save()
                trials.append(round(time.perf_counter() - t0, 2))
                shuf.append(_shuffle_write_bytes(spark) - base)
            print(json.dumps({
                "changes": n,
                "impl": impl,
                "trials_s": trials,
                "median_s": sorted(trials)[1],
                "shuffle_write_bytes_med": sorted(shuf)[1],
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
