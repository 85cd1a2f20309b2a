#!/usr/bin/env python
"""One measured decade for the span family (round 12): after the
sort-free group-id rewrite, does `duplicated_char_spans` scale across
10x the positions — and does the >4M-distinct-gram HASH-JOIN fallback
path (the 100 TB shape, where the gram map exceeds the broadcast
bound) behave?

Corpus construction: the sf0.1 documents table (1.49M positions),
then a 10x variant — each document replicated 10 times with a
PER-COPY character translation (copy i rotates the i most common
letters), so positions grow 10x AND distinct grams grow ~9x (a plain
replication would duplicate grams and flatter the rank stage). Copy
0 is the identity, so cross-copy duplication still exists.

Run contention-free from the repo root:
    python scripts/probe_span_decade.py
Prints one JSON line per run; paste into PLANS.md round 12.
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

# per-copy translations: rotate a distinct slice of common letters
SRC = "etaoinshr"


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
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        duplicated_char_spans,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    # UI-enabled session (get_spark disables it) so the stages REST
    # API can report shuffle-write bytes — same as probe_er_decade
    spark = (
        SparkSession.builder.appName("probe_span_decade")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "96g"
        ))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).select("doc_id", "text").localCheckpoint(eager=True)

    def copy_frame(i: int):
        if i == 0:
            return docs
        rot = SRC[i:] + SRC[:i]
        return docs.select(
            (F.col("doc_id") * 10 + i).alias("doc_id"),
            F.translate(F.col("text"), SRC, rot).alias("text"),
        )

    big = copy_frame(0).select(
        (F.col("doc_id") * 10).alias("doc_id"), "text"
    )
    for i in range(1, 10):
        big = big.unionByName(copy_frame(i))
    big = big.localCheckpoint(eager=True)

    for label, frame in [("1x", docs), ("10x", big)]:
        # warm the code path once, then 3 timed trials
        duplicated_char_spans(frame, "text", "doc_id", 16).write.mode(
            "overwrite"
        ).format("noop").save()
        trials = []
        shuf = []
        for _ in range(3):
            base = _shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            duplicated_char_spans(
                frame, "text", "doc_id", 16
            ).write.mode("overwrite").format("noop").save()
            trials.append(round(time.perf_counter() - t0, 2))
            shuf.append(_shuffle_write_bytes(spark) - base)
        n_pos = frame.select(
            F.sum(F.length(F.lower(F.col("text")))).alias("p")
        ).first()["p"]
        n_grams = frame.select(
            F.explode(
                F.sequence(
                    F.lit(0), F.length(F.lower(F.col("text"))) - 1
                )
            ).alias("off"),
            F.lower(F.col("text")).alias("t"),
        ).select(
            F.substring(F.col("t"), F.col("off") + 1, 8).alias("g")
        ).distinct().count()
        print(json.dumps({
            "corpus": label,
            "positions": int(n_pos),
            "distinct_grams": n_grams,
            "trials_s": trials,
            "median_s": sorted(trials)[1],
            "shuffle_write_bytes_med": sorted(shuf)[1],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
