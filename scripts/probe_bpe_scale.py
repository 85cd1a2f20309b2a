"""Distributed-BPE merge-round cost probe (round 9, VERDICT r8 #2b).

Round 8 measured the full-recount loop (posexplode the WHOLE vocab +
hash-agg shuffle + argmax + fold + eager checkpoint, every round) at
15.5 s/round on a 700K-distinct-33-hex-char-word vocab (~23M symbol
positions). Round 9 replaced it with incremental pair-count
maintenance: full explode once, then per-round map-only adjacency
flag + delta explode of only the affected words.

This probe A/Bs both loops on the same synthesized vocab, same
session, interleaving order fixed (legacy first — JIT/page-cache
warmup favors whichever runs second, so the incremental number is
conservative only if it still wins). Prints one JSON line per loop:
{"loop": ..., "merges": N, "wall_sec": ..., "sec_per_round": ...}.

Usage: python scripts/probe_bpe_scale.py [--small] [--merges N]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pl_fuzzy_frame_match_spark.operators import bpe  # noqa: E402


def legacy_distributed_bpe(wf, n_merges: int):
    """The round-8 loop, verbatim shape: full pair recount each round."""
    vocab = wf.select(
        F.split(F.col("word"), "").alias("syms"), "cnt"
    ).localCheckpoint(eager=True)
    merges = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                F.posexplode(F.slice(F.col("syms"), 1, F.size("syms") - 1))
                .alias("i", "a"),
                F.col("syms"),
                F.col("cnt"),
            )
            .select(
                F.col("a"),
                F.element_at(F.col("syms"), F.col("i") + 2).alias("b"),
                F.col("cnt"),
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("pcnt"))
        )
        top = pairs.orderBy(
            F.desc("pcnt"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["pcnt"])
        merges.append((rank, a, b, a + b, freq))
        vocab = vocab.select(
            bpe._apply_merge_col(F.col("syms"), a, b).alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def main() -> None:
    small = "--small" in sys.argv[1:]
    n_merges = 8
    if "--merges" in sys.argv[1:]:
        n_merges = int(sys.argv[sys.argv.index("--merges") + 1])
    n_words = 70_000 if small else 700_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_bpe_scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 700K distinct 33-hex-char words (16-symbol alphabet -> dense
    # pair collisions; a typical merged pair occurs in ~12% of words,
    # so the incremental loop's "affected fraction" is realistic, not
    # cherry-picked-small). cnt=1 per word, same as the r8 probe.
    wf = (
        spark.range(n_words)
        .select(
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.substring(F.md5(F.concat(F.lit("x"), F.col("id").cast("string"))), 1, 1),
            ).alias("word"),
            F.lit(1).alias("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    print(
        json.dumps({"vocab_words": wf.count(), "word_len": 33}),
        flush=True,
    )

    results = {}
    # legacy first: any session warmup bias favors the second runner,
    # but legacy's r8 official number (15.5 s/round) bounds it anyway
    t0 = time.perf_counter()
    legacy = legacy_distributed_bpe(wf, n_merges)
    wall = time.perf_counter() - t0
    results["legacy_full_recount"] = legacy
    print(
        json.dumps(
            {
                "loop": "legacy_full_recount",
                "merges": len(legacy),
                "wall_sec": round(wall, 1),
                "sec_per_round": round(wall / max(len(legacy), 1), 2),
            }
        ),
        flush=True,
    )

    t0 = time.perf_counter()
    inc = bpe.learn_bpe_merges(
        wf.select(F.col("word").alias("text")).withColumn(
            "cnt_ignored", F.lit(1)
        ),
        "text",
        n_merges=n_merges,
        max_driver_words=0,
    ).collect()
    wall = time.perf_counter() - t0
    inc_tuples = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in inc
    ]
    results["incremental"] = inc_tuples
    print(
        json.dumps(
            {
                "loop": "incremental_deltas",
                "merges": len(inc_tuples),
                "wall_sec": round(wall, 1),
                "sec_per_round": round(wall / max(len(inc_tuples), 1), 2),
            }
        ),
        flush=True,
    )

    agree = results["legacy_full_recount"] == results["incremental"]
    print(json.dumps({"merge_tables_agree": agree}), flush=True)
    spark.stop()
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
