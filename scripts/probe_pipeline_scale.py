#!/usr/bin/env python
"""Scale probe (VERDICT r5 #8): pipeline_training_data at ~10x the
sf0.1 document count, per-stage rows/wall — proving no stage of the
composed pipeline (dedup -> leakage-safe split -> temperature mixture
-> shard routing) inherits a quadratic when the corpus grows past the
exact-edge crossover.

The 10x corpus replicates sf0.1's 5,000 documents ten times with a
per-replica suffix token: replicas are NEAR-duplicates (high shingle
overlap, distinct texts), so the near-dup edge machinery does real
work — ~10-doc duplicate components that the split must route as
units. Above LEAKAGE_EXACT_DOC_CAP the split's edge source is the
MinHash-banded builder by default (round-6 crossover).

Usage: python scripts/probe_pipeline_scale.py [replicas]
Prints a per-stage table at 1x and Nx for the linearity comparison.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, sf_dir: str, replicas: int):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(
            F.col("text").isNotNull()
            & F.col("doc_id").isNotNull()
            & F.col("lang").isNotNull()
        )
        .select("doc_id", "lang", "text")
    )
    if replicas <= 1:
        return docs
    reps = spark.range(replicas).select(F.col("id").alias("__r"))
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        "lang",
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("__r").cast("string")
        ).alias("text"),
    )


def run(spark, docs, label: str) -> None:
    from pl_fuzzy_frame_match_spark.functions.sampling import (
        apply_mixture_rates,
        shard_of,
        temperature_rates,
    )
    from pl_fuzzy_frame_match_spark.functions.text import token_count
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        exact_dedup,
        leakage_safe_split,
    )

    docs = docs.localCheckpoint(eager=True)
    n0 = docs.count()
    rows = [("input", n0, 0.0)]

    t = time.perf_counter()
    deduped = exact_dedup(docs, "text", "doc_id").localCheckpoint(eager=True)
    rows.append(("exact_dedup", deduped.count(), time.perf_counter() - t))

    t = time.perf_counter()
    split = leakage_safe_split(
        deduped, "text", "doc_id", test_rate=0.2, threshold=0.2
    ).localCheckpoint(eager=True)
    n_test = split.where(F.col("split") == "test").count()
    rows.append(("leakage_split", split.count(), time.perf_counter() - t))

    t = time.perf_counter()
    train = split.where(F.col("split") == "train")
    rates = temperature_rates(train, "lang", "text")
    kept = apply_mixture_rates(train, rates, "lang", "doc_id")
    kept = kept.localCheckpoint(eager=True)
    rows.append(("mixture", kept.count(), time.perf_counter() - t))

    t = time.perf_counter()
    shards = (
        kept.select(
            "doc_id",
            shard_of(F.col("doc_id"), 16).alias("shard"),
            token_count(F.col("text")).alias("__dt"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.sum("__dt").cast("long").alias("n_tokens"),
        )
    )
    shards.write.mode("overwrite").format("noop").save()
    rows.append(("shards", 16, time.perf_counter() - t))

    print(f"\n== {label} ({n0} docs; test rows {n_test}) ==")
    print(f"{'stage':<16}{'rows out':>12}{'wall s':>10}")
    for name, n, w in rows:
        print(f"{name:<16}{n:>12}{w:>10.2f}")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pl_fuzzy_frame_match_spark.session import get_spark

    spark = get_spark("pipeline-scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    run(spark, corpus(spark, sf_dir, 1), "1x baseline")
    # release the 1x run's checkpoint blocks before timing 10x — the
    # ContextCleaner only frees them after the Python references die,
    # and accumulated blocks inflate the next run's GC (bench.py
    # learned the same lesson; first measured here as 78.8 s vs
    # 29.9 s isolated for the identical 10x split)
    import gc

    gc.collect()
    run(spark, corpus(spark, sf_dir, replicas), f"{replicas}x")
    spark.stop()


if __name__ == "__main__":
    main()
