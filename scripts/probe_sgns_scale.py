#!/usr/bin/env python
"""Scaling probe for the round-12 fused path-array skip-gram
(OPTIMIZATION_r12.md §16): one decade of walk volume, fused
in-array pair generation vs the explode + walk-id self-join form,
both on the broadcast walk route.

Synthesizes a degree-bounded random graph (md5-derived neighbors, so
runs are deterministic), walks every node (length 4), and times
window-2 pair extraction + count to a noop sink. Prints one JSON
line per (n_nodes, form). The claim under test: the fused form's
cost is linear in walk count (per-walk array work + ONE count
aggregation), with no join exchange to grow superlinearly.

    python scripts/probe_sgns_scale.py           # 20k and 200k nodes
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_edges(spark, n_nodes: int, degree: int):
    """Deterministic random graph: node i gets `degree` md5-drawn
    neighbors (self-loops dropped, duplicates fine — the walk
    operator symmetrizes + dedups)."""
    return (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("u"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(degree - 1)),
                    lambda j: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":", F.col("id").cast("string"), j.cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % F.lit(n_nodes),
                )
            ).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_sgns_scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "12g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pl_fuzzy_frame_match_spark.operators.graph import (
        skipgram_pairs,
        skipgram_pairs_from_paths,
        walk_path_arrays,
    )

    # pass 0 warms every code path (JIT, Python worker pool, codegen)
    # at the small size; only pass 1 is reported
    for pass_no in (0, 1):
      for n_nodes in ((4_000,) if pass_no == 0 else (20_000, 200_000)):
        edges = synth_edges(spark, n_nodes, degree=8).localCheckpoint(
            eager=True
        )
        for form in ("fused", "join"):
            t0 = time.perf_counter()
            paths = walk_path_arrays(edges, length=4, seed="w").localCheckpoint(
                eager=True
            )
            if form == "fused":
                pairs = skipgram_pairs_from_paths(paths, window=2)
            else:
                walks = paths.select(
                    "start", F.posexplode("path").alias("step", "node")
                ).where(F.col("node").isNotNull())
                pairs = skipgram_pairs(walks, window=2)
            pairs.write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t0, 2)
            if pass_no == 0:
                continue
            n_pairs = pairs.agg(F.sum("cnt")).collect()[0][0]
            print(
                json.dumps(
                    {
                        "n_nodes": n_nodes,
                        "form": form,
                        "wall_sec": wall,
                        "total_pair_occurrences": int(n_pairs),
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
