#!/usr/bin/env python
"""Measure the DISTRIBUTED connected-components path (VERDICT r7 #4).

Every prior scale probe ran under the 2M-edge driver-union-find
crossover; this one synthesizes edge sets PAST the crossover so the
pointer-jumping loop (`operators/graph.py::connected_components`) is
the measured code, on two topologies at opposite ends of the
convergence spectrum:

- ``clusters``: 1M star clusters of 5 nodes (5M edges) — the shape
  real near-dup graphs have (tiny diameter). Expect 2-3 rounds.
- ``chain``: one path of N nodes (N-1 edges) — the worst case for
  label propagation. Hash-to-min pointer jumping converges in
  O(log2 diameter) rounds, not O(diameter): expect ~log2(N)+2.

Prints one JSON line per scenario: edges, rounds, wall seconds, and
the observed log2 bound. Run from the repo root:

    python scripts/probe_graph_scale.py            # full (5M/4M edges)
    python scripts/probe_graph_scale.py --small    # 10x smaller, quick

Results are pinned in PLANS.md (round 8 section); the iteration-count
CONTRACT (rounds <= log2(diameter)+3 on a chain) is asserted in
tests/test_graph.py::test_distributed_rounds_log_bound.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pl_fuzzy_frame_match_spark.operators import graph


def main() -> None:
    small = "--small" in sys.argv[1:]
    scale = 10 if small else 1
    if small:
        # force the distributed loop below the production crossover
        graph.SMALL_GRAPH_EDGE_LIMIT = 0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_graph_scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    scenarios = {}

    # 1M clusters x 5 nodes: node ids g*5..g*5+4, star edges to g*5
    n_groups = 1_000_000 // scale
    stars = (
        spark.range(n_groups * 4)
        .selectExpr(
            "(id DIV 4) * 5 AS left_id",
            "(id DIV 4) * 5 + id % 4 + 1 AS right_id",
        )
    )
    scenarios["clusters_5M" if not small else "clusters_500k"] = (
        stars, n_groups * 4, 1  # diameter 2, log2 -> ~1
    )

    # one chain of N nodes: worst-case diameter
    n_chain = 4_000_000 // scale
    chain = spark.range(n_chain - 1).select(
        F.col("id").alias("left_id"), (F.col("id") + 1).alias("right_id")
    )
    scenarios["chain_4M" if not small else "chain_400k"] = (
        chain, n_chain - 1, n_chain - 1
    )

    for name, (edges, n_edges, diameter) in scenarios.items():
        edges = edges.localCheckpoint(eager=True)  # exclude synth cost
        t0 = time.perf_counter()
        out, rounds = graph.connected_components(
            edges, return_rounds=True
        )
        n_components = out.select("component").distinct().count()
        wall = round(time.perf_counter() - t0, 2)
        rec = {
            "scenario": name,
            "edges": n_edges,
            "diameter": diameter,
            "rounds": rounds,
            "log2_diameter_plus3": math.ceil(math.log2(max(diameter, 2))) + 3,
            "n_components": n_components,
            "wall_sec": wall,
            "sec_per_round": round(
                wall / max(rounds, 1), 2
            ),
            "path": "distributed"
            if rounds > 0
            else "driver_union_find",
        }
        print(json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
