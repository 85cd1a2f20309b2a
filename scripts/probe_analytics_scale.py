#!/usr/bin/env python
"""Scale probe for the round-9 graph analytics (PageRank + triangle
counting): do the plans hold when the edge count grows ~4x past the
bench graph?

Scenarios (synthetic, deterministic):

- ``copurchase_sf0.1``: the real bench graph (19.8K nodes / 1.196M
  edges) — the anchor point.
- ``power4m``: a preferential-attachment-ish graph of 4M edges over
  400K nodes (each node i>16 links to (i * 2654435761) % i for 10
  draws — heavy-tailed in-degree, the shape of real co-occurrence
  graphs) — 3.3x the bench edges with 20x the nodes, exercising the
  rank-vector shuffle rather than the dense-block corner.

For each: PageRank (3 rounds) wall, triangle_stats wall + triangle
total, and the wedge volume (the intrinsic enumeration work) so the
wall-vs-work ratio is interpretable. Prints one JSON line per
scenario. Run AFTER the bench (contention-free), from the repo root:

    python scripts/probe_analytics_scale.py
    python scripts/probe_analytics_scale.py --small   # 10x smaller

Results pinned in PLANS.md (round 9, session B).
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pl_fuzzy_frame_match_spark.operators.graph import (  # noqa: E402
    cooccurrence_edges,
    pagerank,
    triangle_stats,
)
from pl_fuzzy_frame_match_spark.session import get_spark  # noqa: E402
from pl_fuzzy_frame_match_spark.sources.tables import load_table  # noqa: E402


def measure(name, edges):
    spark = edges.sparkSession
    edges = edges.localCheckpoint(eager=True)
    m = edges.count()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    wedges = (
        sym.groupBy("u")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0]
    )
    t0 = time.time()
    pagerank(edges, iterations=3).write.format("noop").mode(
        "overwrite"
    ).save()
    pr_s = time.time() - t0
    t0 = time.time()
    tri = triangle_stats(edges)
    total_tri = tri.agg(F.sum("triangles")).collect()[0][0] // 3
    tri_s = time.time() - t0
    print(
        json.dumps(
            {
                "scenario": name,
                "edges": m,
                "sym_wedges": int(wedges),
                "pagerank3_s": round(pr_s, 1),
                "triangles": int(total_tri),
                "triangle_s": round(tri_s, 1),
            }
        ),
        flush=True,
    )


def synth_edges(spark, n_nodes, draws=10):
    ids = spark.range(17, n_nodes).select(F.col("id").alias("v"))
    return (
        ids.select(
            "v",
            F.explode(
                F.array(*[F.lit(k) for k in range(draws)])
            ).alias("k"),
        )
        .select(
            ((F.col("v") * F.lit(2654435761) + F.col("k") * F.lit(40503))
             % F.col("v")).alias("u"),
            "v",
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def probe_rounds(spark, small):
    """Lineage-hygiene probe (VERDICT r9 #6): fixed-round iterative
    operators at the 4M-edge scale for 5..30 rounds — does checkpoint
    cadence keep the per-round wall flat and the final plan small, and
    what happens with the cadence disabled? Prints one JSON line per
    (op, rounds, cadence)."""
    from pl_fuzzy_frame_match_spark.operators.graph import (
        eigenvector_centrality,
        label_propagation,
    )

    edges = synth_edges(
        spark, 40_000 if small else 400_000
    ).localCheckpoint(eager=True)
    m = edges.count()
    cases = [
        ("pagerank", lambda r, ck: pagerank(
            edges, iterations=r, checkpoint_every=ck)),
        ("eigenvector", lambda r, ck: eigenvector_centrality(
            edges, iterations=r, checkpoint_every=ck)),
        ("label_prop", lambda r, ck: label_propagation(
            edges, rounds=r, checkpoint_every=ck)),
    ]
    for op, fn in cases:
        for rounds, cadence in (
            (5, 5), (10, 5), (20, 5), (30, 5), (20, 10**9)
        ):
            t0 = time.time()
            out = fn(rounds, cadence)
            # the operators checkpoint their result eagerly, so the
            # full iteration cost is paid inside fn(); the plan depth
            # of the RETURNED frame shows what lineage survives
            depth = len(
                out._jdf.queryExecution().optimizedPlan().toString()
                .splitlines()
            )
            wall = time.time() - t0
            print(
                json.dumps(
                    {
                        "op": op,
                        "edges": m,
                        "rounds": rounds,
                        "checkpoint_every": cadence,
                        "wall_s": round(wall, 1),
                        "per_round_s": round(wall / rounds, 2),
                        "result_plan_lines": depth,
                    }
                ),
                flush=True,
            )


def main():
    small = "--small" in sys.argv
    spark = get_spark("probe-analytics")
    if "--rounds" in sys.argv:
        probe_rounds(spark, small)
        return
    li = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    measure("copurchase_sf0.1", cooccurrence_edges(li, "l_orderkey", "l_partkey"))

    n_nodes = 40_000 if small else 400_000
    draws = 10
    ids = spark.range(17, n_nodes).select(F.col("id").alias("v"))
    edges = (
        ids.select(
            "v",
            F.explode(
                F.array(*[F.lit(k) for k in range(draws)])
            ).alias("k"),
        )
        .select(
            ((F.col("v") * F.lit(2654435761) + F.col("k") * F.lit(40503))
             % F.col("v")).alias("u"),
            "v",
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )
    measure("power4m" if not small else "power400k", edges)


if __name__ == "__main__":
    main()
