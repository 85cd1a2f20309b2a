"""Heavy hitters — Misra-Gries summaries + exact-verification rescore.

Exact distributed top-k frequent items WITHOUT shuffling the full
(item, count) table. Classic mergeable-summaries construction
(Misra & Gries 1982; Agarwal et al. 2012, "Mergeable Summaries"):

1. each partition builds a capacity-``m`` Misra-Gries summary of its
   items (one pass, O(m) state, Arrow-batched via ``mapInPandas`` —
   the dict-with-decrement loop is data-dependent control flow, the
   documented per-partition imperative niche);
2. the per-partition candidate sets are unioned (<= m x partitions
   skinny rows — the ONLY thing that crosses the wire besides the
   recount);
3. an exact RECOUNT of just the candidates (broadcast semi-join +
   groupBy over candidate rows only) replaces the sketch's
   undercounted estimates with true frequencies;
4. a certificate is checked: an item absent from EVERY partition
   summary has true frequency <= sum_p(err_p) =: E (each partition's
   MG undercount bound). If the k-th candidate's exact count > E,
   the top-k is PROVABLY exact; otherwise fall back to the full
   exact aggregation — so the operator's OUTPUT is always exact
   top-k (hash-oracle-able), and the sketch is purely a shuffle-
   volume optimization.

Why this matters at 100 TB: the naive top-k shuffles every distinct
item once (map-side partial aggregation already collapses duplicates
within a task, but a web-scale vocabulary is ~1e8-1e9 distinct keys
ACROSS tasks). The sketch path shuffles <= m x partitions candidate
rows plus one broadcast-filtered recount keyed on <= m x partitions
items — independent of the distinct-item cardinality. The reference
(a fuzzy string matcher) has no sketch surface; this extends the
text-analytics family (`functions/text.py:vocabulary`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-partition summary capacity multiplier: capacity = k * FACTOR.
# Larger = tighter undercount bound (err_p <= n_p / (capacity + 1)),
# more candidate rows. 8x keeps the certificate comfortably provable
# on Zipfian data while the summary stays a few KB.
CAPACITY_FACTOR = 8

_SUMMARY_SCHEMA = "g string, mgcnt long, err long"


def _mg_summaries(items: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``g`` column:
    (g, undercounted count, null) per surviving candidate plus ONE
    (null, 0, err_p) certificate row per non-empty partition, where
    ``err_p`` is the partition's total decrement — the max undercount
    of ANY item in that partition (including items not in the
    summary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        err = 0
        seen = False
        for pdf in batches:
            for g in pdf["g"]:
                if g is None:
                    continue
                seen = True
                c = counts.get(g)
                if c is not None:
                    counts[g] = c + 1
                elif len(counts) < capacity:
                    counts[g] = 1
                else:
                    # decrement-all: every stored count drops by 1,
                    # zeros evicted; the arriving item is "absorbed"
                    err += 1
                    dead = []
                    for key in counts:
                        v = counts[key] - 1
                        if v:
                            counts[key] = v
                        else:
                            dead.append(key)
                    for key in dead:
                        del counts[key]
        if not seen:
            return
        out = pd.DataFrame(
            {
                "g": list(counts.keys()) + [None],
                "mgcnt": list(counts.values()) + [0],
                "err": [None] * len(counts) + [err],
            }
        )
        yield out

    return items.mapInPandas(run, _SUMMARY_SCHEMA)


def topk_frequent(
    items: DataFrame,
    k: int,
    item_col: str = "g",
    capacity: int | None = None,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``item_col`` (count
    desc, value asc), computed via the MG-sketch + recount + verify
    path when the certificate holds, and via the full exact
    aggregation otherwise. Either way the RESULT is exact — callers
    (and the DuckDB oracle) cannot tell which path ran."""
    cap = capacity if capacity is not None else k * CAPACITY_FACTOR
    g_items = items.select(F.col(item_col).alias("g")).where(
        F.col("g").isNotNull()
    )
    # one materialization: summaries + the recount both scan items
    g_items = g_items.localCheckpoint(eager=True)
    summaries = _mg_summaries(g_items, cap).localCheckpoint(eager=True)
    e_bound = (
        summaries.where(F.col("g").isNull())
        .agg(F.coalesce(F.sum("err"), F.lit(0)))
        .collect()[0][0]
    )
    candidates = summaries.where(F.col("g").isNotNull()).select(
        "g"
    ).distinct()
    exact = (
        g_items.join(F.broadcast(candidates), "g")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc("g")).limit(k).collect()
    kth_ok = len(top) >= k and int(top[-1]["cnt"]) > int(e_bound)
    no_missing = len(top) < k and e_bound == 0
    if kth_ok or no_missing:
        spark = items.sparkSession
        return spark.createDataFrame(
            [(r["g"], int(r["cnt"])) for r in top], "g string, cnt long"
        )
    # certificate failed (adversarial distribution / tiny capacity):
    # fall back to the always-correct full aggregation
    return (
        g_items.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("g"))
        .limit(k)
    )
