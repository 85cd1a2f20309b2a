#!/usr/bin/env python
"""Stage profile of the bench ceiling `docs_dup_char_spans_exact`
(VERDICT r11 #4): where do its ~8 s go?

At span_len=16 the prefix-doubling loop runs ZERO rounds (the 8-char
base gram already covers half the window), so the query is exactly:

  A. posexplode the corpus to (doc, off, 8-char gram)      [map]
  B. global_dense_rank over the gram:
     B1. repartitionByRange + sortWithinPartitions + EAGER
         localCheckpoint                                    [sort+mat]
     B2. per-partition row counts -> driver offsets (64 rows)
     B3. rank-assignment pass over the checkpoint
         (mapInPandas Arrow round trip today)               [Python]
  C. two-level combine: tail self-join + len filter +
     (r, rt) groupBy + join back + per-doc agg              [joins]

The probe times cumulative prefixes of that pipeline with noop writes
(fresh frames each time, warm code paths), so stage cost = prefix
delta. Run contention-free:
    python scripts/profile_char_spans.py
Paste the JSON lines into PLANS.md round 12.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        global_dense_rank,
    )
    from pl_fuzzy_frame_match_spark.session import get_spark
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    spark = get_spark("profile_char_spans")
    docs = load_table(spark, SF_DIR, "documents")
    span_len, base_w = 16, 8

    def build_pos():
        t = F.lower(F.col("text"))
        return (
            docs.select(F.col("doc_id").alias("doc"), t.alias("__t"))
            .where(F.length("__t") > 0)
            .select(
                "doc",
                F.explode(
                    F.sequence(F.lit(0), F.length("__t") - 1)
                ).alias("off"),
                F.col("__t"),
            )
            .select(
                "doc",
                "off",
                F.substring(
                    F.col("__t"), F.col("off") + 1, F.lit(base_w)
                ).alias("g"),
            )
        )

    # warm the code path once end-to-end at the profile SF
    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        duplicated_char_spans,
    )

    noop(duplicated_char_spans(docs, "text", "doc_id", span_len))

    n_pos = build_pos().count()
    print(json.dumps({"positions": n_pos, "sf_dir": SF_DIR}), flush=True)

    for trial in range(3):
        out = {"trial": trial}
        out["A_explode_only"] = noop(build_pos())

        # B1: sort + eager checkpoint happens INSIDE this call; the
        # rank pass (B3) then runs during the noop. B2 (64-row
        # collect) executes eagerly inside global_dense_rank.
        t0 = time.perf_counter()
        ranked = global_dense_rank(
            build_pos(), ["g"], "r", dense=False
        ).select("doc", "off", "r")
        out["B1_B2_sort_checkpoint_offsets"] = round(
            time.perf_counter() - t0, 3
        )
        out["B3_rank_assign_pass"] = noop(ranked)

        t0 = time.perf_counter()
        full = duplicated_char_spans(docs, "text", "doc_id", span_len)
        full.write.mode("overwrite").format("noop").save()
        out["total_query"] = round(time.perf_counter() - t0, 3)
        out["C_combine_joins_est"] = round(
            out["total_query"]
            - out["B1_B2_sort_checkpoint_offsets"]
            - out["B3_rank_assign_pass"],
            3,
        )
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
