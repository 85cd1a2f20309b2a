"""VERDICT r12 item 7: capture the plan evidence the round-12 §8
adaptive-range-partitioning change actually targets — the range
Exchange INSIDE the rank/quantile primitives' pre-checkpoint frame
(the committed r12 captures were post-checkpoint and showed only
expression-id diffs).

Builds the exact pre-checkpoint frame `exact_quantiles` ranges
(lineitem l_extendedprice (value, count) rows) with the legacy
explicit N=64 and with the adaptive default, and writes both
formatted plans to plans/r13/.

    python scripts/capture_range_exchange_r13.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from capture_plans import explain_formatted  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.queries import load_table
    from pl_fuzzy_frame_match_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("plans_range_exchange")
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(F.col("l_extendedprice").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    counts = vals.groupBy("__v").agg(F.count(F.lit(1)).alias("__cnt"))
    variants = {
        "rangepartition_fixed64": counts.repartitionByRange(64, "__v")
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id()),
        "rangepartition_adaptive": counts.repartitionByRange("__v")
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id()),
    }
    for name, df in variants.items():
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"== {name} (exact_quantiles pre-checkpoint frame, "
                f"sf_dir={sf_dir}) ==\n"
            )
            fh.write(explain_formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
