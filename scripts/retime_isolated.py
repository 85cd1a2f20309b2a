"""Isolated re-time of one registry query (drift-adjudication
protocol, PLANS.md round 8 / VERDICT r8 #3): a FRESH Spark session,
the bench harness's own warmup discipline (sf0.001 code-path warmup +
one untimed target-SF run), then 5 timed trials. Prints one JSON line.

Run the script once per session sample:
    python scripts/retime_isolated.py dedup_minhash
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/retime_isolated.py fuzzy_join_ann
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pl_fuzzy_frame_match_spark import queries as q
    from pl_fuzzy_frame_match_spark.session import get_spark

    spark = get_spark(f"retime_{name}")
    fn = q.queries()[name]
    # code-path warmup + target-SF state warmup (same as bench.py)
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
        "noop"
    ).save()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    del df
    gc.collect()

    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        samples.append(round(time.perf_counter() - t0, 3))
        del df
        gc.collect()
    spark.stop()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "trials": samples,
                "median": round(statistics.median(samples), 3),
                "min": min(samples),
            }
        )
    )


if __name__ == "__main__":
    main()
