"""Capture `.explain("formatted")` for registry queries into text
files (optimization-round evidence: plans/<round>/<query>_<tag>.txt).

    python scripts/capture_plans.py before q1 q2 ...
    python scripts/capture_plans.py after q1 q2 ...

Construction alone is enough for the plan (fuzzy_match_dfs runs its
eager planner actions during construction; that is part of the plan
shape we want on record). Output dir: plans/$SPARK_GRAFT_PLAN_ROUND
(default r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def explain_formatted(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pl_fuzzy_frame_match_spark import queries as q
    from pl_fuzzy_frame_match_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    )
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(f"plans_{tag}")
    registry = q.queries()
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            text = f"ERROR constructing {name}: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({tag}, sf_dir={sf_dir}) ==\n")
            fh.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
