#!/usr/bin/env python
"""End-of-round shipping gate (VERDICT r7 #3).

Round 7 shipped a broken frame sampler: the break was visible in BOTH
`pytest tests/` (2 failures) and `BENCH_DETAIL.json.errors`, and
neither signal blocked the snapshot. This script is the blocker — run
it before declaring a round done:

    python scripts/ship_check.py            # full gate (~15 min)
    python scripts/ship_check.py --fast     # oracle replay + bench only

Exit 0 = shippable. Non-zero = DO NOT SHIP; the failing stage prints
why. Stages:

1. `pytest tests/` (or just `tests/test_queries_oracle.py` in --fast
   mode) — the full registry replays against DuckDB at sf0.001.
2. `python bench.py` at the default sf0.1 — bench.py itself now exits
   non-zero when any registered query errors (its `errors` map feeds
   BENCH_DETAIL.json), so a query that dies at bench scale fails the
   gate even when sf0.001 tests pass.
3. Asserts BENCH_DETAIL.json has an empty `errors` map and a parseable
   headline JSON line was produced (belt + braces around stage 2).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(stage: str, cmd: list[str]) -> None:
    print(f"[ship_check] {stage}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=HERE)
    if proc.returncode != 0:
        print(f"[ship_check] FAIL at {stage} (exit {proc.returncode})")
        sys.exit(proc.returncode or 1)


def main() -> None:
    fast = "--fast" in sys.argv[1:]
    pytest_target = (
        ["tests/test_queries_oracle.py"] if fast else ["tests/"]
    )
    run("pytest", [sys.executable, "-m", "pytest", "-q", *pytest_target])
    run("bench", [sys.executable, "bench.py"])

    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    if detail.get("errors"):
        print(f"[ship_check] FAIL: BENCH_DETAIL.json.errors = "
              f"{sorted(detail['errors'])}")
        sys.exit(1)
    n = len(detail.get("queries_median", {}))
    print(f"[ship_check] OK: tests green, bench clean ({n} timed queries)")


if __name__ == "__main__":
    main()
