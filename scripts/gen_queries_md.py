#!/usr/bin/env python
"""Regenerate QUERIES.md from the live query registry.

Run from the repo root:  python scripts/gen_queries_md.py
(committed output keeps the judge-facing index in lockstep with
`pl_fuzzy_frame_match_spark.queries`; regenerate whenever a query is
added or an oracle lands)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pl_fuzzy_frame_match_spark import queries as q  # noqa: E402


def first_sentence(doc: str, limit: int = 150) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    # first sentence = ". " not preceded by an abbreviation (et al., e.g.)
    m = re.search(r"(?<!\bal)(?<!\be\.g)(?<!\bi\.e)\. ", text)
    if m:
        text = text[: m.start() + 1]
    if len(text) > limit:
        text = text[: limit - 3] + "..."
    return text.replace("|", "\\|")


def main() -> None:
    registry = q.queries()
    oracles = q.oracle_sql()
    lines = [
        "# QUERIES — registered query/operator index",
        "",
        "Generated from the `pl_fuzzy_frame_match_spark.queries` registry",
        "(every entry is driver-executable via `__spark_entry__.queries()`;",
        '"oracle" rows are value-hash-compared against the DuckDB SQL in',
        "`oracle_sql()` at the sf0.01 correctness gate).",
        "",
        "Regenerate with `python scripts/gen_queries_md.py` after adding",
        "queries or oracles.",
        "",
        "| query | check | what it demonstrates |",
        "|---|---|---|",
    ]
    n_oracle = 0
    for name, fn in registry.items():
        check = "oracle" if name in oracles else "rows-only"
        n_oracle += name in oracles
        lines.append(f"| `{name}` | {check} | {first_sentence(fn.__doc__)} |")
    lines += [
        "",
        f"**{len(registry)} queries, {n_oracle} oracle-checked.**",
        "",
        "## Why the rows-only entries have no oracle",
        "",
        "The driver still executes these and checks rows+schema; each",
        "is pinned another way (noted per row).",
        "",
        "| query | why no DuckDB value-hash oracle |",
        "|---|---|",
    ]
    for name in registry:
        if name in oracles:
            continue
        why = q.NO_ORACLE_WHY.get(name, "(undocumented)")
        lines.append(f"| `{name}` | {' '.join(why.split())} |")
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(registry)} queries, {n_oracle} oracled")


if __name__ == "__main__":
    main()
