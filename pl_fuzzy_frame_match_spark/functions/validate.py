"""Data-validation operators: declarative constraint audits over a
table (the ingest acceptance gate of a production pipeline — null
fractions, range violations, referential integrity), evaluated in as
few passes as the constraint class allows.

Row-local constraints all fuse into ONE aggregate scan (a conditional
count per constraint — map-side combined, zero extra shuffles);
referential checks are anti-join counts against the referenced key set.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_violation_counts(
    df: DataFrame, constraints: Dict[str, Column]
) -> DataFrame:
    """Evaluate named row-local constraints (each a boolean Column,
    True = row passes; NULL counts as a violation — an unknown is not
    a pass) in ONE aggregate pass. Returns long-format rows
    (constraint, n_violations, n_rows, violation_frac) ordered by
    constraint name.

    The single wide aggregate is the point: at 100 TB each extra
    validation query is another full scan, while conditional counts
    piggyback on one pass and combine map-side."""
    names = list(constraints)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(~F.coalesce(constraints[c], F.lit(False)), 1).otherwise(0)
        ).alias(f"__v_{i}")
        for i, c in enumerate(names)
    ]
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    spark = df.sparkSession
    out = [
        (c, int(row[f"__v_{i}"] or 0), n) for i, c in enumerate(names)
    ]
    # explicit schema: with an empty constraints dict `out` is an empty
    # list, and schema inference would raise — an empty audit frame is
    # the correct result (ADVICE r3)
    res = spark.createDataFrame(
        out, "constraint string, n_violations long, n_rows long"
    )
    return res.select(
        "constraint",
        "n_violations",
        "n_rows",
        F.round(
            F.col("n_violations") / F.greatest(F.col("n_rows"), F.lit(1)), 6
        ).alias("violation_frac"),
    ).orderBy("constraint")


def referential_violation_count(
    df: DataFrame,
    fk_cols: Sequence[str],
    ref: DataFrame,
    ref_cols: Sequence[str],
) -> int:
    """Count rows of ``df`` whose foreign key has no match in ``ref``
    (NULL keys count as violations). Plan: distinct-project the
    referenced key columns, LEFT ANTI join — Catalyst broadcasts the
    key set while it fits and falls back to a shuffled hash join past
    that; either way only the key columns move."""
    keys = ref.select(
        *[F.col(rc).alias(fc) for fc, rc in zip(fk_cols, ref_cols)]
    ).distinct()
    return df.select(*fk_cols).join(keys, on=list(fk_cols), how="left_anti").count()
