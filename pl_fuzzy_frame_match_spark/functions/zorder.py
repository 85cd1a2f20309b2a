"""Z-order (Morton curve) clustering for multi-dimensional scan pruning.

At 100 TB a parquet scan prunes files and row groups by min/max
statistics. Sorting by ONE column makes its stats tight and every
other column's stats useless; interleaving the bits of several
columns into one Morton key and range-partitioning + sorting by that
key gives every participating column locality — each file covers a
small hyper-rectangle of the key space, so a selective predicate on
ANY of the z-ordered columns skips most files. This is the layout
move behind Delta/Iceberg `OPTIMIZE ZORDER BY`; here it is expressed
with plain Spark primitives: one min/max aggregation pass (two
scalars per column), a pure-Catalyst bit-interleave expression, and
`repartitionByRange(zvalue).sortWithinPartitions(zvalue)` at write.

Everything is deterministic and SQL-expressible — the per-row Morton
key is oracled against DuckDB evaluating the same shift/mask
arithmetic (`layout_zorder_lineitem` in queries.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min/max-scale a numeric column onto [0, 2^bits - 1] integers.
    The max value maps to 2^bits - 1 (inclusive); constant columns
    map to 0. Deterministic integer arithmetic — replayable in SQL."""
    span = (cmax.cast("double") - cmin.cast("double"))
    top = float(2**bits - 1)
    scaled = F.when(
        span > 0,
        F.floor((col.cast("double") - cmin.cast("double")) / span * top + 0.5),
    ).otherwise(F.lit(0))
    return scaled.cast("long")


def interleave_bits(cols: Sequence[Column], bits: int) -> Column:
    """Morton key: bit i of column j lands at position i * n_cols + j.
    A sum of shifted single-bit masks — pure Catalyst, whole-stage
    codegen, no Python. ``n_cols * bits`` must fit a signed long."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + j)
    return out


def zorder_key_frame(
    df: DataFrame, cols: Sequence[str], bits: int = 12, out_col: str = "zvalue"
) -> DataFrame:
    """Attach the Morton key. One aggregation pass for the per-column
    min/max (2·n scalars crossed in — a broadcast of one row), then a
    map-only expression: no shuffle of the data itself."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    scaled = [
        scale_to_bits(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    return joined.withColumn(out_col, interleave_bits(scaled, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Cluster-by-Morton-key write: range-partition into ``n_files``
    key ranges (each output file covers a compact hyper-rectangle),
    sort within each so row-group stats are tight too, drop the key."""
    keyed = zorder_key_frame(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_stats(
    path: str, box: Dict[str, Tuple[float, float]]
) -> Tuple[int, int]:
    """Offline layout-quality probe: from parquet footers alone, how
    many row groups could a reader skip for a conjunctive box
    predicate? Returns (total_rowgroups, overlapping_rowgroups).
    Uses pyarrow metadata only — no data read."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    total = overlapping = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        idx = {c: names.index(c) for c in box}
        for g in range(meta.num_row_groups):
            total += 1
            rg = meta.row_group(g)
            hit = True
            for c, (lo, hi) in box.items():
                st = rg.column(idx[c]).statistics
                if st is None or st.min is None:
                    continue  # no stats: reader cannot skip
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            overlapping += int(hit)
    return total, overlapping
