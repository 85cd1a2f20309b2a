"""Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
engine-portable, mergeable, exactly SQL-replayable.

The third member of the engine's sketch family, with a different
contract than its siblings: Misra-Gries (`operators/heavyhitters`)
finds WHICH keys are frequent, HyperLogLog (`operators/hll`) counts
HOW MANY distinct keys exist; Count-Min answers point queries — "how
often did THIS key occur" — for any key, seen or not, with a
one-sided error: estimates never undercount, and overcount by at
most eps * N with probability 1 - delta (w = ceil(e/eps) buckets,
d = ceil(ln 1/delta) rows).

Portability/mergeability design, same rules as the HLL module:

- row hashes are md5 over "<row>:<key>" (the engine-portable hash
  family), so two engines — or two days of data — build bit-identical
  bucket layouts;
- the sketch is a (row, bucket, cnt, width) DataFrame of INTEGER
  counts: merging sketches is a plain sum-aggregate (counts are
  additive), ``merge(cm(A), cm(B)) == cm(A ++ B)`` EXACTLY (property
  tested); at fleet scale per-shard sketches roll up in d * w rows
  each instead of shuffling raw keys. ``width`` is a constant column
  recording the build width — depth is inferable from max(row), width
  is not, and probing or inner-producting sketches built with
  different widths lands on misaligned buckets and silently
  undercounts (ADVICE r11), so both estimators validate it;
- estimation is integer min-of-d — no floating point anywhere, so
  the DuckDB oracle replays every bucket and every estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4 rows x 1024 buckets: eps = e/1024 ~ 0.27% of the stream mass,
# delta = e^-4 ~ 1.8% — and 4096 integer cells total, three orders
# below the key spaces it summarizes.
CM_DEPTH = 4
CM_WIDTH = 1024


def _bucket(row: int, key, width: int = CM_WIDTH) -> F.Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(row)), key.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(int(width))).cast("int")


def cm_sketch(
    df: DataFrame, key_col: str, depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt, width) Count-Min table of ``key_col``
    occurrences (null keys excluded). One explode by depth (a
    constant, default 4) and one groupBy with map-side combine — the
    only shuffle moves at most depth * width rows per input
    partition. ``width`` sizes the error: eps = e / width of the
    stream mass — join-size estimation over high-cardinality keys
    wants width ~ n_keys / 10 (the collision inner-product term
    shrinks linearly in width). The build width rides along as a
    constant column (added AFTER the aggregate — zero state cost,
    streaming-safe) so estimators can reject mismatched sketches."""
    key = F.col(key_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(j, key, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.where(key.isNotNull())
        .select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("width", F.lit(int(width)))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Sum-merge sketch tables — the sketch of the concatenated
    streams, exactly (counts are additive per cell). Grouping carries
    the width column: cells from same-width builds collapse as
    before, while a mixed-width merge keeps distinct width values in
    the output and the estimators' width probe fails fast instead of
    summing misaligned buckets."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for nxt in sketches[1:]:
        out = out.unionByName(nxt)
    return (
        out.groupBy("row", "bucket", "width")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "bucket", "cnt", "width")  # cm_sketch's order
    )


def _probe_sketch(sketch: DataFrame):
    """One aggregate over a (materialized) sketch: (max row, min
    width, max width). Raises on a mixed-width table — that only
    arises from merging sketches built with different widths, whose
    cells never align. A sketch table lacking the width column (built
    outside this module) skips the width check — depth validation
    still applies."""
    if "width" not in sketch.columns:
        sketch = sketch.withColumn("width", F.lit(None).cast("int"))
    row = sketch.agg(
        F.max("row").alias("d"),
        F.min("width").alias("w_lo"),
        F.max("width").alias("w_hi"),
    ).first()
    if (
        row["w_lo"] is not None
        and row["w_hi"] is not None
        and int(row["w_lo"]) != int(row["w_hi"])
    ):
        raise ValueError(
            f"sketch mixes build widths {int(row['w_lo'])} and "
            f"{int(row['w_hi'])} — merging sketches of different "
            "widths sums misaligned buckets; rebuild with one width"
        )
    return (
        None if row["d"] is None else int(row["d"]),
        None if row["w_lo"] is None else int(row["w_lo"]),
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(key_col, cm_estimate) for every row of ``keys``: min over the
    d rows of the key's bucket count — 0 for never-seen keys (their
    buckets may still collide, so the estimate stays one-sided). The
    probe side explodes to d rows per key and equi-joins the sketch;
    with the sketch's <= d * width rows broadcast, the lookup is
    map-only.

    The sketch is localCheckpoint-ed here (<= d * w rows) so the
    fail-fast probe and the returned estimate plan share ONE
    materialization of the sketch's lineage instead of re-running the
    input scan + shuffle twice (ADVICE r11)."""
    key = F.col(key_col)
    sketch = sketch.localCheckpoint(eager=True)
    # Fail fast on a depth mismatch (ADVICE r10): probing rows the
    # sketch was never built with left-joins to nulls, coalesces to 0
    # and min() silently returns 0 — violating the one-sided
    # never-undercount guarantee. Same aggregate validates the build
    # width (ADVICE r11): a width-mismatched probe hashes into
    # buckets the sketch never filled and silently undercounts too.
    built, built_w = _probe_sketch(sketch)
    if built is not None and depth > built + 1:
        raise ValueError(
            f"cm_estimate depth={depth} exceeds the sketch's build "
            f"depth {built + 1}; estimates would silently "
            "undercount — probe with the build depth"
        )
    if built_w is not None and int(width) != built_w:
        raise ValueError(
            f"cm_estimate width={width} != the sketch's build width "
            f"{built_w}; probe buckets would misalign and silently "
            "undercount — probe with the build width"
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(j, key, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probes = keys.where(key.isNotNull()).select(
        key_col, F.explode(rows).alias("rb")
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("rb.row") == sketch["row"])
        & (F.col("rb.bucket") == sketch["bucket"]),
        "left",
    )
    return (
        joined.groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cm_estimate")
        )
    )


def cm_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """One-row ``(cm_join_size)`` estimate of the equi-join
    cardinality |A JOIN B| on the sketched key: the minimum over the
    d rows of the cell-wise inner product — the Count-Min/AMS
    join-size estimator (Cormode & Muthukrishnan 2005, §4.2). One-
    sided: collisions only ADD mass, so the estimate never
    undercounts the true join size, and it is exact when either
    sketch is collision-free.

    This is the 100 TB join-planning primitive: per-shard sketches
    merge by cell sum (`cm_merge`), so the join size of two
    petabyte-scale tables is estimated from two <= depth * width cell
    tables without touching raw keys or running the join. The inner
    product joins the two cell tables on (row, bucket); rows with no
    overlapping buckets contribute an inner product of 0 (the
    estimate is then 0 — disjoint key sets).

    Both sketches are localCheckpoint-ed (<= d * w rows each) so the
    depth/width probes and the inner-product plan share one
    materialization per sketch instead of re-running each input scan
    (ADVICE r11). Depth AND width must match between the two builds:
    depth is probed from max(row), width from the sketch's recorded
    width column — a width mismatch joins misaligned buckets and can
    silently undercount, breaking the one-sided guarantee."""
    sketch_a = sketch_a.localCheckpoint(eager=True)
    sketch_b = sketch_b.localCheckpoint(eager=True)
    da, wa = _probe_sketch(sketch_a)
    db, wb = _probe_sketch(sketch_b)
    spark = sketch_a.sparkSession
    if da is None or db is None:
        return spark.createDataFrame([(0,)], "cm_join_size long")
    if da != db:
        raise ValueError(
            f"sketch depth mismatch: {da + 1} vs {db + 1} — "
            "join-size estimation needs sketches built with the same "
            "depth"
        )
    if wa is not None and wb is not None and wa != wb:
        raise ValueError(
            f"sketch width mismatch: {wa} vs {wb} — the cell-wise "
            "inner product joins misaligned buckets and can silently "
            "undercount; rebuild both sketches with one width"
        )
    prod = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.row").alias("row"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("p"),
        )
    )
    per_row = prod.groupBy("row").agg(F.sum("p").alias("ip"))
    rows = spark.range(da + 1).select(F.col("id").alias("row"))
    return (
        rows.join(per_row, "row", "left")
        .select(F.coalesce(F.col("ip"), F.lit(0)).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cm_join_size"))
    )
