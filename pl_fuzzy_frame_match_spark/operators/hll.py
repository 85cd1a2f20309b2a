"""HyperLogLog distinct-count sketch, engine-portable and exactly
SQL-replayable (Flajolet et al., AofA 2007).

Spark ships `approx_count_distinct` (its own HLL++), but its register
state is opaque: you cannot persist it, merge sketches built by
another engine, or value-check it cross-engine. This operator builds
the registers from the FIRST 64 BITS OF md5 — the same portable hash
the sampling/DSIR families use — so

- the register table (2^p rows max) is a first-class DataFrame you
  can store, union and re-aggregate: ``merge(sketch(A), sketch(B)) ==
  sketch(A UNION B)`` holds EXACTLY (register max is associative,
  commutative, idempotent) — the 100 TB pattern is per-shard/day
  sketches rolled up without ever shuffling raw keys;
- every register value AND the final estimate replay bit-for-bit in
  DuckDB SQL (the oracle): the inner sum runs over INTEGERS
  (sum of 2^(49-rho), max 2^60 over 4096 registers — no
  order-dependent float accumulation), and only the final
  alpha * m^2 / S division is floating point.

Hash layout (p register bits from 64-bit md5 prefix, default p=12 ->
m=4096 registers, ~1.6% standard error):

    idx = first p bits   (3 hex chars at p=12)
    w   = remaining 64-p = 52... (next 12 hex chars = 48 bits used)
    rho = position of w's highest set bit from the top + 1
        = 49 - bit_length(w)   (w == 0 -> 49)

Small-range correction: linear counting ``m * ln(m / zero_registers)``
when the raw estimate is under 2.5 m and empty registers remain —
the standard HLL regime switch, replayed identically in the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^12 = 4096 registers: ~1.04/sqrt(m) = 1.6% standard error, 3 hex
# chars of register index so the hex slicing stays byte-aligned in
# both engines.
HLL_P = 12
# bits of w kept after the index: 12 hex chars = 48 bits (out of the
# 52 remaining in the 64-bit prefix — dropping 4 bits costs nothing:
# rho > 48 occurs with probability 2^-48)
HLL_W_BITS = 48


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """(reg_idx int, rho int) register table of the non-empty
    registers — max over all keys hashing into each register. Pure
    Catalyst (md5 + conv + length), one groupBy shuffle of <= 2^p
    surviving rows per partition (map-side max combine)."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    hexes = p // 4
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, hexes), 16, 10).cast("int")
    w = F.conv(
        F.substring(h, hexes + 1, HLL_W_BITS // 4), 16, 10
    ).cast("bigint")
    # conv(x, 16, 2) drops leading zeros, so its length IS w's bit
    # length; w = 0 -> "0" (length 1), special-cased to the max rho
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1)
        - F.length(F.conv(F.substring(h, hexes + 1, HLL_W_BITS // 4), 16, 2))
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(idx.alias("reg_idx"), rho.cast("int").alias("rho"))
        .groupBy("reg_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union register tables and keep the per-register max — the
    sketch of the union of the underlying key sets, EXACTLY (property
    tested). Input frames may come from different runs, engines or
    days; this is the rollup that replaces a distinct shuffle of raw
    keys at fleet scale."""
    if not register_frames:
        raise ValueError("need at least one register frame")
    out = register_frames[0]
    for nxt in register_frames[1:]:
        out = out.unionByName(nxt)
    return out.groupBy("reg_idx").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row estimate frame from a register table:
    (m, used_registers, hll_estimate). The register sum is INTEGER
    (sum of 2^(49-rho) plus 2^49 per empty register), so the estimate
    is a deterministic function of the register multiset — no
    accumulation-order dependence to break cross-engine replay."""
    m = 1 << p
    top = HLL_W_BITS + 1
    alpha = _alpha(m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            F.expr(f"CAST(power(2.0, {top} - rho) AS BIGINT)")
        ).alias("s_used"),
    )
    s_int = (
        F.coalesce(F.col("s_used"), F.lit(0))
        + (F.lit(m) - F.col("used")) * F.lit(2 ** top).cast("bigint")
    )
    raw = (
        F.lit(alpha * m * m * float(2 ** top)) / s_int.cast("double")
    )
    zeros = F.lit(m) - F.col("used")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("used").cast("long").alias("used_registers"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct_report(
    df: DataFrame, key_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-key-column HLL estimate NEXT TO the exact distinct count:
    (key, m, used_registers, hll_estimate, exact_distinct, rel_error)
    — the self-certifying form (like the Misra-Gries exactness
    certificate): the report carries its own error so a pipeline can
    gate on it. Exact distinct is computed per column in the same
    plan; at fleet scale you drop it and trust the 1.04/sqrt(m)
    bound the report was certified with at sample scale."""
    out = None
    for key in key_cols:
        est = hll_estimate(hll_registers(df, key, p), p)
        exact = df.where(F.col(key).isNotNull()).agg(
            F.countDistinct(key).alias("exact_distinct")
        )
        row = (
            est.crossJoin(F.broadcast(exact))
            .select(
                F.lit(key).alias("key"),
                "m",
                "used_registers",
                "hll_estimate",
                F.col("exact_distinct").cast("long"),
                # zero-guard (ADVICE r10): an empty / all-null key
                # column has exact_distinct == 0 — emit 0.0 (the
                # estimate is also 0, so the error is vacuously
                # perfect; same fixed-point convention as
                # blocking_quality / er_quality) instead of a null
                # (default mode) or a divide error (ANSI mode)
                F.when(
                    F.col("exact_distinct") > 0,
                    F.round(
                        F.abs(
                            F.col("hll_estimate") - F.col("exact_distinct")
                        )
                        / F.col("exact_distinct"),
                        6,
                    ),
                ).otherwise(F.lit(0.0)).alias("rel_error"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def hll_error_bound(p: int = HLL_P) -> float:
    """The 1.04 / sqrt(m) standard-error bound for ``p`` — exposed so
    callers can gate rel_error against the theory."""
    return 1.04 / math.sqrt(float(1 << p))


def hll_registers_by(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """Grouped register tables: (group_cols..., reg_idx, rho) — one
    independent HLL sketch PER GROUP, built in a single groupBy pass
    (<= 2^p surviving rows per group, map-side max combine). The
    fleet-scale replacement for ``GROUP BY g, COUNT(DISTINCT k)``: the
    shuffle moves bounded register rows per group instead of every
    distinct (g, k) pair, and per-group sketches still merge exactly
    across shards/days via the register max."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    hexes = p // 4
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, hexes), 16, 10).cast("int")
    w = F.conv(
        F.substring(h, hexes + 1, HLL_W_BITS // 4), 16, 10
    ).cast("bigint")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1)
        - F.length(F.conv(F.substring(h, hexes + 1, HLL_W_BITS // 4), 16, 2))
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            idx.alias("reg_idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_by(
    registers: DataFrame,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """Per-group estimates from a grouped register table:
    (group_cols..., m, used_registers, hll_estimate) — the identical
    integer register sum and linear-counting switch as
    :func:`hll_estimate`, evaluated per group in one aggregation."""
    m = 1 << p
    top = HLL_W_BITS + 1
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            F.expr(f"CAST(power(2.0, {top} - rho) AS BIGINT)")
        ).alias("s_used"),
    )
    s_int = (
        F.coalesce(F.col("s_used"), F.lit(0))
        + (F.lit(m) - F.col("used")) * F.lit(2 ** top).cast("bigint")
    )
    raw = (
        F.lit(alpha * m * m * float(2 ** top)) / s_int.cast("double")
    )
    zeros = F.lit(m) - F.col("used")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        F.col("used").cast("long").alias("used_registers"),
        F.round(est, 4).alias("hll_estimate"),
    )
