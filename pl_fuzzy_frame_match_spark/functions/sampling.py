"""Deterministic sampling / dataset splitting for training pipelines.

`df.sample()` / `sampleBy()` are seed-dependent AND partition-layout-
dependent — rerun the pipeline after a repartition and a different
subset comes back. Training-data splits need to be a pure function of
the ROW (so they are reproducible across engines, runs, and cluster
sizes, and so a document never migrates from test into train when the
corpus grows). The standard trick: hash a stable key, split the hash
space by the requested fractions.

We hash with ``md5`` (hex) and split on the LEXICOGRAPHIC order of
the hex prefix: hex-string comparison is identical in every engine
(and in the DuckDB correctness oracle), which makes the split
SQL-replayable — unlike ``xxhash64``/``hash``, whose implementations
are engine-private. md5 per row is ~100ns JVM-side; it never leaves
whole-stage codegen.

Granularity: the split boundary quantizes to 4 hex chars (1/65536);
fractions are honored to ±0.002% in expectation, exact per-key
determinism always.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_CHARS = 4  # 16^4 = 65536 buckets


def _boundaries(fractions: Sequence[Tuple[str, float]]) -> list:
    """[(label, hi_hex_exclusive)] cumulative upper bounds."""
    total = sum(f for _, f in fractions)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for label, frac in fractions:
        acc += frac
        hi = min(int(round(acc * (16**_HEX_CHARS))), 16**_HEX_CHARS)
        out.append((label, format(hi, f"0{_HEX_CHARS}x")))
    return out


def split_column(key: Column, fractions: Sequence[Tuple[str, float]]) -> Column:
    """A label column assigning each row to a split, deterministically
    by ``md5(key)``. ``fractions`` = [(label, fraction)], summing to 1.
    The same key always lands in the same split, on any engine."""
    prefix = F.substring(F.md5(key.cast("string")), 1, _HEX_CHARS)
    bounds = _boundaries(fractions)
    # CASE chain: first matching upper bound wins, tail label otherwise
    expr = None
    for label, hi in bounds[:-1]:
        cond = prefix < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    if expr is None:
        return F.lit(bounds[-1][0])
    return expr.otherwise(F.lit(bounds[-1][0]))


def split_sql_case(key_sql: str, fractions: Sequence[Tuple[str, float]]) -> str:
    """The equivalent ANSI-SQL CASE expression (for oracles / other
    engines): same md5-prefix comparison, same boundaries."""
    bounds = _boundaries(fractions)
    # STRING parses as a VARCHAR alias in both Spark and DuckDB
    parts = [
        f"WHEN substr(md5(CAST({key_sql} AS STRING)), 1, {_HEX_CHARS})"
        f" < '{hi}' THEN '{label}'"
        for label, hi in bounds[:-1]
    ]
    return (
        "CASE " + " ".join(parts) + f" ELSE '{bounds[-1][0]}' END"
        if parts
        else f"'{bounds[-1][0]}'"
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: Sequence[Tuple[str, float]],
    label_col: str = "split",
) -> DataFrame:
    """Attach a split label column (train/val/test-style) that is a
    pure function of ``key_col`` — stable under reruns, repartitions,
    engine changes, and corpus growth."""
    return df.withColumn(label_col, split_column(F.col(key_col), fractions))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.2
) -> Dict[str, DataFrame]:
    """Two-way deterministic split; returns {"train": ..., "test": ...}.
    Filters on the label so each side is a plain pushdown-friendly
    predicate over the scan."""
    labeled = deterministic_split(
        df,
        key_col,
        [("train", 1.0 - test_fraction), ("test", test_fraction)],
    )
    return {
        "train": labeled.filter(F.col("split") == "train").drop("split"),
        "test": labeled.filter(F.col("split") == "test").drop("split"),
    }


def rate_predicate(key: Column, rate: float) -> Column:
    """Boolean: keep ``key`` with probability ``rate``, deterministic
    by md5 prefix (same quantization/portability contract as
    :func:`split_column`)."""
    hi = min(int(round(rate * 16**_HEX_CHARS)), 16**_HEX_CHARS)
    if hi >= 16**_HEX_CHARS:
        # a 5-hex-char bound would compare lexicographically BELOW
        # most 4-char prefixes; full rate is just "keep"
        return F.lit(True)
    return F.substring(F.md5(key.cast("string")), 1, _HEX_CHARS) < F.lit(
        format(hi, f"0{_HEX_CHARS}x")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep each row with its
    stratum's rate, as a pure function of ``key_col`` (rebalancing a
    skewed corpus — e.g. downsample the dominant language — without
    seed- or partition-layout-dependence; `df.sampleBy` is both).
    A single codegen'd CASE over the scan: filter pushes down, no
    shuffle, no per-stratum pass."""
    keep = None
    for stratum, rate in sorted(rates.items()):
        cond = (F.col(stratum_col) == stratum) & rate_predicate(
            F.col(key_col), rate
        )
        keep = cond if keep is None else keep | cond
    others = ~F.col(stratum_col).isin(*rates.keys()) & rate_predicate(
        F.col(key_col), default_rate
    )
    keep = others if keep is None else keep | others
    return df.filter(keep)


def stratified_sample_sql_predicate(
    key_sql: str,
    stratum_sql: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """The equivalent SQL WHERE predicate (oracle replay)."""

    prefix = f"substr(md5(CAST({key_sql} AS STRING)), 1, {_HEX_CHARS})"

    def keep(rate: float) -> str:
        v = min(int(round(rate * 16**_HEX_CHARS)), 16**_HEX_CHARS)
        if v >= 16**_HEX_CHARS:
            return "TRUE"
        return f"{prefix} < '{format(v, f'0{_HEX_CHARS}x')}'"

    parts = [
        f"({stratum_sql} = '{s}' AND {keep(r)})"
        for s, r in sorted(rates.items())
    ]
    in_list = ", ".join(f"'{s}'" for s in sorted(rates))
    parts.append(
        f"({stratum_sql} NOT IN ({in_list}) AND {keep(default_rate)})"
    )
    return " OR ".join(parts)


def sample_to_token_budget(
    df: DataFrame,
    text_col: str,
    id_col: str,
    stratum_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Corpus mixing to a per-stratum TOKEN budget: within each
    stratum, admit documents in deterministic md5-of-id priority order
    until the cumulative whitespace-token count reaches the budget
    (the document that crosses the boundary is included — the budget
    is a floor, matching "fill the mixture to N tokens").

    Determinism: the admission order is a pure function of the id, so
    the selected subset is stable across engines, reruns, partition
    layouts and corpus growth *ahead of* the cutoff point.

    Plan: one window (partitioned by stratum, ordered by the md5
    priority) computing a running token sum — a single shuffle keyed
    on the stratum. Within one stratum the running sum is a sequential
    per-partition scan, so a single stratum holding most of a 100 TB
    corpus serializes; at that scale the two-pass form is preferred
    (histogram token totals by md5 PREFIX bucket, pick the cutoff
    bucket driver-side, window ONLY the boundary bucket), which this
    function is the reference semantics for.
    """
    from pyspark.sql import Window

    from .text import token_count

    pri = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(pri)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = token_count(F.col(text_col)).cast("long")
    return (
        df.withColumn("__n_tokens", toks)
        .withColumn("__cum", F.sum("__n_tokens").over(w))
        .filter(
            (F.col("__cum") - F.col("__n_tokens")) < F.lit(budget_tokens)
        )
        .drop("__cum")
        .withColumnRenamed("__n_tokens", "n_tokens")
    )
