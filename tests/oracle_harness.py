"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet tables, compare row
count, sorted column names, and an order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pl_fuzzy_frame_match_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # queries round to 6 decimals already; normalize representation
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_with_oracle(spark_df, sql: str, sf_dir: str) -> None:
    actual = spark_df.toPandas()
    expected = run_oracle(sql, sf_dir)
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a, e = canonical_rows(actual), canonical_rows(expected)
    if a != e:
        diff_a = [r for r in a if r not in set(e)][:5]
        diff_e = [r for r in e if r not in set(a)][:5]
        raise AssertionError(
            f"value mismatch; spark-only rows (5): {diff_a}; oracle-only rows (5): {diff_e}"
        )
