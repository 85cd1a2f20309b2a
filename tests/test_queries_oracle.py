"""Run every registered query against its DuckDB oracle at sf0.001 —
the same check the driver performs at sf0.01 (CORRECTNESS gate)."""

import pytest

from pl_fuzzy_frame_match_spark import queries as q

from .conftest import SF_DIR
from .oracle_harness import compare_with_oracle

ALL = sorted(q.queries().keys())
ORACLED = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    fn = q.queries()[name]
    sql = q.oracle_sql()[name]
    compare_with_oracle(fn(spark, SF_DIR), sql, SF_DIR)


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_query_runs(spark, name):
    fn = q.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_no_oracle_reasons_complete():
    """Every rows-only registry entry documents WHY it has no DuckDB
    value-hash oracle (VERDICT r7 #8), and no stale reasons linger."""
    rows_only = set(q.queries()) - set(q.oracle_sql())
    assert rows_only == set(q.NO_ORACLE_WHY), (
        sorted(rows_only ^ set(q.NO_ORACLE_WHY))
    )
    assert all(len(v) > 40 for v in q.NO_ORACLE_WHY.values())
