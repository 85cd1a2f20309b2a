"""Drop-in module parity with the reference's ``_utils``
(/root/reference/pl_fuzzy_frame_match/_utils.py): execution/spill
helpers. On Spark most of these dissolve into the engine (pipelined
spillable execution, Parquet writers, ``localCheckpoint``); the names
keep working for callers of the reference's component API.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Row


def collect_lazy_frame(df: DataFrame) -> List[Row]:
    """Reference _utils.py:10-29: materialize a lazy plan. Spark's
    execution is already pipelined and spillable — no streaming/auto
    engine fallback needed."""
    return df.collect()


def write_polars_frame(
    _df: DataFrame, path: str, estimated_size: int = 0
) -> bool:
    """Reference _utils.py:32-84: persist a frame to disk. The
    size-based small/large strategy split is subsumed by Spark's
    writer; ``estimated_size`` is accepted and ignored."""
    _df.write.mode("overwrite").parquet(path)
    return True


def cache_polars_frame_to_temp(
    _df: DataFrame, tempdir: Optional[str] = None
) -> DataFrame:
    """Reference _utils.py:87-118: spill + reopen for plan truncation.
    ``localCheckpoint`` is the Spark analogue (truncates lineage, keeps
    the data executor-local); ``tempdir`` is accepted and ignored."""
    return _df.localCheckpoint(eager=True)
