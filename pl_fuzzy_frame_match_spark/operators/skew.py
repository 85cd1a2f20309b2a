"""Skew-mitigation join utility.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized sort-merge partitions at runtime and is the first answer to
join skew — it is on in this engine's sessions. Salting is the
portable, *planned* fallback for the cases AQE cannot re-plan:

- the skewed side feeds a downstream operator that must keep the
  imposed partitioning (AQE's split would break co-partitioning);
- broadcast is impossible (both sides large) AND one key's row count
  exceeds what a single split task can hold;
- deterministic task sizing is required (e.g. reproducible spill
  profiles in benchmarking).

The trade: the small side is replicated ``salt``× through the shuffle,
so salting only pays when the skewed side's hot keys dominate the
cost — pick ``salt`` ~ (hot-key rows / target rows per task).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where the LEFT side's hot keys are spread over
    ``salt`` shards: each left row gets a deterministic content-hash
    shard, the right side is replicated into every shard, and the join
    runs on ``keys + [shard]`` — so a key with 1e9 rows occupies
    ``salt`` tasks instead of one straggler.

    Row-level results are identical to ``left.join(right, on, how)``
    for ``inner``, ``left``, ``left_semi`` and ``left_anti`` joins
    (each left row meets the full right key-group inside its own
    shard). Right-preserving joins (``right``/``full``) would surface
    unmatched right rows once per shard and are rejected.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l_sharded = left.withColumn("__salt", lsalt)
    r_sharded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_sharded.join(r_sharded, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
