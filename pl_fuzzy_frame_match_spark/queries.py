"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string.

This is the driver-facing surface consumed by ``__spark_entry__.py``:
the driver executes both sides at sf=0.01 and compares row counts,
schemas and order-insensitive value hashes. Float-valued outputs are
rounded to 6 decimals ON BOTH SIDES, and thresholds are chosen with a
numeric margin from the data's score values, so cross-engine ULP noise
cannot flip a row in or out of the result.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.kernels import distance_column
from .models import FuzzyMapping
from .operators.matcher import fuzzy_match_dfs
from .sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark callable, duckdb oracle SQL or None)
_REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> Dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


# ---------------------------------------------------------------------------
# Flagship fuzzy joins (SURVEY §2.3 J1/J3/J5, §3 pipeline)
# ---------------------------------------------------------------------------

@register(
    "fuzzy_join_lev",
    """
    SELECT c.*, s.*,
           round(1.0 - levenshtein(lower(c_name), lower(s_name))
                 / greatest(length(c_name), length(s_name), 1), 6)
               AS c_name_vs_s_name_levenshtein
    FROM customer c CROSS JOIN supplier s
    WHERE c_name IS NOT NULL AND s_name IS NOT NULL
      AND levenshtein(lower(c_name), lower(s_name))
          / greatest(length(c_name), length(s_name), 1) <= 0.30
    """,
)
def fuzzy_join_lev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-mapping fuzzy join, exact candidate path, pure-JVM scoring."""
    left = load_table(spark, sf_dir, "customer")
    right = load_table(spark, sf_dir, "supplier")
    out = fuzzy_match_dfs(
        left, right, [FuzzyMapping("c_name", "s_name", threshold_score=70.0)]
    )
    return _round6(out, "c_name_vs_s_name_levenshtein")


@register(
    "fuzzy_join_multi",
    """
    SELECT c.*, CAST(c_nationkey AS VARCHAR) AS c_nk,
           s.*, CAST(s_nationkey AS VARCHAR) AS s_nk,
           round(1.0 - levenshtein(lower(c_name), lower(s_name))
                 / greatest(length(c_name), length(s_name), 1), 6)
               AS c_name_vs_s_name_levenshtein,
           CAST(1.0 AS DOUBLE) AS c_nk_vs_s_nk_levenshtein
    FROM customer c CROSS JOIN supplier s
    WHERE c_name IS NOT NULL AND s_name IS NOT NULL
      AND levenshtein(lower(c_name), lower(s_name))
          / greatest(length(c_name), length(s_name), 1) <= 0.35
      AND CAST(c_nationkey AS VARCHAR) = CAST(s_nationkey AS VARCHAR)
    """,
)
def fuzzy_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-mapping conjunction: fuzzy name match AND exact (threshold
    100) nation-key match — exercises the multi-round refinement loop
    and selectivity ordering."""
    left = load_table(spark, sf_dir, "customer").withColumn(
        "c_nk", F.col("c_nationkey").cast("string")
    )
    right = load_table(spark, sf_dir, "supplier").withColumn(
        "s_nk", F.col("s_nationkey").cast("string")
    )
    out = fuzzy_match_dfs(
        left,
        right,
        [
            FuzzyMapping("c_name", "s_name", threshold_score=65.0),
            FuzzyMapping("c_nk", "s_nk", threshold_score=100.0),
        ],
    )
    return _round6(
        out, "c_name_vs_s_name_levenshtein", "c_nk_vs_s_nk_levenshtein"
    )


@register(
    "fuzzy_join_jw_part",
    """
    SELECT l.p_name, r.p_name AS p_name_right,
           round(jaro_winkler_similarity(lower(l.p_name), lower(r.p_name)), 6)
               AS p_name_vs_p_name_right_jaro_winkler
    FROM (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL) l
    CROSS JOIN (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL) r
    WHERE (1.0 - jaro_winkler_similarity(lower(l.p_name), lower(r.p_name))) <= 0.10
    """,
)
def fuzzy_join_jw_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self fuzzy join on a low-cardinality column. Exercises two
    reference rewrites at once: O2 (score once per distinct name pair)
    and O3 (low-uniqueness input dedup — sum uniqueness < 1.2 and
    cartesian > 1e6 collapses the inputs to their 64 distinct names at
    sf >= 0.01, intentionally changing output cardinality). Output is
    restricted to the deterministic columns (name pair + score) because
    O3's surviving payload row per key is arbitrary."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    out = fuzzy_match_dfs(
        part,
        part,
        [FuzzyMapping("p_name", "p_name", fuzzy_type="jaro_winkler", threshold_score=90.0)],
    )
    out = out.select(
        "p_name", "p_name_right", "p_name_vs_p_name_right_jaro_winkler"
    ).distinct()
    return _round6(out, "p_name_vs_p_name_right_jaro_winkler")


@register("fuzzy_join_ann", None)  # ANN is lossy by design -> rows-only check
def fuzzy_join_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forced LSH-approximate candidate path (reference
    cross_join_large_files): MinHashLSH over 3-gram shingles, top-N per
    key, then exact rescoring + threshold."""
    left = load_table(spark, sf_dir, "customer")
    right = load_table(spark, sf_dir, "supplier")
    out = fuzzy_match_dfs(
        left,
        right,
        [FuzzyMapping("c_name", "s_name", threshold_score=70.0)],
        use_appr_nearest_neighbor=True,
    )
    return _round6(out, "c_name_vs_s_name_levenshtein")


# ---------------------------------------------------------------------------
# Kernel surface (SURVEY §2.5 F1-F6): one query per metric on the
# nation x region cross (125 scored pairs, no threshold)
# ---------------------------------------------------------------------------

def _kernel_query(metric: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        cross = nation.select("n_nationkey", "n_name").crossJoin(
            region.select("r_regionkey", "r_name")
        )
        a, b = F.lower(F.col("n_name")), F.lower(F.col("r_name"))
        if metric == "hamming":
            # equal-length prefix so the DuckDB oracle (strict hamming)
            # is applicable; kernel itself handles unequal lengths
            a, b = F.substring(a, 1, 4), F.substring(b, 1, 4)
        sim = F.lit(1.0) - distance_column(metric, a, b)
        return cross.select(
            "n_nationkey", "n_name", "r_regionkey", "r_name",
            F.round(sim, 6).alias(f"sim_{metric}"),
        )

    return fn


_KERNEL_ORACLES = {
    "levenshtein": (
        "1.0 - levenshtein(lower(n_name), lower(r_name))"
        " / greatest(length(n_name), length(r_name), 1)"
    ),
    "jaro": "jaro_similarity(lower(n_name), lower(r_name))",
    "jaro_winkler": "jaro_winkler_similarity(lower(n_name), lower(r_name))",
    "damerau_levenshtein": (
        "1.0 - damerau_levenshtein(lower(n_name), lower(r_name))"
        " / greatest(length(n_name), length(r_name), 1)"
    ),
    "hamming": (
        "1.0 - hamming(substr(lower(n_name), 1, 4), substr(lower(r_name), 1, 4)) / 4.0"
    ),
    "indel": None,  # no DuckDB equivalent -> rows-only check
}

for _metric, _expr in _KERNEL_ORACLES.items():
    _sql = (
        f"""
        SELECT n_nationkey, n_name, r_regionkey, r_name,
               round({_expr}, 6) AS sim_{_metric}
        FROM nation CROSS JOIN region
        """
        if _expr
        else None
    )
    register(f"kernel_{_metric}", _sql)(_kernel_query(_metric))
