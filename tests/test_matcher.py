"""End-to-end fuzzy-join tests replicating the reference's golden suite
(reference tests/test_pl_fuzzy_frame_match.py:339-404 and the edge cases
in tests/match_utils.py:116-193)."""

import pytest
from pyspark.sql import functions as F

from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

LEFT = {
    "id": [1, 2, 3, 4, 5],
    "company_name": ["Apple Inc.", "Microsft", "Amazon", "Gogle", "Facebok"],
    "address": [
        "1 Apple Park", "One Microsoft Way", "410 Terry Ave N",
        "1600 Amphitheatre", "1 Hacker Way",
    ],
    "contact": ["Tim Cook", "Satya Ndella", "Andy Jessy", "Sundar Pichai", "Mark Zukerberg"],
}
RIGHT = {
    "id": [101, 102, 103, 104, 105],
    "organization": [
        "Apple Incorporated", "Microsoft Corp", "Amazon.com Inc",
        "Google LLC", "Facebook Inc",
    ],
    "location": [
        "Apple Park, Cupertino", "Microsoft Way, Redmond",
        "Terry Ave North, Seattle", "Amphitheatre Pkwy, Mountain View",
        "Hacker Way, Menlo Park",
    ],
    "ceo": ["Timothy Cook", "Satya Nadella", "Andy Jassy", "Sundar Pichai", "Mark Zuckerberg"],
}

GOLDEN_JW = [0.88, 0.9142857142857143, 0.8857142857142858, 0.8666666666666667, 0.9166666666666667]
GOLDEN_LEV = [0.6666666666666667, 0.9230769230769231, 0.9, 1.0, 0.9333333333333333]


def _df(spark, data):
    cols = list(data.keys())
    rows = list(zip(*data.values()))
    return spark.createDataFrame(rows, cols)


def _mappings():
    return [
        FuzzyMapping("company_name", "organization", fuzzy_type="jaro_winkler", threshold_score=20.0),
        FuzzyMapping("contact", "ceo", fuzzy_type="levenshtein", threshold_score=30.0),
    ]


def test_golden_five_by_five(spark):
    result = fuzzy_match_dfs(_df(spark, LEFT), _df(spark, RIGHT), _mappings())
    assert result.columns == [
        "id", "company_name", "address", "contact",
        "id_right", "organization", "location", "ceo",
        "company_name_vs_organization_jaro_winkler", "contact_vs_ceo_levenshtein",
    ]
    rows = sorted(result.collect(), key=lambda r: r["id"])
    assert len(rows) == 5
    for i, r in enumerate(rows):
        assert r["id"] == LEFT["id"][i]
        assert r["id_right"] == RIGHT["id"][i]
        assert r["company_name"] == LEFT["company_name"][i]
        assert r["organization"] == RIGHT["organization"][i]
        assert r["company_name_vs_organization_jaro_winkler"] == pytest.approx(GOLDEN_JW[i], abs=1e-9)
        assert r["contact_vs_ceo_levenshtein"] == pytest.approx(GOLDEN_LEV[i], abs=1e-9)


def test_golden_with_column_collision(spark):
    # left company_name renamed to organization -> right becomes organization_right
    left = _df(spark, LEFT).withColumnRenamed("company_name", "organization")
    maps = [
        FuzzyMapping("organization", "organization", fuzzy_type="jaro_winkler", threshold_score=20.0),
        FuzzyMapping("contact", "ceo", fuzzy_type="levenshtein", threshold_score=30.0),
    ]
    result = fuzzy_match_dfs(left, _df(spark, RIGHT), maps)
    assert "organization_right" in result.columns
    assert "organization_vs_organization_right_jaro_winkler" in result.columns
    rows = sorted(result.collect(), key=lambda r: r["id"])
    assert len(rows) == 5
    for i, r in enumerate(rows):
        assert r["organization_vs_organization_right_jaro_winkler"] == pytest.approx(GOLDEN_JW[i], abs=1e-9)


def test_single_mapping_keeps_more_rows(spark):
    # permissive threshold on one mapping -> more than the diagonal
    result = fuzzy_match_dfs(
        _df(spark, LEFT), _df(spark, RIGHT),
        [FuzzyMapping("company_name", "organization", fuzzy_type="jaro_winkler", threshold_score=20.0)],
    )
    assert result.count() > 5


def test_multi_mapping_monotone_shrinkage(spark):
    # reference tests/test_pl_fuzzy_frame_match.py:284-325: each extra
    # mapping can only shrink the match set
    left, right = _df(spark, LEFT), _df(spark, RIGHT)
    m1 = [FuzzyMapping("company_name", "organization", fuzzy_type="jaro_winkler", threshold_score=20.0)]
    m2 = m1 + [FuzzyMapping("contact", "ceo", fuzzy_type="levenshtein", threshold_score=30.0)]
    c1 = fuzzy_match_dfs(left, right, m1).count()
    c2 = fuzzy_match_dfs(left, right, m2).count()
    assert c2 <= c1
    assert c2 == 5


def test_empty_inputs(spark):
    left = _df(spark, LEFT).limit(0)
    right = _df(spark, RIGHT)
    result = fuzzy_match_dfs(left, right, _mappings())
    assert result.count() == 0
    assert "company_name_vs_organization_jaro_winkler" in result.columns


def test_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None), (2, "Acme Corp")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(10, None), (11, "Acme Corp")], ["id", "name"]
    )
    result = fuzzy_match_dfs(
        left, right, [FuzzyMapping("name", "name", fuzzy_type="levenshtein", threshold_score=50.0)]
    )
    rows = result.collect()
    # nulls never match (reference process.py:94,97): only the non-null pair
    assert len(rows) == 1
    assert rows[0]["id"] == 2 and rows[0]["id_right"] == 11


def test_one_to_many_and_many_to_one(spark):
    one = spark.createDataFrame([(1, "ACME Corporation")], ["id", "name"])
    many = spark.createDataFrame(
        [(i, v) for i, v in enumerate(
            ["ACME Corp", "ACME Corporation", "ACME Co", "Acme Corporation Inc", "Completely Different"]
        )],
        ["id", "name"],
    )
    maps = [FuzzyMapping("name", "name", fuzzy_type="jaro_winkler", threshold_score=80.0)]
    assert fuzzy_match_dfs(one, many, maps).count() == 4
    assert fuzzy_match_dfs(many, one, maps).count() == 4


def test_duplicate_rows_produce_pairwise_matches(spark):
    # row identity: every input row pairs independently
    left = spark.createDataFrame([(1, "same"), (2, "same")], ["id", "name"])
    right = spark.createDataFrame([(10, "same")], ["id", "name"])
    maps = [FuzzyMapping("name", "name", threshold_score=90.0)]
    assert fuzzy_match_dfs(left, right, maps).count() == 2


def test_exact_cross_cardinality_no_matches(spark):
    # deterministic non-matching data: threshold high, disjoint strings
    left = spark.createDataFrame([(i, f"Company_{i}") for i in range(10)], ["id", "name"])
    right = spark.createDataFrame([(i, f"Zebra_{i}{i}{i}") for i in range(8)], ["id", "name"])
    maps = [FuzzyMapping("name", "name", threshold_score=95.0)]
    assert fuzzy_match_dfs(left, right, maps).count() == 0


def test_forced_ann_subset_of_exact(spark):
    # ANN path is lossy by design: subset of the exact result
    # (reference tests/test_pl_fuzzy_frame_match.py:132-133)
    left = _df(spark, LEFT)
    right = _df(spark, RIGHT)
    maps = [FuzzyMapping("company_name", "organization", fuzzy_type="jaro_winkler", threshold_score=80.0)]
    exact = {
        (r["id"], r["id_right"])
        for r in fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=False).collect()
    }
    approx = {
        (r["id"], r["id_right"])
        for r in fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=True).collect()
    }
    assert approx <= exact
    assert len(exact) > 0


def test_reference_compat_entry_points(spark):
    """The reference's full exported surface works unchanged
    (reference __init__.py:5-16): with_context + temp-dir context
    manager + long-form kwargs + positional logger."""
    import logging
    from pl_fuzzy_frame_match_spark import (
        FuzzyMapping,
        fuzzy_match_dfs,
        fuzzy_match_dfs_with_context,
        fuzzy_match_temp_dir,
    )

    left = spark.createDataFrame(
        [("apple inc",), ("globex corp",)], ["company_name"]
    )
    right = spark.createDataFrame(
        [("apple incorporated",), ("initech llc",)], ["organization"]
    )
    maps = [FuzzyMapping("company_name", "organization", threshold_score=60.0)]
    base = fuzzy_match_dfs(left, right, maps).collect()

    with fuzzy_match_temp_dir() as td:
        lazy = fuzzy_match_dfs_with_context(
            left, right, maps, logging.getLogger(__name__), td,
            use_appr_nearest_neighbor_for_new_matches=False,
            top_n_for_new_matches=500,
        )
        assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, base))

    forced = fuzzy_match_dfs(
        left, right, maps,
        use_appr_nearest_neighbor_for_new_matches=False,
        top_n_for_new_matches=100,
    )
    assert sorted(map(tuple, forced.collect())) == sorted(map(tuple, base))


def test_blocked_sketch_scan_equals_unblocked(spark, monkeypatch):
    """Hash-splitting the right side into broadcast blocks and merging
    per-block top-N must reproduce the unblocked scan exactly (every
    global top-N candidate is in its own block's top-N; ties resolve
    by the same (hamming, right key) order)."""
    from pyspark.sql import functions as F
    import pl_fuzzy_frame_match_spark.operators.candidates as cand

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    left_keys = (
        cust.select(F.col("c_name").alias("lk")).distinct()
        .withColumn("__left_index", F.monotonically_increasing_id())
        .groupBy("lk").agg(F.collect_list("__left_index").alias("__left_index"))
    )
    right_keys = (
        cust.select(F.col("c_name").alias("rk")).distinct()
        .withColumn("__right_index", F.monotonically_increasing_id())
        .groupBy("rk").agg(F.collect_list("__right_index").alias("__right_index"))
    )
    n = cust.select("c_name").distinct().count()

    def pairs(limit):
        monkeypatch.setattr(cand, "BROADCAST_KEY_LIMIT", limit)
        out = cand.approx_candidates(
            left_keys, right_keys, "lk", "rk",
            top_n=7, n_left_keys=n, n_right_keys=n,
        )
        return {(r["lk"], r["rk"]) for r in out.collect()}

    unblocked = pairs(2_000_000)
    blocked = pairs(40)  # forces ~5 blocks at sf0.001 (150 keys)
    assert blocked == unblocked and len(unblocked) > 0


def test_ann_with_all_empty_right_keys(spark, monkeypatch):
    """A right frame whose keys are all empty strings passes the O7
    empty-frame early-exit but must yield an empty (not crashing)
    ANN result — on BOTH the catalyst top-N tier (default at this
    volume) and the sketch-scan tier (forced)."""
    from pl_fuzzy_frame_match_spark.operators import candidates as cand

    left = spark.createDataFrame([("alpha",), ("beta",)], ["a"])
    right = spark.createDataFrame([("",), ("",)], ["b"])
    maps = [FuzzyMapping("a", "b", threshold_score=50.0)]
    out = fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=True)
    assert out.count() == 0
    monkeypatch.setattr(cand, "ANN_CATALYST_CAP", -1.0)
    out = fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=True)
    assert out.count() == 0


def test_multi_mapping_with_forced_ann_first_round(spark):
    """Conjunction semantics must hold when round 1 runs the ANN path
    and with a pandas-UDF metric (jaro_winkler) scoring the slim
    candidate pairs."""
    left = spark.createDataFrame(
        [(1, "apple inc", "NY"), (2, "globex corp", "CA"), (3, "umbrella co", "CA")],
        ["lid", "company", "state"],
    )
    right = spark.createDataFrame(
        [(10, "apple incorporated", "NY"), (11, "globex corporation", "TX")],
        ["rid", "org", "st"],
    )
    maps = [
        FuzzyMapping("company", "org", threshold_score=70.0, fuzzy_type="jaro_winkler"),
        FuzzyMapping("state", "st", threshold_score=100.0),
    ]
    exact = {(r["lid"], r["rid"]) for r in fuzzy_match_dfs(
        left, right, maps, use_appr_nearest_neighbor=False).collect()}
    approx = {(r["lid"], r["rid"]) for r in fuzzy_match_dfs(
        left, right, maps, use_appr_nearest_neighbor=True).collect()}
    assert exact == {(1, 10)}
    assert approx <= exact  # ANN lossy-by-design, conjunction intact


def test_sql_registered_fuzzy_sim(spark):
    from pl_fuzzy_frame_match_spark.functions.kernels import register_sql_functions

    register_sql_functions(spark)
    spark.createDataFrame(
        [("kitten", "sitting"), ("apple inc.", "apple incorporated")], ["a", "b"]
    ).createOrReplaceTempView("pairs_t")
    rows = spark.sql(
        "SELECT a, b, fuzzy_sim('levenshtein', a, b) AS lev,"
        "       fuzzy_sim('jaro_winkler', a, b) AS jw"
        " FROM pairs_t ORDER BY a"
    ).collect()
    assert rows[1]["lev"] == pytest.approx(1.0 - 3.0 / 7.0, abs=1e-9)
    assert rows[0]["jw"] == pytest.approx(0.88, abs=0.01)  # reference golden
    # null-safe and unknown-metric-safe
    one = spark.sql("SELECT fuzzy_sim('nope', 'a', 'b') AS x").first()
    assert one["x"] is None


@pytest.mark.parametrize(
    "metric", ["levenshtein", "jaro_winkler", "indel", "damerau_levenshtein"]
)
def test_fused_rescoring_matches_jvm_scoring(spark, monkeypatch, metric):
    """The in-kernel fused rescoring (native C metric kernels inside
    the sketch scan) must produce exactly the rows + scores of the
    unfused shape (candidates out, Spark-side scoring, filter) for
    every metric branch of the C scanner."""
    from pl_fuzzy_frame_match_spark.functions import native_kernels as natk
    from pl_fuzzy_frame_match_spark.models import FuzzyMapping
    from pl_fuzzy_frame_match_spark.operators.matcher import fuzzy_match_dfs

    if not natk.native_available():
        pytest.skip("no C toolchain")
    # pin the SKETCH tier: at this volume the ANN path would otherwise
    # plan as the catalyst top-N tier and never touch the C scanner
    from pl_fuzzy_frame_match_spark.operators import candidates as cand

    monkeypatch.setattr(cand, "ANN_CATALYST_CAP", -1.0)
    import random

    rng = random.Random(23)
    names = [f"Customer#{i:09d} {j}" for i in range(60) for j in range(3)]

    def typo(s):
        i = rng.randrange(len(s))
        return s[:i] + rng.choice("0123456789") + s[i + 1:]

    left = spark.createDataFrame(
        [(i, typo(n)) for i, n in enumerate(names)], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names[:90])], ["rid", "rname"]
    )
    maps = [
        FuzzyMapping(
            "lname", "rname", threshold_score=80.0, fuzzy_type=metric
        )
    ]
    score_col = f"lname_vs_rname_{metric}"

    def rows(df):
        return sorted(
            (r["lid"], r["rid"], round(r[score_col], 9))
            for r in df.collect()
        )

    fused = rows(
        fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=True)
    )
    assert fused  # fixture must match something
    # disable the native tier -> unfused JVM-scored shape
    monkeypatch.setattr(natk, "native_available", lambda: False)
    unfused = rows(
        fuzzy_match_dfs(left, right, maps, use_appr_nearest_neighbor=True)
    )
    assert fused == unfused
