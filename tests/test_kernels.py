"""Kernel parity: pure-Python metrics vs DuckDB's SQL functions and the
reference's golden floats (reference tests/test_pl_fuzzy_frame_match.py:339-404,
tests/test_process.py:10-11,70-89)."""

import random

import duckdb
import pytest

from pl_fuzzy_frame_match_spark.functions import py_kernels as k
from pl_fuzzy_frame_match_spark.functions.kernels import distance_column
from pyspark.sql import functions as F

METRICS = ["levenshtein", "jaro", "jaro_winkler", "hamming", "damerau_levenshtein", "indel"]
THRESHOLDS = [0.3, 0.5, 0.7, 0.9]

PAIRS = [
    ("John", "Johny"),
    ("Edward", "Eduward"),
    ("Thompson", "Thomson"),
    ("apple inc.", "apple incorporated"),
    ("microsft", "microsoft corp"),
    ("gogle", "google llc"),
    ("tim cook", "timothy cook"),
    ("", ""),
    ("a", ""),
    ("same", "same"),
]


def test_reference_golden_floats():
    # pinned by reference tests/test_pl_fuzzy_frame_match.py:360-364
    assert k.jaro_winkler_sim("apple inc.", "apple incorporated") == pytest.approx(0.88, abs=1e-12)
    assert k.jaro_winkler_sim("microsft", "microsoft corp") == pytest.approx(0.9142857142857143, abs=1e-12)
    assert 1 - k.levenshtein_norm("tim cook", "timothy cook") == pytest.approx(0.6666666666666667, abs=1e-12)


def test_duckdb_parity_random():
    con = duckdb.connect()
    rng = random.Random(7)

    def rnd():
        return "".join(rng.choice("abcdef gh") for _ in range(rng.randint(1, 14)))

    for _ in range(300):
        a, b = rnd(), rnd()
        assert k.levenshtein_dist(a, b) == con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert k.damerau_levenshtein_dist(a, b) == con.sql("SELECT damerau_levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        if a != b:
            assert k.jaro_sim(a, b) == pytest.approx(
                con.sql("SELECT jaro_similarity(?, ?)", params=[a, b]).fetchone()[0], abs=1e-12
            )
            assert k.jaro_winkler_sim(a, b) == pytest.approx(
                con.sql("SELECT jaro_winkler_similarity(?, ?)", params=[a, b]).fetchone()[0], abs=1e-12
            )
        if len(a) == len(b):
            assert k.hamming_norm(a, b) == pytest.approx(
                con.sql("SELECT hamming(?, ?)/greatest(length(?),1)", params=[a, b, a]).fetchone()[0], abs=1e-12
            )


@pytest.mark.parametrize("metric", METRICS)
def test_normalized_range_and_threshold(metric):
    fn = k.NORMALIZED_DISTANCE[metric]
    for a, b in PAIRS:
        d = fn(a, b)
        assert 0.0 <= d <= 1.0, (metric, a, b, d)
        for th in THRESHOLDS:
            # threshold filter semantics: keep iff d <= th; just sanity
            assert (d <= th) == (not d > th)


def test_identical_strings_score_one():
    for metric in METRICS:
        assert k.NORMALIZED_DISTANCE[metric]("same", "same") == 0.0


def test_indel_known_values():
    # (l1+l2-2*lcs)/(l1+l2): "abc" vs "abd" -> lcs 2 -> 2/6
    assert k.indel_norm("abc", "abd") == pytest.approx(2 / 6)
    assert k.indel_norm("abc", "abc") == 0.0
    assert k.indel_norm("", "abc") == 1.0


@pytest.mark.parametrize("metric", METRICS)
def test_spark_distance_column_matches_python(spark, metric):
    df = spark.createDataFrame([(a, b) for a, b in PAIRS if a or b], ["a", "b"])
    rows = df.select(
        "a", "b", distance_column(metric, F.lower("a"), F.lower("b")).alias("d")
    ).collect()
    fn = k.NORMALIZED_DISTANCE[metric]
    for r in rows:
        assert r["d"] == pytest.approx(fn(r["a"].lower(), r["b"].lower()), abs=1e-12)
