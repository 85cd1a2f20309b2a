"""Round-12 optimization session 2: the fused path-array skip-gram
(walk_path_arrays + skipgram_pairs_from_paths replace the explode +
walk-id self-join in graph_sgns_training) and the narrow post-split
checkpoint in pipeline_training_data (temperature_rates count_col).
Every change here is a plan-shape optimization; these tests pin that
the VALUES are untouched."""

import pytest

from pl_fuzzy_frame_match_spark import queries as q


EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]


def _edge_df(spark):
    return spark.createDataFrame(EDGES, ["u", "v"])


def test_walk_path_arrays_matches_walks_small_route(spark):
    """walk_path_arrays exploded on position, nulls dropped, equals
    deterministic_walks — including a start outside the graph whose
    walk dies at step 0 (trailing nulls on the small route)."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.graph import (
        deterministic_walks,
        walk_path_arrays,
    )

    df = _edge_df(spark)
    starts = spark.createDataFrame([(1,), (4,), (99,)], ["start"])
    walks = deterministic_walks(df, length=3, seed="t", starts=starts)
    paths = walk_path_arrays(df, length=3, seed="t", starts=starts)
    exploded = paths.select(
        "start", F.posexplode("path").alias("step", "node")
    ).where(F.col("node").isNotNull())
    assert exploded.exceptAll(walks).count() == 0
    assert walks.exceptAll(exploded).count() == 0
    # the dead walk contributes exactly its start position
    p99 = paths.where(F.col("start") == 99).collect()[0]["path"]
    assert p99[0] == 99 and all(x is None for x in p99[1:])


def test_walk_path_arrays_large_route_equivalence(spark, monkeypatch):
    """Forcing the ranked-adjacency route (broadcast bound -> 0)
    yields the same path arrays as the broadcast chain."""
    from pl_fuzzy_frame_match_spark.operators import graph

    df = _edge_df(spark)
    small = {
        r["start"]: r["path"]
        for r in graph.walk_path_arrays(df, length=3, seed="t").collect()
    }
    monkeypatch.setattr(graph, "WALK_ADJ_BROADCAST_EDGES", 0)
    large = {
        r["start"]: r["path"]
        for r in graph.walk_path_arrays(df, length=3, seed="t").collect()
    }
    assert small == large


def test_skipgram_from_paths_matches_join_form(spark):
    """The in-array window-pair generator equals skipgram_pairs over
    the exploded walks, for window 1 and 2, including dead-walk
    nulls."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.graph import (
        skipgram_pairs,
        skipgram_pairs_from_paths,
    )

    paths = spark.createDataFrame(
        [
            (1, [10, 20, 30, 20, 40]),
            (2, [10, 20, 10, 20, 10]),
            (3, [7, 8, None, None, None]),
        ],
        "start long, path array<long>",
    )
    walks = paths.select(
        "start", F.posexplode("path").alias("step", "node")
    ).where(F.col("node").isNotNull())
    for window in (1, 2):
        fused = skipgram_pairs_from_paths(paths, window=window)
        ref = skipgram_pairs(walks, window=window)
        assert fused.exceptAll(ref).count() == 0
        assert ref.exceptAll(fused).count() == 0
    with pytest.raises(ValueError):
        skipgram_pairs_from_paths(paths, window=0)


def test_temperature_rates_count_col_equivalence(spark):
    """Summing a precomputed token_count column yields the identical
    rate table to tokenizing inside temperature_rates."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.functions.sampling import (
        temperature_rates,
    )
    from pl_fuzzy_frame_match_spark.functions.text import token_count

    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox"),
            (2, "en", "jumps over"),
            (3, "de", "der schnelle braune fuchs springt"),
            (4, "fr", "le renard"),
            (5, "fr", "saute par dessus le chien paresseux bien"),
        ],
        ["doc_id", "lang", "text"],
    )
    direct = temperature_rates(docs, "lang", "text")
    narrow = docs.select(
        "lang", token_count(F.col("text")).alias("__dt")
    )
    via_count = temperature_rates(
        narrow, "lang", "text", count_col="__dt"
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_count.collect())
    )


def test_sgns_query_matches_pre_fusion_form(spark):
    """graph_sgns_training (fused path-array form) returns exactly the
    rows the pre-fusion composition produced at sf0.001."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.graph import (
        cooccurrence_edges,
        deterministic_walks,
        negative_sampled_pairs,
        skipgram_pairs,
    )
    from pl_fuzzy_frame_match_spark.queries import load_table

    sf_dir = "/root/testdata/sf0.001"
    new = q.queries()["graph_sgns_training"](spark, sf_dir)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    walks = deterministic_walks(edges, length=4, seed="w").localCheckpoint(
        eager=True
    )
    pairs = skipgram_pairs(walks, window=2).localCheckpoint(eager=True)
    old = negative_sampled_pairs(
        pairs, walks.select("node"), negatives=2, seed="n"
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_pq_encode_and_dsir_grams_fan_out(spark):
    """The ivfpq-style fanned-out encode pass and the DSIR gram
    explode must not fuse into a 1-partition scan stage (the
    serial-stage class the round-12 fanouts remove): outputs carry
    >= 2x parallelism. pq_topk's flat path deliberately stays
    unfanned (its ADC scan pays per-task init; A/B in PLANS.md)."""
    import numpy as np

    from pl_fuzzy_frame_match_spark.functions.dsir import _doc_buckets
    from pl_fuzzy_frame_match_spark.operators.dedup import _fanout
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        _pq_encode_frame,
    )

    floor = spark.sparkContext.defaultParallelism * 2
    corpus = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 2.0, 3.0]) for i in range(64)],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    books = np.ones((2, 3, 2), dtype=np.float64)
    # the ivfpq call-site composition: fanout survives the encode
    enc = _pq_encode_frame(
        _fanout(corpus.select("vec_id", "embedding")),
        "embedding",
        "vec_id",
        books,
    )
    assert enc.rdd.getNumPartitions() >= floor
    # the flat pq path stays unfanned
    flat = _pq_encode_frame(corpus, "embedding", "vec_id", books)
    assert flat.rdd.getNumPartitions() == 1

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(64)],
        "doc_id long, text string",
    ).coalesce(1)
    gb = _doc_buckets(docs, "text", "doc_id", 64)
    assert gb.rdd.getNumPartitions() >= floor
