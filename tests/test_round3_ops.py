"""Unit tests for the round-3 operators: duplicated-span stats,
asymmetric containment, logistic-regression quality scoring, cohort
retention. (The sf0.001 oracle replay in test_queries_oracle.py covers
the registered query forms; these pin the operator semantics on small
hand-built fixtures.)"""

from pyspark.sql import functions as F

from pl_fuzzy_frame_match_spark.functions.text import (
    duplicate_span_stats,
    logreg_quality,
    token_kgrams,
)
from pl_fuzzy_frame_match_spark.operators.dedup import containment_pairs


def test_token_kgrams_window_count(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c"), (3, "a b"), (4, None)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(token_kgrams(F.col("text"), 3)).alias("n")
        ).collect()
    }
    assert out[1] == 4  # 6 tokens -> 4 trigram windows
    assert out[2] == 1
    assert out[3] == 0  # shorter than k -> empty
    assert out[4] == 0  # null text falls into the empty-array branch


def test_duplicate_span_stats_cross_doc_only(spark):
    # doc 1 and 2 share the 5-gram "q w e r t"; doc 3 repeats its own
    # 5-gram twice but shares nothing cross-doc -> dup_frac 0.
    df = spark.createDataFrame(
        [
            (1, "q w e r t x y z"),
            (2, "a b q w e r t c"),
            (3, "m n o p s m n o p s"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in duplicate_span_stats(df, "text", "doc_id", k=5).collect()
    }
    assert rows[1]["n_windows"] == 4 and rows[1]["n_dup_windows"] == 1
    assert rows[2]["n_windows"] == 4 and rows[2]["n_dup_windows"] == 1
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["dup_frac"] == 0.0


def test_containment_is_asymmetric(spark):
    # small doc fully contained in big doc: containment(small->big)=1,
    # containment(big->small) < 1 and below threshold.
    small = "alpha beta gamma delta"
    big = small + " one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", threshold=0.5, n=3
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # big in small is far below 0.5


def test_containment_threshold_integer_exact(spark):
    # 2 shared trigrams of 4 -> containment exactly 0.5: the integer
    # comparison must admit the boundary pair.
    a = "a b c d e f"  # trigrams: abc bcd cde def (4)
    b = "a b c d x y z"  # shares abc bcd (2 of a's 4)... cde? no (d x)
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", threshold=0.5, n=3
        ).collect()
    }
    assert out[(1, 2)] == 0.5


def test_logreg_quality_monotone_in_stopwords(spark):
    # more stopwords (positive weight) -> higher keep-probability,
    # holding length roughly fixed.
    low = "zzz qqq vvv kkk mmm nnn ppp rrr sss ttt"
    high = "the a and of to in is it the a"
    df = spark.createDataFrame([(1, low), (2, high)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in logreg_quality(df, "text", "doc_id").collect()
    }
    assert 0.0 < rows[1]["quality_prob"] < rows[2]["quality_prob"] < 1.0
    assert rows[1]["keep"] in (True, False)


def test_logreg_quality_drops_empty(spark):
    df = spark.createDataFrame(
        [(1, "real text here"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    ids = [r["doc_id"] for r in logreg_quality(df, "text", "doc_id").collect()]
    assert ids == [1]


def test_events_retention_week_zero_covers_all_users(spark):
    from pl_fuzzy_frame_match_spark.queries import queries

    from .conftest import SF_DIR

    out = queries()["events_retention"](spark, SF_DIR).collect()
    week0 = sum(r["n_users"] for r in out if r["week_offset"] == 0)
    import duckdb

    n_users = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_DIR}/events.parquet') WHERE user_id IS NOT NULL"
    ).fetchone()[0]
    # every user appears in their own cohort at offset 0
    assert week0 == n_users
    assert all(r["week_offset"] >= 0 for r in out)


def test_pq_topk_recall_vs_bruteforce(spark):
    import numpy as np
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    for i in range(200):
        v = base[i % 40] + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            probes, emb, "embedding", "vec_id", k=3
        ).collect()
    }
    approx_rows = pq_topk(
        probes, emb, "embedding", "vec_id", k=3, m=4, refine=8,
        train_size=200,
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall too low: {recall}"
    # re-ranked scores are EXACT cosines: every overlapping pair agrees
    # with the brute-force score to 1e-6
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in brute_force_topk(
            probes, emb, "embedding", "vec_id", k=3
        ).collect()
    }
    for r in approx_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert abs(r["cosine_sim"] - round(bf[key], 6)) <= 1e-6


def test_pq_topk_deterministic(spark):
    import numpy as np
    from pl_fuzzy_frame_match_spark.operators.similarity import pq_topk

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(100)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = emb.filter(F.col("vec_id") < 10)
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in pq_topk(probes, emb, "embedding", "vec_id", k=3, m=4).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in pq_topk(probes, emb, "embedding", "vec_id", k=3, m=4).collect()
    )
    assert a == b and len(a) == 30


def test_remove_duplicate_spans_semantics(spark):
    import hashlib

    from pl_fuzzy_frame_match_spark.functions.text import (
        remove_duplicate_spans,
    )

    # docs 1/2 share the window "q w e r t" (doc1 positions 0-4 via
    # start 0; doc2 starts at 2): covered tokens are removed, the rest
    # survive in order.
    df = spark.createDataFrame(
        [(1, "q w e r t x y z"), (2, "a b q w e r t c"), (3, "solo doc here")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "text", "doc_id", k=5).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[1]["n_removed"] == 5
    assert rows[1]["cleaned_md5"] == md5("x y z")
    assert rows[2]["n_removed"] == 5
    assert rows[2]["cleaned_md5"] == md5("a b c")
    # doc 3 is shorter than k: nothing removable, text intact
    assert rows[3]["n_removed"] == 0
    assert rows[3]["cleaned_md5"] == md5("solo doc here")


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.plans.audit import (
        assert_max_shuffles,
        audit,
    )
    from pl_fuzzy_frame_match_spark.sources.sinks import write_bucketed

    left = spark.range(0, 10_000).withColumn(
        "v", F.col("id") % 7
    )
    right = spark.range(0, 10_000).withColumn(
        "w", F.col("id") % 11
    )
    write_bucketed(
        left, "b3_left", ["id"], 4, path=str(tmp_path / "bl"), sort_by=["id"]
    )
    write_bucketed(
        right, "b3_right", ["id"], 4, path=str(tmp_path / "br"), sort_by=["id"]
    )
    try:
        bl = spark.table("b3_left")
        br = spark.table("b3_right")
        # disable broadcast so the join would otherwise shuffle both sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bl.join(br, on="id").groupBy().agg(
                F.sum(F.col("v") + F.col("w")).alias("s")
            )
            # bucket co-location: the equi-join itself needs ZERO
            # exchanges; the only shuffle is the final 1-row aggregate
            assert_max_shuffles(joined, 1)
            a = audit(bl.join(br, on="id"))
            assert a.exchanges == 0, a.plan
            # and results are still correct
            n = bl.join(br, on="id").count()
            assert n == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b3_left")
        spark.sql("DROP TABLE IF EXISTS b3_right")


def test_duplicate_span_stats_matches_bruteforce_model(spark):
    """Randomized equivalence vs a driver-side python model: windows,
    cross-doc duplication flags and removal fingerprints all agree on
    corpora drawn from a tiny vocabulary (maximal collision rates)."""
    import hashlib
    import random

    from pl_fuzzy_frame_match_spark.functions.text import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    k = 3
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))

    # python model
    grams = {}  # gram -> set of docs
    per_doc = {}  # doc -> list of grams (positional)
    for i, text in docs:
        toks = text.split()
        gs = [
            " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
        ]
        per_doc[i] = (toks, gs)
        for g in gs:
            grams.setdefault(g, set()).add(i)
    expect_stats = {}
    expect_clean = {}
    for i, (toks, gs) in per_doc.items():
        if not gs:
            if toks or docs[i][1] == "":
                expect_clean[i] = (
                    len(toks),
                    0,
                    hashlib.md5(" ".join(toks).encode()).hexdigest(),
                )
            continue
        dup = [len(grams[g]) > 1 for g in gs]
        expect_stats[i] = (len(gs), sum(dup))
        covered = set()
        for j, d in enumerate(dup):
            if d:
                covered.update(range(j, j + k))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        expect_clean[i] = (
            len(toks),
            len(toks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got_stats = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicate_span_stats(df, "text", "doc_id", k=k).collect()
    }
    assert got_stats == expect_stats
    got_clean = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_md5"])
        for r in remove_duplicate_spans(df, "text", "doc_id", k=k).collect()
    }
    assert got_clean == expect_clean


def test_containment_matches_bruteforce_model(spark):
    import random

    from pl_fuzzy_frame_match_spark.operators.dedup import containment_pairs

    rng = random.Random(7)
    vocab = ["x", "y", "z", "w", "v"]
    n = 3
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10))))
        for i in range(40)
    ]

    def shingles(text):
        toks = text.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    expect = {}
    for i, ta in docs:
        sa = shingles(ta)
        for j, tb in docs:
            if i == j:
                continue
            inter = len(sa & shingles(tb))
            if inter * 2 >= len(sa):
                expect[(i, j)] = round(inter / len(sa), 6)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", threshold=0.5, n=n
        ).collect()
    }
    assert got == expect


def test_prefix_filter_containment_equals_exact(spark):
    import random

    from pl_fuzzy_frame_match_spark.operators.dedup import (
        containment_pairs,
        prefix_filter_containment_pairs,
    )

    rng = random.Random(11)
    vocab = ["p", "q", "r", "s", "t", "u"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for thr in (0.5, 0.6, 0.8, 1.0):
        exact = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(
                df, "text", "doc_id", threshold=thr, n=3
            ).collect()
        }
        pf = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in prefix_filter_containment_pairs(
                df, "text", "doc_id", threshold=thr, n=3
            ).collect()
        }
        assert pf == exact, f"threshold {thr}: {len(pf)} vs {len(exact)}"


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.functions.text import logreg_quality
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_quality_filter,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = {
        r["doc_id"]: (r["quality_prob"], r["keep"])
        for r in logreg_quality(docs, "text", "doc_id").collect()
    }
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    stream_df = stream_quality_filter(
        spark, src, spark.read.parquet(src).schema
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("q_filter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["quality_prob"], r["keep"])
        for r in spark.sql("SELECT * FROM q_filter").collect()
    }
    assert streamed == batch


def test_ivfpq_topk_recall_vs_bruteforce(spark):
    import numpy as np
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    rng = np.random.default_rng(13)
    base = rng.standard_normal((40, 16))
    rows = []
    for i in range(240):
        v = base[i % 40] + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = emb.filter(F.col("vec_id") < 20)
    exact = {}
    for r in brute_force_topk(probes, emb, "embedding", "vec_id", k=3).collect():
        exact[(r["query_id"], r["neighbor_id"])] = r["cosine_sim"]
    got_rows = ivfpq_topk(
        probes, emb, "embedding", "vec_id", k=3, n_clusters=8, n_probe=4,
        m=4, refine=8, train_size=240,
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    recall = len(set(exact) & got) / len(exact)
    # gate raised 0.7 -> 0.85 in round 10 (VERDICT r9 #7); this
    # clusterable corpus measures 1.0 — the hard-corpus gate lives in
    # test_round10_ops.test_ivfpq_recall_on_gate_corpus
    assert recall >= 0.85, f"IVF-PQ recall too low: {recall}"
    # survivors carry EXACT cosine scores
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(r["cosine_sim"] - round(exact[key], 6)) <= 1e-6
    # determinism
    again = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ivfpq_topk(
            probes, emb, "embedding", "vec_id", k=3, n_clusters=8,
            n_probe=4, m=4, refine=8, train_size=240,
        ).collect()
    }
    assert again == {
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in got_rows
    }


def test_round3_ops_null_and_empty_inputs(spark):
    from pl_fuzzy_frame_match_spark.functions.text import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        containment_pairs,
        prefix_filter_containment_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (None, "a b c d e f g"),
            (3, "a b c d e f g"),
            (4, "a b c d e f g"),
        ],
        ["doc_id", "text"],
    )
    # span ops: null text / null id rows are dropped, not crashed on
    stats = {r["doc_id"] for r in duplicate_span_stats(df, "text", "doc_id").collect()}
    assert stats == {3, 4}
    clean = {r["doc_id"]: r for r in remove_duplicate_spans(df, "text", "doc_id").collect()}
    assert set(clean) == {2, 3, 4}  # empty text kept (0 tokens), nulls dropped
    assert clean[3]["n_removed"] == clean[3]["n_tokens"] == 7
    # containment: identical docs contain each other fully; null/empty ignored
    for fn in (containment_pairs, prefix_filter_containment_pairs):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in fn(df, "text", "doc_id", threshold=0.5, n=3).collect()
        }
        assert pairs.get((3, 4)) == 1.0 and pairs.get((4, 3)) == 1.0
        assert all(a in (3, 4) and b in (3, 4) for a, b in pairs), pairs


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        click_purchase_interval_join,
        stream_interval_join,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_seconds"])
        for r in click_purchase_interval_join(events, 600).collect()
    }
    assert batch  # the corpus must actually exercise the join
    src = str(tmp_path / "events_ssj")
    events.write.parquet(src)
    out = stream_interval_join(
        spark, src, spark.read.parquet(src).schema, 600
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_seconds"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert streamed == batch


def test_round3_plan_guards(spark):
    """Shuffle budgets + no nested loops for the round-3 operators,
    via the public plan-audit API."""
    from pl_fuzzy_frame_match_spark.functions.text import (
        duplicate_span_stats,
        logreg_quality,
        remove_duplicate_spans,
    )
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        prefix_filter_containment_pairs,
    )
    from pl_fuzzy_frame_match_spark.plans.audit import (
        assert_max_shuffles,
        assert_no_nested_loop,
        audit,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # logreg scorer: map-only — ZERO exchanges
    a = audit(logreg_quality(docs, "text", "doc_id"))
    assert a.exchanges == 0, a.plan
    # span stats: gram agg + join-back + per-doc agg (<= 3 shuffles,
    # one may be the widen repartition), never a nested loop
    stats = duplicate_span_stats(docs, "text", "doc_id", k=5)
    assert_no_nested_loop(stats)
    assert_max_shuffles(stats, 4)
    removal = remove_duplicate_spans(docs, "text", "doc_id", k=5)
    assert_no_nested_loop(removal)
    assert_max_shuffles(removal, 6)
    # prefix-filtered containment: equi-joins/aggregations only
    pairs = prefix_filter_containment_pairs(docs, "text", "doc_id")
    assert_no_nested_loop(pairs)


def test_round3_vector_plan_guards(spark):
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )
    from pl_fuzzy_frame_match_spark.plans.audit import assert_no_nested_loop
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pyspark.sql import functions as F2

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F2.col("vec_id") < 10)
    for op in (pq_topk, ivfpq_topk):
        out = op(probes, emb, "embedding", "vec_id", k=3)
        assert_no_nested_loop(out)
        # and it actually produces ranked rows
        rows = out.collect()
        assert rows and all(r["rank"] >= 1 for r in rows)


def test_pq_index_roundtrip_matches_direct(spark, tmp_path):
    import numpy as np
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        build_pq_index,
        pq_topk,
        query_pq_index,
    )

    rng = np.random.default_rng(21)
    base = rng.standard_normal((30, 16))
    rows = [
        (i, [float(x) for x in base[i % 30] + 0.05 * rng.standard_normal(16)])
        for i in range(150)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = emb.filter(F.col("vec_id") < 15)
    path = str(tmp_path / "pq_index")
    build_pq_index(
        emb, "embedding", "vec_id", path, m=4, train_size=150
    )
    via_index = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in query_pq_index(
            probes, emb, "embedding", "vec_id", path, k=3, refine=8
        ).collect()
    )
    direct = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in pq_topk(
            probes, emb, "embedding", "vec_id", k=3, m=4, refine=8,
            train_size=150,
        ).collect()
    )
    assert via_index == direct and len(via_index) == 45


def test_incremental_near_dup_matches_batch_banding(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        build_minhash_index,
        incremental_near_dup_pairs,
        minhash_dedup_pairs,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "mh_index")
    build_minhash_index(seen, "text", "doc_id", path)
    inc = {
        (r["batch_id"], r["index_id"])
        for r in incremental_near_dup_pairs(
            batch, "text", "doc_id", path, jaccard_distance=0.8
        ).collect()
    }
    # reference: full-corpus banding, restricted to cross-split pairs
    full = minhash_dedup_pairs(
        docs, "text", "doc_id", jaccard_distance=0.8
    ).collect()
    expect = set()
    for r in full:
        l, rr = r["left_id"], r["right_id"]
        if l % 2 != rr % 2:  # one side in batch, one in index
            b, i = (l, rr) if l % 2 == 1 else (rr, l)
            expect.add((b, i))
    assert inc == expect
    assert inc  # the corpus has planted near-dups across the split


def test_pipeline_pretrain_corpus_plan(spark):
    from pl_fuzzy_frame_match_spark.plans.audit import (
        assert_max_shuffles,
        assert_no_nested_loop,
    )
    from pl_fuzzy_frame_match_spark.queries import queries

    df = queries()["pipeline_pretrain_corpus"](
        spark, "/root/testdata/sf0.001"
    )
    assert_no_nested_loop(df)
    # gram agg + join-back + starts agg + 2 doc joins + rollup, plus
    # the widen repartition: the composed chain stays a bounded-shuffle
    # single Catalyst plan (nothing materializes between operators)
    assert_max_shuffles(df, 8)


def test_stream_maintained_index_matches_batch_build(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        build_minhash_index,
        incremental_near_dup_pairs,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_maintain_minhash_index,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    # stream the seen split in multiple files -> multiple microbatches
    src = str(tmp_path / "docs_src")
    seen.repartition(4).write.parquet(src)
    streamed_idx = str(tmp_path / "mh_streamed")
    q = stream_maintain_minhash_index(
        spark, src, spark.read.parquet(src).schema, streamed_idx
    )
    q.awaitTermination(180)
    built_idx = str(tmp_path / "mh_built")
    build_minhash_index(seen, "text", "doc_id", built_idx)
    probe = lambda p: {
        (r["batch_id"], r["index_id"])
        for r in incremental_near_dup_pairs(
            batch, "text", "doc_id", p, jaccard_distance=0.8
        ).collect()
    }
    a, b = probe(streamed_idx), probe(built_idx)
    assert a == b and a


def test_pq_edge_cases(spark):
    import numpy as np
    import pytest as _pytest

    from pl_fuzzy_frame_match_spark.operators.similarity import pq_topk

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(15)]) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = emb.filter(F.col("vec_id") < 5)
    # dim 15 not divisible by m=4 -> explicit error, not silent garbage
    with _pytest.raises(ValueError, match="not divisible"):
        pq_topk(probes, emb, "embedding", "vec_id", k=3, m=4)
    # zero vectors normalize to zero (cosine 0) without NaN poisoning
    rows16 = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    rows16.append((40, [0.0] * 16))
    emb16 = spark.createDataFrame(rows16, ["vec_id", "embedding"])
    out = pq_topk(
        emb16.filter(F.col("vec_id").isin(0, 40)), emb16,
        "embedding", "vec_id", k=3, m=4, train_size=41,
    ).collect()
    # zero-vector cosine is NULL (consistent with cosine_similarity's
    # contract: dropped by any > threshold), never NaN/Inf
    assert all(
        r["cosine_sim"] is None or np.isfinite(r["cosine_sim"]) for r in out
    )


def test_fuzzy_join_modes(spark):
    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    left = spark.createDataFrame(
        [(1, "spark"), (2, "flink"), (3, None), (4, "zzzzz")],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [(10, "sparc"), (11, "blink")], ["rid", "label"]
    )
    maps = [FuzzyMapping("name", "label", threshold_score=75.0)]
    inner = fuzzy_match_dfs(left, right, maps).collect()
    matched_lids = {r["lid"] for r in inner}
    assert matched_lids == {1, 2}

    lj = fuzzy_match_dfs(left, right, maps, how="left").collect()
    assert {r["lid"] for r in lj} == {1, 2, 3, 4}
    by_lid = {}
    for r in lj:
        by_lid.setdefault(r["lid"], []).append(r)
    # unmatched rows keep left payload, null right + null score
    for lid in (3, 4):
        (row,) = by_lid[lid]
        assert row["rid"] is None and row["label"] is None
        assert row["name_vs_label_levenshtein"] is None
    # matched rows carry the same scores as inner
    assert {
        (r["lid"], r["rid"], r["name_vs_label_levenshtein"]) for r in inner
    } <= {(r["lid"], r["rid"], r["name_vs_label_levenshtein"]) for r in lj}

    semi = fuzzy_match_dfs(left, right, maps, how="left_semi")
    assert sorted(r["lid"] for r in semi.collect()) == [1, 2]
    assert semi.columns == ["lid", "name"]
    anti = fuzzy_match_dfs(left, right, maps, how="left_anti")
    assert sorted(r["lid"] for r in anti.collect()) == [3, 4]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported how"):
        fuzzy_match_dfs(left, right, maps, how="full")


def test_fuzzy_join_modes_empty_right(spark):
    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    left = spark.createDataFrame([(1, "a"), (2, "b")], ["lid", "name"])
    right = spark.createDataFrame([], "rid long, label string")
    maps = [FuzzyMapping("name", "label", threshold_score=75.0)]
    assert fuzzy_match_dfs(left, right, maps).count() == 0
    assert fuzzy_match_dfs(left, right, maps, how="left_semi").count() == 0
    assert sorted(
        r["lid"] for r in fuzzy_match_dfs(
            left, right, maps, how="left_anti"
        ).collect()
    ) == [1, 2]
    lj = fuzzy_match_dfs(left, right, maps, how="left")
    rows = lj.collect()
    assert sorted(r["lid"] for r in rows) == [1, 2]
    assert all(r["rid"] is None for r in rows)


def test_join_modes_partition_property(spark):
    """For any inputs: the left join partitions into (inner rows) +
    (anti rows with null right payload); semi/anti partition the left
    row set."""
    import random

    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]

    def noisy(w):
        if len(w) > 3 and rng.random() < 0.5:
            i = rng.randrange(len(w))
            return w[:i] + "x" + w[i + 1 :]
        return w

    left = spark.createDataFrame(
        [(i, noisy(rng.choice(words))) for i in range(30)]
        + [(97, None), (98, "qqqqqqqq")],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [(100 + j, rng.choice(words)) for j in range(10)], ["rid", "label"]
    )
    maps = [FuzzyMapping("name", "label", threshold_score=80.0)]
    inner = fuzzy_match_dfs(left, right, maps).collect()
    lj = fuzzy_match_dfs(left, right, maps, how="left").collect()
    semi = {r["lid"] for r in fuzzy_match_dfs(left, right, maps, how="left_semi").collect()}
    anti = {r["lid"] for r in fuzzy_match_dfs(left, right, maps, how="left_anti").collect()}
    all_lids = {r["lid"] for r in left.collect()}
    assert semi | anti == all_lids and not (semi & anti)
    assert {r["lid"] for r in inner} == semi
    # left = inner rows + one null-right row per anti lid
    assert len(lj) == len(inner) + len(anti)
    null_rows = [r for r in lj if r["rid"] is None]
    assert {r["lid"] for r in null_rows} == anti
    matched = sorted(
        (r["lid"], r["rid"], r["name_vs_label_levenshtein"])
        for r in lj if r["rid"] is not None
    )
    assert matched == sorted(
        (r["lid"], r["rid"], r["name_vs_label_levenshtein"]) for r in inner
    )


def test_png_dimensions_pure_catalyst(spark):
    import struct

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        png_dimensions,
    )
    from pl_fuzzy_frame_match_spark.plans.audit import audit

    def png_header(w, h):
        sig = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h)
        return sig + ihdr + bytes(5)  # bit depth etc. irrelevant here

    df = spark.createDataFrame(
        [
            (1, bytearray(png_header(640, 480))),
            (2, bytearray(png_header(1, 1))),
            (3, bytearray(b"GIF89a not a png")),
            (4, None),
        ],
        "id long, payload binary",
    )
    out = df.select("id", *png_dimensions(F.col("payload")))
    rows = {r["id"]: (r["png_width"], r["png_height"]) for r in out.collect()}
    assert rows[1] == (640, 480)
    assert rows[2] == (1, 1)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)
    # pure Catalyst: no Exchange, no Python stage
    a = audit(out)
    assert a.exchanges == 0, a.plan
    assert "Python" not in a.plan and "ArrowEval" not in a.plan


def test_jpeg_dimensions_marker_walk(spark):
    import struct

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        jpeg_dimensions,
    )

    def jpeg_bytes(w, h):
        soi = b"\xff\xd8"
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 11)
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x01" + bytes(3)
        )
        return soi + app0 + sof0 + b"\xff\xd9"

    df = spark.createDataFrame(
        [
            (1, bytearray(jpeg_bytes(800, 600))),
            (2, bytearray(jpeg_bytes(32, 16))),
            (3, bytearray(b"\x89PNG not jpeg")),
            (4, None),
        ],
        "id long, payload binary",
    )
    rows = {
        r["id"]: (r["jpeg_width"], r["jpeg_height"])
        for r in jpeg_dimensions(df).collect()
    }
    assert rows[1] == (800, 600)
    assert rows[2] == (32, 16)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)


def test_widen_narrow_scan_is_noop_on_wide_input(spark):
    from pl_fuzzy_frame_match_spark.functions.text import widen_narrow_scan

    narrow = spark.range(0, 1000).coalesce(1)
    wide = spark.range(0, 1000).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    assert (
        widen_narrow_scan(narrow).rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    # already-parallel input: returned UNCHANGED (no added shuffle)
    assert widen_narrow_scan(wide) is wide


def test_span_and_containment_handle_unicode(spark):
    """CJK / emoji / combining-char tokens flow through the gram
    hashing and shingling paths without mangling: identical docs still
    pair at containment 1.0 and duplicate spans are detected."""
    text = "数据 处理 引擎 🚀 très bien näive 数据 处理 引擎 🚀 extra"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "different words entirely here ok")],
        ["doc_id", "text"],
    )
    from pl_fuzzy_frame_match_spark.functions.text import (
        duplicate_span_stats,
    )
    from pl_fuzzy_frame_match_spark.operators.dedup import (
        prefix_filter_containment_pairs,
    )

    stats = {
        r["doc_id"]: r["dup_frac"]
        for r in duplicate_span_stats(df, "text", "doc_id", k=3).collect()
    }
    assert stats[1] == 1.0 and stats[2] == 1.0  # full cross-doc dup
    assert stats[3] == 0.0
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in prefix_filter_containment_pairs(
            df, "text", "doc_id", threshold=0.9, n=3
        ).collect()
    }
    assert pairs == {(1, 2): 1.0, (2, 1): 1.0}


def test_scratch_roundtrip_special_chars_and_many_columns(spark, tmp_path):
    """Parity with the reference's cache-layer edge tests
    (reference tests/test_utils.py:283-308): special characters
    (emoji, accents, embedded newlines/tabs) and 100-column frames
    survive the scratch persistence round trip byte-exact."""
    from pl_fuzzy_frame_match_spark.sources.sinks import cache_to_scratch

    special = spark.createDataFrame(
        [
            ("Hello 🌍", 1),
            ("Ñoño", 2),
            ("Café", 3),
            ("Test\nNewline", 4),
            ("Tab\tSeparated", 5),
        ],
        ["text", "numbers"],
    )
    back = cache_to_scratch(special, str(tmp_path / "scratch1"))
    assert sorted((r["text"], r["numbers"]) for r in back.collect()) == sorted(
        (r["text"], r["numbers"]) for r in special.collect()
    )

    wide = spark.range(5).select(
        *[(F.col("id") * 0 + i).alias(f"column_{i}") for i in range(100)]
    )
    back2 = cache_to_scratch(wide, str(tmp_path / "scratch2"))
    assert len(back2.columns) == 100
    assert back2.count() == 5


def test_fuzzy_match_special_character_keys(spark):
    """Fuzzy joins over unicode keys (accents, emoji) score and match
    like any other strings — parity with the reference's
    special-characters pipeline coverage."""
    from pl_fuzzy_frame_match_spark import FuzzyMapping, fuzzy_match_dfs

    left = spark.createDataFrame(
        [(1, "Café"), (2, "Ñoño"), (3, "Hello 🌍")], ["lid", "name"]
    )
    right = spark.createDataFrame(
        [(10, "Cafe"), (11, "Ñono"), (12, "Hello 🌎")], ["rid", "label"]
    )
    out = fuzzy_match_dfs(
        left, right, [FuzzyMapping("name", "label", threshold_score=70.0)]
    ).collect()
    got = {(r["lid"], r["rid"]) for r in out}
    assert {(1, 10), (2, 11), (3, 12)} <= got
    # score for Café~Cafe: 1 substitution over 4 chars = 0.75
    score = {
        (r["lid"], r["rid"]): r["name_vs_label_levenshtein"] for r in out
    }
    assert abs(score[(1, 10)] - 0.75) < 1e-9


def test_read_evolved_merges_schemas(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.sources.sinks import read_evolved

    v1 = spark.createDataFrame([(1, "a")], ["id", "text"])
    v2 = spark.createDataFrame(
        [(2, "b", "en", 0.9)], ["id", "text", "lang", "quality"]
    )
    p1, p2 = str(tmp_path / "batch1"), str(tmp_path / "batch2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)
    merged = read_evolved(spark, p1, p2)
    assert set(merged.columns) == {"id", "text", "lang", "quality"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["lang"] is None and rows[1]["quality"] is None
    assert rows[2]["lang"] == "en" and abs(rows[2]["quality"] - 0.9) < 1e-12


# Queries where a nested-loop/cartesian operator is the INTENDED plan:
# - fuzzy_join_* / kernel_*: broadcast cross join IS the exact
#   candidate generator (bounded by the planner's crossover)
# - text_bigram_pmi: crossJoin of two literal 1-row totals
# - events_active_users: day-range join against the broadcast
#   (one-row-per-calendar-day) frame
# - events_funnel: shrinking-frontier inequality joins over bounded
#   per-user frontiers
_NL_ALLOWED_PREFIXES = ("fuzzy_join_", "kernel_")
# - tpch_q11_shape / tpch_q22_shape: a scalar subquery (global sum /
#   global avg) attaches via broadcast of exactly ONE row — the BNLJ
#   there is O(n) with a single-row build side, not a quadratic join
_NL_ALLOWED = {
    "text_bigram_pmi", "events_active_users", "events_funnel",
    "tpch_q11_shape", "tpch_q22_shape",
    # 1-row broadcast scalar-total cross joins (LM normalizer /
    # mixture totals) — BNLJ over exactly one broadcast row, bounded
    "docs_lm_perplexity", "docs_source_mixture",
    "docs_temperature_resample",
    # same 1-row-total pattern: bigram-LM normalizer; the pipeline
    # embeds temperature_rates' two scalar totals
    "docs_lm_bigram_perplexity", "pipeline_training_data",
    # round-9 session B — same 1-row broadcast scalar patterns:
    # KN type-count normalizer; per-round L2 norm scalar; min/max
    # bounds row for the Morton scaling
    "docs_lm_kn_perplexity", "graph_eigencentrality",
    "layout_zorder_lineitem",
    # blocking_quality_report / entity_resolution_quality: the TRUTH
    # side is an intentional quadratic distinct-key cross (documented
    # evaluation harnesses — run on a sample at scale); the tiers and
    # the pair-counting metric itself are equi-joins/aggregates
    "blocking_quality_report", "entity_resolution_quality",
    # events_hll_distinct: per-key 1-row exact-distinct frame crossed
    # into the 1-row estimate frame (broadcast single-row BNLJ)
    "events_hll_distinct",
    # lineitem_exact_quantiles: 5-row broadcast position frame joined
    # on a cumulative-count RANGE condition — bounded BNLJ by design
    "lineitem_exact_quantiles",
    # BM25 / hybrid retrieval: 1-row broadcast (N, avgdl) stats frame
    # crossed into the per-term scores (single-row BNLJ)
    "docs_bm25_topk", "docs_hybrid_retrieval",
    # round 11 — the same bounded patterns:
    # lineitem_hist_quantiles: 1-row total crossed into the 5-row
    # position frame, then a RANGE join against the <= 1024-row
    # cumulative bin frame (both broadcast, bounded by n_bins)
    "lineitem_hist_quantiles",
    # events_orders_join_size_cm: the 1-row estimate frame crossed
    # into the 1-row exact-join-size frame (single-row BNLJ)
    "events_orders_join_size_cm",
    # docs_length_quantiles_by_lang: the per-group totals frame (one
    # row per language) crossed into the literal 3-row q frame; the
    # position join itself carries the group equality (hash join)
    "docs_length_quantiles_by_lang",
    # round 12 — the same bounded 1-row summary patterns:
    # events_hll_shard_rollup: the 1-row shard-count, mismatch-count
    # and two 1-row estimate frames crossed into one certification row
    "events_hll_shard_rollup",
    # events_cdc_incremental_merge: 1-row full-snapshot stats x 1-row
    # pre-split count x 1-row mismatch count (single-row BNLJs); the
    # merge itself and the certification diff are key equi-joins
    "events_cdc_incremental_merge",
    # events_session_concurrency: 1-row n_intervals x 1-row peak x
    # 1-row argmin-time frames; the peak lookup joins the swept frame
    # against the ONE-row max (broadcast single-row BNLJ)
    "events_session_concurrency",
}


def test_registry_wide_no_unintended_nested_loops(spark):
    """Sweep EVERY registered query's physical plan: a nested-loop or
    cartesian operator outside the documented allow-list fails — the
    guard that keeps future registry additions from silently planning
    quadratic joins."""
    from pl_fuzzy_frame_match_spark.plans.audit import physical_plan
    from pl_fuzzy_frame_match_spark.queries import queries

    offenders = []
    for name, fn in sorted(queries().items()):
        if name.startswith(_NL_ALLOWED_PREFIXES) or name in _NL_ALLOWED:
            continue
        plan = physical_plan(fn(spark, "/root/testdata/sf0.001"))
        if "NestedLoop" in plan or "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"unintended nested-loop plans: {offenders}"
