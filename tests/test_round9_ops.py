"""Round-9 additions: BPE production-vocab path (top_words cap +
incremental string-form distributed pair counts), graph round-count
API (ADVICE r8), the O10 avoided-volume promotion gate in
distinct-pair units, the DSIR importance-resampling family and its
streaming twin, Misra-Gries heavy hitters with exact-verification
rescore, and the BMP codec."""

from __future__ import annotations

import warnings

import pytest


# ---------------------------------------------------------------------------
# BPE: top_words cap (VERDICT r8 #2a)
# ---------------------------------------------------------------------------


def _skew_corpus(spark):
    # 'low'-family words dominate occurrences; tail words are hapax
    rows = [
        (1, "low low low low low low low low lower lower lowest"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
        (4, "qqq zzz jjj vvv kkk xxx"),  # hapax tail
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_bpe_top_words_equals_manual_cap(spark):
    """learn_bpe_merges(top_words=N) must equal learning over the
    manually-capped top-N (cnt desc, word asc) frequency table — on
    BOTH the driver and distributed paths."""
    from pl_fuzzy_frame_match_spark.operators.bpe import (
        _driver_bpe,
        learn_bpe_merges,
        word_frequencies,
    )
    from pyspark.sql import functions as F

    df = _skew_corpus(spark)
    wf = word_frequencies(df, "text")
    top5 = [
        (r["word"], r["cnt"])
        for r in wf.orderBy(F.desc("cnt"), F.asc("word")).limit(5).collect()
    ]
    expected = _driver_bpe(top5, 6)
    for kw in ({}, {"max_driver_words": 0}):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = [
                tuple(r)
                for r in learn_bpe_merges(
                    df, "text", 6, top_words=5, **kw
                ).collect()
            ]
        assert got == expected, kw


def test_bpe_top_words_coverage_warning(spark):
    """Capping below the distinct-word count must warn with the kept
    occurrence coverage; capping above it must not warn or change the
    result."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = _skew_corpus(spark)
    with pytest.warns(UserWarning, match="coverage"):
        learn_bpe_merges(df, "text", 2, top_words=3).collect()
    baseline = [tuple(r) for r in learn_bpe_merges(df, "text", 4).collect()]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        uncapped = [
            tuple(r)
            for r in learn_bpe_merges(
                df, "text", 4, top_words=10_000
            ).collect()
        ]
    assert uncapped == baseline


def test_bpe_top_words_enables_driver_path(spark):
    """top_words <= max_driver_words forces the fast driver loop even
    when the raw vocab exceeds the driver limit — the production-vocab
    escape hatch: identical results to the distributed rounds over the
    same capped table."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = _skew_corpus(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # raw vocab (14 words) > max_driver_words=6; top_words=6 caps
        # it back down to the driver loop
        drv = [
            tuple(r)
            for r in learn_bpe_merges(
                df, "text", 5, max_driver_words=6, top_words=6
            ).collect()
        ]
        dist = [
            tuple(r)
            for r in learn_bpe_merges(
                df, "text", 5, max_driver_words=0, top_words=6
            ).collect()
        ]
    assert drv == dist and len(drv) == 5


# ---------------------------------------------------------------------------
# BPE: incremental distributed pair counts (VERDICT r8 #2b)
# ---------------------------------------------------------------------------


def test_bpe_incremental_matches_driver_long_run(spark):
    """A 16-merge run on a corpus engineered so merges repeatedly
    invalidate earlier pair counts (shared prefixes/suffixes, ties,
    repeated-letter runs) — the incremental delta maintenance must
    track the driver recount exactly, including merge freqs."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [
            (1, "aaaa aaab aabb abab baba bbbb"),
            (2, "banana bandana bananas cabana"),
            (3, "mississippi missing mission emission"),
            (4, "lower lowest low slow slowest"),
        ],
        ["id", "text"],
    )
    drv = [tuple(r) for r in learn_bpe_merges(df, "text", 16).collect()]
    dist = [
        tuple(r)
        for r in learn_bpe_merges(df, "text", 16, max_driver_words=0).collect()
    ]
    assert drv == dist and len(drv) == 16


def test_bpe_string_form_primitives(spark):
    """The distributed loop's wrapped-string primitives: the contains
    pattern matches ADJACENCY only (not co-presence or reversed
    order), replace applies left-to-right non-overlapping ('aaa'
    under (a,a) -> [aa, a]), and _syms_of_s round-trips _wrap_word."""
    from pl_fuzzy_frame_match_spark.operators.bpe import (
        _US,
        _syms_of_s,
        _wrap_word,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "ab", True),
            (2, "axb", False),
            (3, "ba", False),
            (4, "a", False),
            (5, "xaby", True),
        ],
        ["id", "w"],
    )
    pat = _US + "a" + _US + _US + "b" + _US
    got = df.select(
        "id",
        "w",
        _wrap_word(F.col("w")).alias("s"),
    ).select(
        "id",
        "w",
        F.col("s").contains(pat).alias("hit"),
        _syms_of_s().alias("syms"),
    ).collect()
    for r in got:
        assert r["syms"] == list(r["w"]), r["id"]
        assert r["hit"] == (r["id"] in (1, 5)), r["id"]
    # non-overlapping replace: 'aaa' -> [aa, a]
    rep = _US + "aa" + _US
    pat_aa = _US + "a" + _US + _US + "a" + _US
    out = (
        spark.createDataFrame([("aaa",)], ["w"])
        .select(_wrap_word(F.col("w")).alias("s"))
        .select(
            F.replace(F.col("s"), F.lit(pat_aa), F.lit(rep)).alias("s")
        )
        .select(_syms_of_s().alias("syms"))
        .collect()
    )
    assert out[0]["syms"] == ["aa", "a"]


# ---------------------------------------------------------------------------
# O10 promotion: shrink test in distinct-pair units (ADVICE r8)
# ---------------------------------------------------------------------------


def test_promote_fires_with_duplicated_names():
    """Heavily duplicated names (rows >> distinct): the row-based
    survivor estimate (2e9 rows / 25 keys = 8e7) dwarfed the
    distinct-pair fuzzy volume (2e7) and suppressed promotion under
    the old mixed-unit gate; in distinct units the survivors (8e5)
    are a 25x shrink and promotion correctly fires."""
    from pl_fuzzy_frame_match_spark.models import FuzzyMapping
    from pl_fuzzy_frame_match_spark.plans.planner import (
        promote_exact_mappings,
    )

    fz = FuzzyMapping("name", "name_r", threshold_score=65.0)
    ex = FuzzyMapping("nk", "nk_r", threshold_score=100.0)
    out = promote_exact_mappings(
        [fz, ex],
        {"name": 20_000, "nk": 25},
        {"name_r": 1_000, "nk_r": 25},
        40_000,
        50_000,
    )
    assert [m.left_col for m in out] == ["nk", "name"]
    # row-unit materialization cap still guards the checkpoint: same
    # shape but a huge row cartesian (4e12 / 25 = 1.6e11 rows > 1e8)
    out = promote_exact_mappings(
        [fz, ex],
        {"name": 20_000, "nk": 25},
        {"name_r": 1_000, "nk_r": 25},
        4_000_000,
        1_000_000,
    )
    assert [m.left_col for m in out] == ["name", "nk"]
    # avoided-volume floor (round 9): a 2-distinct key on a 1.2e7
    # distinct-pair volume avoids only 6e6 pairs — under the measured
    # 1e7 break-even, so promotion correctly stays off even though
    # the old relative-shrink test (survivors == half) would fire
    out = promote_exact_mappings(
        [fz, ex],
        {"name": 12_000, "nk": 2},
        {"name_r": 1_000, "nk_r": 2},
        12_000,
        1_000,
    )
    assert [m.left_col for m in out] == ["name", "nk"]


# ---------------------------------------------------------------------------
# Graph: round-count without the racy module global (ADVICE r8)
# ---------------------------------------------------------------------------


def test_graph_return_rounds(spark):
    """connected_components(return_rounds=True) returns (df, rounds)
    with rounds=0 on the driver path and >=1 on the distributed path,
    and the default call still returns a bare DataFrame."""
    from pl_fuzzy_frame_match_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["left_id", "right_id"]
    )
    bare = connected_components(edges)
    assert bare.columns == ["node", "component"]
    df, rounds = connected_components(edges, return_rounds=True)
    assert rounds == 0  # driver union-find under the edge limit
    df2, rounds2 = connected_components(
        edges, return_rounds=True, small_edge_limit=0
    )
    assert rounds2 >= 1
    a = {(r["node"], r["component"]) for r in df.collect()}
    b = {(r["node"], r["component"]) for r in df2.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# DSIR importance resampling (round 9, Xie et al. 2023)
# ---------------------------------------------------------------------------


def _dsir_frames(spark):
    raw = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog ate the bone", "en"),
            (3, "der hund frisst den knochen", "de"),
            (4, "le chat dort sur le lit", "fr"),
            (5, "the cat and the dog", "en"),
            (6, "x", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    return raw, raw.where("lang = 'en'")


def test_dsir_model_shape_and_smoothing(spark):
    """The model covers the FULL bucket universe with finite
    log-ratios (add-one smoothing), and buckets seen only in the
    target get positive log-ratio while target-absent buckets get
    negative."""
    import math

    from pl_fuzzy_frame_match_spark.functions.dsir import (
        dsir_bucket_model,
    )

    raw, target = _dsir_frames(spark)
    model = dsir_bucket_model(raw, target, "text", buckets=64)
    rows = model.collect()
    assert len(rows) == 64
    assert all(math.isfinite(r["log_ratio"]) for r in rows)
    # unseen-anywhere buckets carry the pure smoothing ratio
    # ln((0+1)/(ttot+64)) - ln((0+1)/(rtot+64)) = ln((rtot+64)/(ttot+64)) > 0
    # since raw has more grams than target
    by_bucket = {r["bucket"]: r["log_ratio"] for r in rows}
    seen = set()
    from pl_fuzzy_frame_match_spark.functions.dsir import _doc_buckets

    for r in _doc_buckets(raw, "text", None, 64).collect():
        seen.add(r["bucket"])
    unseen = [b for b in range(64) if b not in seen]
    assert unseen, "tiny corpus should not fill 64 buckets"
    base = by_bucket[unseen[0]]
    assert all(abs(by_bucket[b] - base) < 1e-12 for b in unseen)


def test_dsir_weights_prefer_target_like_docs(spark):
    """English documents (target-like gram profile) must carry higher
    importance weights than the German/French ones, and a doc with
    null/empty text emits no weight row."""
    from pl_fuzzy_frame_match_spark.functions.dsir import (
        dsir_bucket_model,
        dsir_log_weights,
    )

    raw, target = _dsir_frames(spark)
    extra = raw.sparkSession.createDataFrame(
        [(7, None, "en"), (8, "   ", "en")], ["doc_id", "text", "lang"]
    )
    model = dsir_bucket_model(raw, target, "text", buckets=256)
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(
            raw.unionByName(extra), model, "text", "doc_id", buckets=256
        ).collect()
    }
    assert 7 not in w and 8 not in w
    en = [w[1], w[2], w[5]]
    other = [w[3], w[4]]
    assert min(en) > max(other), w


def test_dsir_select_is_deterministic_topk(spark):
    """Gumbel top-k: same result on repeated runs and under a
    different partitioning; k rows; keys non-increasing."""
    from pl_fuzzy_frame_match_spark.functions.dsir import (
        dsir_bucket_model,
        dsir_select,
    )

    raw, target = _dsir_frames(spark)
    model = dsir_bucket_model(raw, target, "text", buckets=256)
    a = dsir_select(raw, model, "text", "doc_id", k=3, buckets=256).collect()
    b = dsir_select(
        raw.repartition(7), model, "text", "doc_id", k=3, buckets=256
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [r["sel_key"] for r in a]
    assert keys == sorted(keys, reverse=True) and len(a) == 3


def test_stream_dsir_score_matches_batch(spark, tmp_path):
    """The streaming DSIR scorer (frozen model, stateless per-row
    pandas UDF) reproduces the batch explode+join+groupBy weights to
    6 decimals on the sf0.001 documents table."""
    from pl_fuzzy_frame_match_spark.functions.dsir import (
        dsir_bucket_model,
        dsir_log_weights,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_dsir_score,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        "text IS NOT NULL AND doc_id IS NOT NULL"
    )
    model = dsir_bucket_model(
        docs, docs.where("lang = 'en'"), "text"
    )
    batch = {
        r["doc_id"]: round(r["dsir_logw"], 6)
        for r in dsir_log_weights(
            docs, model, "text", "doc_id"
        ).collect()
    }
    src = str(tmp_path / "docs_dsir_stream")
    docs.write.parquet(src)
    q = (
        stream_dsir_score(
            spark, src, spark.read.parquet(src).schema, model
        )
        .writeStream.format("memory")
        .queryName("q_dsir")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: round(r["dsir_logw"], 6)
        for r in spark.sql("SELECT * FROM q_dsir").collect()
    }
    assert streamed == batch and len(batch) > 0


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters + exact-verification rescore (round 9)
# ---------------------------------------------------------------------------


def _zipf_items(spark, n_kinds=200, scale=40):
    # item i appears ~scale*n_kinds/(i+1) times: heavy head, long tail
    from pyspark.sql import functions as F

    return (
        spark.range(n_kinds)
        .select(
            F.explode(
                F.array_repeat(
                    F.concat(F.lit("w"), F.col("id").cast("string")),
                    (F.lit(scale * n_kinds) / (F.col("id") + 1)).cast(
                        "int"
                    ),
                )
            ).alias("g")
        )
        .repartition(8)
    )


def test_topk_sketch_equals_exact(spark):
    """Sketch path (ample capacity) and full-agg fallback path
    (capacity=1 breaks the certificate) both return the EXACT top-k,
    identical to a driver-side recount."""
    from collections import Counter

    from pl_fuzzy_frame_match_spark.operators.heavyhitters import (
        topk_frequent,
    )

    items = _zipf_items(spark)
    truth = Counter(r["g"] for r in items.collect())
    want = sorted(
        truth.items(), key=lambda kv: (-kv[1], kv[0])
    )[:16]
    for cap in (None, 1):
        got = [
            (r["g"], r["cnt"])
            for r in topk_frequent(items, 16, capacity=cap).collect()
        ]
        assert got == want, cap


def test_topk_sketch_fewer_items_than_k(spark):
    """Fewer distinct items than k: all items returned, exact, in
    (cnt desc, g asc) order."""
    from pl_fuzzy_frame_match_spark.operators.heavyhitters import (
        topk_frequent,
    )

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",), ("c",), (None,)],
        ["g"],
    )
    got = [
        (r["g"], r["cnt"]) for r in topk_frequent(df, 10).collect()
    ]
    assert got == [("c", 3), ("a", 2), ("b", 1)]


def test_mg_summary_certificate_bound(spark):
    """The per-partition certificate rows carry err_p, and for every
    item ABSENT from all summaries the true frequency is <= sum(err_p)
    — the bound topk_frequent's exactness proof rests on."""
    from collections import Counter

    from pl_fuzzy_frame_match_spark.operators.heavyhitters import (
        _mg_summaries,
    )

    items = _zipf_items(spark, n_kinds=100, scale=10).coalesce(4)
    truth = Counter(r["g"] for r in items.collect())
    summ = _mg_summaries(items, capacity=8).collect()
    e = sum(r["err"] for r in summ if r["g"] is None)
    cands = {r["g"] for r in summ if r["g"] is not None}
    assert e > 0 and cands
    for g, cnt in truth.items():
        if g not in cands:
            assert cnt <= e, (g, cnt, e)


# ---------------------------------------------------------------------------
# BMP codec (round 9)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_both_orientations():
    """encode -> decode is identity for bottom-up AND top-down DIBs,
    across widths covering every stride padding residue."""
    import numpy as np

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        bmp_decode_pixels,
        bmp_encode_rgb24,
    )

    rng = np.random.RandomState(7)
    for w in (3, 4, 5, 6):
        for td in (False, True):
            arr = rng.randint(0, 256, size=(3, w, 3), dtype=np.uint8)
            dec = bmp_decode_pixels(bmp_encode_rgb24(arr, topdown=td))
            assert dec is not None
            dw, dh, dtd, px = dec
            assert (dw, dh, dtd) == (w, 3, td)
            assert (px == arr).all(), (w, td)


def test_bmp_handcrafted_golden():
    """A hand-built 2x1 bottom-up BMP: one red pixel then one blue —
    byte-level golden, no codec on the assert side."""
    import struct

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        bmp_decode_pixels,
    )

    # 2 px wide, 1 row, stride 8 (6 data + 2 pad); pixels stored BGR:
    # red (0,0,255)B,G,R then blue (255,0,0)
    body = bytes([0, 0, 255, 255, 0, 0, 0, 0])
    bih = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8,
                      2835, 2835, 0, 0)
    bfh = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8, 0, 0, 54)
    dec = bmp_decode_pixels(bfh + bih + body)
    assert dec is not None
    w, h, td, px = dec
    assert (w, h, td) == (2, 1, False)
    assert px[0, 0].tolist() == [255, 0, 0]  # logical RGB: red
    assert px[0, 1].tolist() == [0, 0, 255]  # blue


def test_bmp_rejects_garbage():
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        bmp_decode_pixels,
    )

    assert bmp_decode_pixels(b"") is None
    assert bmp_decode_pixels(b"BM" + b"\x00" * 20) is None
    assert bmp_decode_pixels(b"PNG" + b"\x00" * 60) is None


def test_stream_ann_probe_matches_batch(spark, tmp_path):
    """Streaming exact ANN probe (frozen corpus, broadcast GEMM per
    microbatch) equals the batch brute-force top-k on the sf0.001
    embeddings table."""
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_ann_probe,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        "embedding IS NOT NULL AND vec_id IS NOT NULL"
    )
    probes = emb.limit(40)
    batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"],
                                     round(r["cosine_sim"], 9))
        for r in brute_force_topk(
            probes, emb, "embedding", "vec_id", k=3, corpus_blocks=1
        ).collect()
    }
    src = str(tmp_path / "ann_probes")
    probes.write.parquet(src)
    q = (
        stream_ann_probe(
            spark, src, spark.read.parquet(src).schema, emb,
            k=3,
        )
        .writeStream.format("memory")
        .queryName("q_ann")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"],
                                     round(r["cosine_sim"], 9))
        for r in spark.sql("SELECT * FROM q_ann").collect()
    }
    assert streamed == batch and len(batch) > 0


# ---------------------------------------------------------------------------
# Exact duplicated substrings via prefix-doubling ranks (round 9)
# ---------------------------------------------------------------------------


def test_global_dense_rank_matches_window(spark):
    """global_dense_rank == Window.orderBy dense_rank (0-based) on
    data with heavy ties, regardless of input partitioning."""
    import random

    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        global_dense_rank,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 30), rng.choice("abc")) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "k1", "k2"]).repartition(13)
    got = {
        r["id"]: r["rank"]
        for r in global_dense_rank(
            df, ["k1", "k2"], num_partitions=7
        ).collect()
    }
    want = {
        r["id"]: r["dr"] - 1
        for r in df.withColumn(
            "dr",
            F.dense_rank().over(Window.orderBy("k1", "k2")),
        ).collect()
    }
    assert got == want


def _brute_char_spans(texts: dict, L: int):
    from collections import Counter, defaultdict

    occ = Counter()
    docs_of = defaultdict(set)
    for d, t in texts.items():
        t = t.lower()
        for i in range(len(t) - L + 1):
            s = t[i : i + L]
            occ[s] += 1
            docs_of[s].add(d)
    out = {}
    for d, t in texts.items():
        t = t.lower()
        n = len(t) - L + 1
        if n <= 0:
            continue
        dup = cross = 0
        for i in range(n):
            s = t[i : i + L]
            if occ[s] > 1:
                dup += 1
                if len(docs_of[s]) > 1:
                    cross += 1
        out[d] = (n, dup, cross)
    return out


def test_duplicated_char_spans_matches_bruteforce(spark):
    """Exact length-L duplicated-substring stats equal a brute-force
    Python recount — within-doc repeats, cross-doc shares, overlap
    ('aaaa...'), case folding, and a doc shorter than L."""
    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        duplicated_char_spans,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "THE QUICK BROWN cat sleeps. the lazy dog again naps",
        3: "aaaaaaaaaaaaaaaaaaaaaa",
        4: "short",
        5: "unique zebra xylophone quartz vivid jumble",
    }
    for L in (6, 8, 16):
        want = _brute_char_spans(texts, L)
        df = spark.createDataFrame(
            list(texts.items()), ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (
                r["n_starts"],
                r["n_dup_starts"],
                r["n_cross_starts"],
            )
            for r in duplicated_char_spans(
                df, "text", "doc_id", span_len=L
            ).collect()
        }
        assert got == want, L


def test_dsir_flagged_fit_equals_two_frame_fit(spark):
    """Single-pass flagged fit == the general two-frame fit when the
    target is a predicate subset of the pool."""
    from pl_fuzzy_frame_match_spark.functions.dsir import (
        dsir_bucket_model,
        dsir_bucket_model_flagged,
    )
    from pyspark.sql import functions as F

    raw, target = _dsir_frames(spark)
    a = {
        r["bucket"]: r["log_ratio"]
        for r in dsir_bucket_model(raw, target, "text", buckets=128).collect()
    }
    b = {
        r["bucket"]: r["log_ratio"]
        for r in dsir_bucket_model_flagged(
            raw, F.col("lang") == "en", "text", buckets=128
        ).collect()
    }
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_bmp_dimensions_catalyst(spark):
    """Pure-Catalyst BMP header parser: bottom-up and top-down
    (negative biHeight) dimensions, null for non-BMP."""
    import struct

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        bmp_dimensions,
    )
    from pyspark.sql import functions as F

    def hdr(w, h):
        return struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0
        )

    rows = [
        (1, hdr(640, 480), 640, 480),
        (2, hdr(31, -77), 31, 77),
        (3, b"\x89PNG" + bytes(50), None, None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _, _ in rows],
        "id long, payload binary",
    )
    got = {
        r["id"]: (r["bmp_width"], r["bmp_height"])
        for r in df.select(
            "id", *bmp_dimensions(F.col("payload"))
        ).collect()
    }
    for i, _, w, h in rows:
        assert got[i] == (w, h), i


def test_remove_duplicated_char_spans_bruteforce(spark):
    """Char-span removal equals a brute-force Python recount: every
    char covered by a cross-doc duplicated length-L window deleted,
    others kept in order."""
    import hashlib

    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        remove_duplicated_char_spans,
    )

    texts = {
        1: "alpha beta SHARED SECRET PHRASE gamma",
        2: "delta shared secret phrase epsilon",
        3: "no duplication in this one at all",
        4: "aaaaaaaaaaaaaaaaaaaaaaaa",  # self-dup only: NOT removed
    }
    L = 12
    lowered = {d: t.lower() for d, t in texts.items()}
    from collections import defaultdict

    occ = defaultdict(set)
    for d, t in lowered.items():
        for i in range(len(t) - L + 1):
            occ[t[i : i + L]].add(d)
    want = {}
    for d, t in lowered.items():
        covered = set()
        for i in range(len(t) - L + 1):
            if len(occ[t[i : i + L]]) > 1:
                covered.update(range(i, i + L))
        kept = "".join(c for j, c in enumerate(t) if j not in covered)
        want[d] = (
            len(t),
            len(t) - len(kept),
            hashlib.md5(kept.encode()).hexdigest(),
        )
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_chars"], r["n_removed"], r["cleaned_md5"])
        for r in remove_duplicated_char_spans(
            df, "text", "doc_id", span_len=L
        ).collect()
    }
    assert got == want
    assert got[4][1] == 0  # within-doc repeats survive (cross-doc only)
    assert got[2][1] > 0  # the shared phrase was cut


def test_char_spans_sweep_equals_per_l(spark):
    """One-pass multi-L sweep == running duplicated_char_spans per L
    (levels shared, results identical)."""
    from pl_fuzzy_frame_match_spark.operators.suffixdedup import (
        duplicated_char_spans,
        duplicated_char_spans_sweep,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "THE QUICK BROWN cat sleeps. the lazy dog again naps here",
        3: "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        4: "completely unique content with zero overlap anywhere",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    Ls = (6, 8, 16, 24)
    swept = {
        (r["span_len"], r["doc_id"]): (
            r["n_starts"], r["n_dup_starts"], r["n_cross_starts"]
        )
        for r in duplicated_char_spans_sweep(
            df, "text", "doc_id", Ls
        ).collect()
    }
    for L in Ls:
        per = {
            (L, r["doc_id"]): (
                r["n_starts"], r["n_dup_starts"], r["n_cross_starts"]
            )
            for r in duplicated_char_spans(
                df, "text", "doc_id", span_len=L
            ).collect()
        }
        for k, v in per.items():
            assert swept[k] == v, k
    assert len(swept) == sum(
        1 for L in Ls for d, t in texts.items() if len(t) >= L
    )


# ---------------------------------------------------------------------------
# Phonetic blocking (round 9, session B): Knuth-variant Soundex
# ---------------------------------------------------------------------------


def _soundex_spec(s):
    """Driver-side reference implementation of the documented spec
    (functions/phonetic.py module docstring) — the same algorithm the
    Catalyst expression and the DuckDB oracle implement."""
    import re

    letters = re.sub(r"[^a-z]", "", (s or "").lower())
    if not letters:
        return None
    table = str.maketrans(
        "abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"
    )
    collapsed = re.sub(r"([0-9])\1+", r"\1", letters.translate(table))
    tail = collapsed[1:].replace("0", "")
    return (letters[0].upper() + tail[:3]).ljust(4, "0")


def test_soundex_goldens(spark):
    from pl_fuzzy_frame_match_spark.functions.phonetic import with_soundex

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "Ashcraft": "A226",
        "Ashcroft": "A226",
        "Tymczak": "T522",
        "Pfister": "P236",
        "Honeyman": "H555",
        "Hwang": "H520",   # h/w separate like vowels in this variant
        "Aeiou": "A000",
        "h": "H000",
        "O'Brien 23": "O165",
        "": None,
        "42!?": None,      # no letters at all
        None: None,
    }
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(cases)], ["i", "name"]
    )
    got = {
        r["name"]: r["sdx"]
        for r in with_soundex(df, "name", "sdx").collect()
    }
    for name, want in cases.items():
        assert got[name] == want, (name, got[name], want)
        assert _soundex_spec(name) == want, name


def test_soundex_catalyst_matches_spec_fuzz(spark):
    """500 random strings (letters, digits, punctuation, empty):
    the Catalyst expression equals the documented spec everywhere."""
    import random
    import string as _string

    from pl_fuzzy_frame_match_spark.functions.phonetic import with_soundex

    rng = random.Random(20260816)
    alphabet = _string.ascii_letters + " '-0123456789"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14))))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["i", "name"])
    for r in with_soundex(df, "name", "sdx").collect():
        assert r["sdx"] == _soundex_spec(r["name"]), r["name"]


def test_phonetic_blocked_pairs_semantics(spark):
    """Blocking recalls sound-alike pairs only; output is distinct
    ordered name pairs; threshold filters; rows with duplicate names
    do not duplicate pairs."""
    from pl_fuzzy_frame_match_spark.functions.phonetic import (
        phonetic_blocked_pairs,
        soundex_code,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "Robert"),
        (2, "Rupert"),
        (3, "Rupert"),   # duplicate row: must not duplicate the pair
        (4, "Ashcraft"),
        (5, "Ashcroft"),
        (6, "Honeyman"),  # blockless: no sound-alike partner
        (7, None),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = phonetic_blocked_pairs(df, "name", threshold=0.0).collect()
    pairs = {(r["left_name"], r["right_name"]) for r in out}
    assert pairs == {("Ashcraft", "Ashcroft"), ("Robert", "Rupert")}
    assert len(out) == len(pairs)  # exactly once each
    for r in out:
        assert r["left_name"] < r["right_name"]
        assert 0.0 <= r["similarity"] <= 1.0
    # a threshold above the Robert/Rupert score drops that pair
    sim = {
        (r["left_name"], r["right_name"]): r["similarity"] for r in out
    }
    cut = (sim[("Robert", "Rupert")] + sim[("Ashcraft", "Ashcroft")]) / 2
    lo, hi = sorted(sim.values())
    assert lo < cut < hi
    kept = phonetic_blocked_pairs(df, "name", threshold=cut).collect()
    assert len(kept) == 1
    # sanity: the blocked pair really shares a code
    coded = df.where(F.col("name").isNotNull()).select(
        "name", soundex_code(F.col("name")).alias("c")
    ).collect()
    codes = {r["name"]: r["c"] for r in coded}
    assert codes["Robert"] == codes["Rupert"]
    assert codes["Ashcraft"] == codes["Ashcroft"]
    assert codes["Honeyman"] not in {codes["Robert"], codes["Ashcraft"]}


# ---------------------------------------------------------------------------
# Graph analytics (round 9, session B): PageRank + triangle counting
# ---------------------------------------------------------------------------


def test_cooccurrence_edges_semantics(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import cooccurrence_edges

    rows = [
        (1, 10), (1, 20), (1, 30),   # triangle of items in basket 1
        (2, 10), (2, 20),            # repeat co-purchase: edge once
        (2, 20),                     # duplicate line: ignored
        (3, 40),                     # singleton basket: no edges
        (4, None), (None, 50),       # nulls rejected
    ]
    df = spark.createDataFrame(rows, ["g", "item"])
    got = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(df, "g", "item").collect()
    }
    assert got == {(10, 20), (10, 30), (20, 30)}


def test_pagerank_driver_replay(spark):
    """Distributed PageRank equals a driver-side replay of the same
    spec on a small asymmetric graph, and total mass stays 1."""
    from pl_fuzzy_frame_match_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 1)]  # star + chord + tail
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = len(adj)
    ranks = {x: 1.0 / n for x in adj}
    for _ in range(4):
        nxt = {x: (1 - 0.85) / n for x in adj}
        for u, nbrs in adj.items():
            for v in nbrs:
                nxt[v] += 0.85 * ranks[u] / len(nbrs)
        ranks = nxt
    assert set(got) == set(ranks)
    for x in ranks:
        assert abs(got[x] - ranks[x]) < 1e-9, (x, got[x], ranks[x])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub out-scores the leaves
    assert got[1] == max(got.values())


def test_pagerank_empty_and_zero_iterations(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "u long, v long")
    assert pagerank(empty, iterations=2).count() == 0
    df = spark.createDataFrame([(1, 2)], ["u", "v"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=0).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_triangle_stats_bruteforce(spark):
    """Degree-ordered enumeration equals brute force on a random
    graph; clustering coefficient formula checked per node."""
    import itertools
    import random

    from pl_fuzzy_frame_match_spark.operators.graph import triangle_stats

    rng = random.Random(99)
    nodes = list(range(18))
    edges = sorted(
        {
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if rng.random() < 0.3
        }
    )
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_stats(df).collect()
    }
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for x, nb in nbrs.items():
        t = sum(
            1 for a, b in itertools.combinations(sorted(nb), 2) if b in nbrs[a]
        )
        d = len(nb)
        cc = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[x] == (d, t, cc), (x, got[x], (d, t, cc))


def test_triangle_stats_triangle_free(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import triangle_stats

    # a 4-cycle: every node degree 2, zero triangles
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    for r in triangle_stats(df).collect():
        assert r["triangles"] == 0 and r["degree"] == 2 and r["clustering"] == 0.0


# ---------------------------------------------------------------------------
# Z-order layout (round 9, session B)
# ---------------------------------------------------------------------------


def test_interleave_bits_matches_python(spark):
    from pl_fuzzy_frame_match_spark.functions.zorder import interleave_bits
    from pyspark.sql import functions as F

    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    out = {
        r["i"]: r["z"]
        for r in df.select(
            "i", interleave_bits([F.col("x"), F.col("y")], 8).alias("z")
        ).collect()
    }

    def morton(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for i, x, y in rows:
        assert out[i] == morton(x, y), (i, x, y)


def test_interleave_bits_overflow_guard():
    import pytest as _pytest

    from pl_fuzzy_frame_match_spark.functions.zorder import interleave_bits
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError):
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 21)


def test_scale_to_bits_endpoints(spark):
    from pl_fuzzy_frame_match_spark.functions.zorder import zorder_key_frame

    df = spark.createDataFrame(
        [(0, 0), (100, 0), (50, 0)], ["x", "const"]
    )
    out = zorder_key_frame(df, ["x", "const"], bits=4).collect()
    zs = {r["x"]: r["zvalue"] for r in out}
    # const column contributes 0 everywhere; x spreads endpoints to 0/15
    def spread(v):  # bits of v land at even positions
        return sum(((v >> i) & 1) << (2 * i) for i in range(4))

    assert zs[0] == spread(0)
    assert zs[100] == spread(15)
    assert zs[50] == spread(8)  # round-half-up of 7.5


def test_zorder_write_prunes_secondary_dim(spark, tmp_path):
    """The honest layout claim: for a selective predicate on the
    SECONDARY column, a z-ordered layout lets parquet min/max stats
    skip most row groups while a primary-sorted layout skips none."""
    from pl_fuzzy_frame_match_spark.functions.zorder import (
        rowgroup_prune_stats,
        zorder_write,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    natural = str(tmp_path / "natural")
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(natural)
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(li, ["l_orderkey", "l_partkey"], zpath, n_files=16, bits=12)

    # central ~6% band of partkey only
    lo, hi = li.agg({"l_partkey": "min"}).first()[0], li.agg(
        {"l_partkey": "max"}
    ).first()[0]
    # off-center band so it does not straddle the partkey-MSB z-split
    mid = lo + (hi - lo) * 0.4
    band = (hi - lo) * 0.03
    box = {"l_partkey": (mid - band, mid + band)}
    nat_total, nat_hit = rowgroup_prune_stats(natural, box)
    z_total, z_hit = rowgroup_prune_stats(zpath, box)
    assert nat_total >= 16 and z_total >= 16
    assert nat_hit == nat_total          # primary sort: nothing skipped
    assert z_hit <= z_total // 2, (z_hit, z_total)  # z-order: >=50% skipped
    # and both layouts return identical data for the box query
    import pyspark.sql.functions as F

    a = (
        spark.read.parquet(natural)
        .where(F.col("l_partkey").between(mid - band, mid + band))
        .count()
    )
    b = (
        spark.read.parquet(zpath)
        .where(F.col("l_partkey").between(mid - band, mid + band))
        .count()
    )
    assert a == b and a > 0


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (round 9, session B)
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_matches_bruteforce_window(spark):
    """Pairs == all (i, j) with 1 <= rank_j - rank_i < w over the
    sorted distinct keys; duplicates collapse; nulls drop."""
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    names = ["delta", "alpha", "echo", "bravo", "charlie", "alpha", None]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], ["i", "name"])
    out = sorted_neighborhood_pairs(df, "name", window=3).collect()
    got = {(r["left_name"], r["right_name"]) for r in out}
    ordered = sorted({n for n in names if n})
    want = {
        (ordered[i], ordered[j])
        for i in range(len(ordered))
        for j in range(i + 1, min(i + 3, len(ordered)))
    }
    assert got == want
    assert len(out) == len(want)
    for r in out:
        assert r["left_name"] < r["right_name"]


def test_sorted_neighborhood_threshold_and_window_guard(spark):
    import pytest as _pytest

    from pl_fuzzy_frame_match_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "kitten"), (2, "kitte"), (3, "zebra")], ["i", "name"]
    )
    out = sorted_neighborhood_pairs(df, "name", window=2, threshold=0.9).collect()
    # kitte/kitten adjacent and similar; kitten/zebra adjacent but cut
    assert {(r["left_name"], r["right_name"]) for r in out} == {("kitte", "kitten")}
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", window=1)


# ---------------------------------------------------------------------------
# TIFF dimension sniffing (round 9, session B): pure-Catalyst IFD walk
# ---------------------------------------------------------------------------


def _tiff_bytes(le, w, h, wtype=3, htype=4, width_first=False):
    import struct

    e = "<" if le else ">"

    def ent(tag, typ, val):
        v = (
            struct.pack(e + "H", val) + bytes(2)
            if typ == 3
            else struct.pack(e + "I", val)
        )
        return struct.pack(e + "HHI", tag, typ, 1) + v

    entries = []
    if not width_first:
        entries += [ent(259, 3, 1), ent(258, 3, 8)]
    entries += [ent(256, wtype, w), ent(257, htype, h)]
    if width_first:
        entries += [ent(259, 3, 1), ent(258, 3, 8)]
    entries.append(ent(277, 3, 3))
    return (
        (b"II" if le else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + struct.pack(e + "H", len(entries))
        + b"".join(entries)
        + bytes(4)
    )


def test_tiff_dimensions_goldens(spark):
    from pl_fuzzy_frame_match_spark.operators.multimodal import tiff_dimensions
    from pyspark.sql import functions as F

    rows = [
        (0, _tiff_bytes(True, 800, 600)),            # LE, SHORT w / LONG h
        (1, _tiff_bytes(False, 1234, 77)),           # BE
        (2, _tiff_bytes(True, 70000, 5, wtype=4)),   # LONG width > 65535
        (3, _tiff_bytes(False, 9, 8, width_first=True)),  # entry order
        (4, b"II*\x00junk"),                         # truncated
        (5, b"GIF89a\x10\x00\x10\x00"),              # wrong signature
        (6, b"MM\x00\x2b" + bytes(16)),              # BigTIFF magic 43
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["tiff_width"], r["tiff_height"])
        for r in df.select("doc_id", *tiff_dimensions(F.col("payload"))).collect()
    }
    assert got[0] == (800, 600)
    assert got[1] == (1234, 77)
    assert got[2] == (70000, 5)
    assert got[3] == (9, 8)
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    assert got[6] == (None, None)


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM (round 9, session B)
# ---------------------------------------------------------------------------


def _kn_driver(docs, d=0.75):
    """Reference KN on the driver: returns per-doc cross-entropy and
    the model tables for property checks."""
    import math
    from collections import Counter, defaultdict

    bgs = {}
    for did, text in docs:
        w = text.lower().split()
        bgs[did] = list(zip(w, w[1:]))
    b2 = Counter(b for lst in bgs.values() for b in lst)
    cdot = defaultdict(float)
    n1p_fwd = defaultdict(int)
    n1p_bwd = defaultdict(int)
    for (w1, w2), c in b2.items():
        cdot[w1] += c
        n1p_fwd[w1] += 1
        n1p_bwd[w2] += 1
    tt = float(len(b2))

    def p(w1, w2):
        return max(b2.get((w1, w2), 0) - d, 0.0) / cdot[w1] + d * n1p_fwd[
            w1
        ] / cdot[w1] * (n1p_bwd[w2] / tt)

    ce = {
        did: -sum(math.log(p(w1, w2)) for w1, w2 in lst) / len(lst)
        for did, lst in bgs.items()
        if lst
    }
    return ce, p, cdot, n1p_bwd

def test_kn_bigram_matches_driver_replay(spark):
    from pl_fuzzy_frame_match_spark.functions.text import (
        kn_bigram_cross_entropy,
    )

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, "single"),               # <2 tokens: no row
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy_kn"])
        for r in kn_bigram_cross_entropy(df, "text", "doc_id").collect()
    }
    ce, _, _, _ = _kn_driver(docs)
    assert set(got) == set(ce)
    for did in ce:
        assert abs(got[did][1] - round(ce[did], 6)) <= 1e-6, did


def test_kn_probabilities_sum_to_one():
    """The KN distribution is proper: for every observed context w1,
    sum over the whole event vocabulary of P(w2|w1) == 1."""
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log the cat"),
        (3, "a cat and a dog and a mat"),
    ]
    _, p, cdot, n1p_bwd = _kn_driver(docs)
    vocab2 = list(n1p_bwd)  # every word observed as a bigram RHS
    for w1 in cdot:
        total = sum(p(w1, w2) for w2 in vocab2)
        assert abs(total - 1.0) < 1e-12, (w1, total)


def test_blocking_quality_hand_computed(spark):
    """Recall and reduction ratio hand-checked on a 5-name corpus."""
    from pl_fuzzy_frame_match_spark.operators.blocking import blocking_quality

    # truth at jw >= 0.9: (kitten, kittens) and (kitten, kitte)+(kitte, kittens)
    names = ["kitten", "kittens", "kitte", "zebra", "apple"]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], ["i", "n"])
    rows = {r["tier"]: r for r in blocking_quality(
        df, "n", threshold=0.9, window=2, prefix_len=4
    ).collect()}
    assert set(rows) == {"phonetic", "sorted_neighborhood", "prefix"}
    total_pairs = 5 * 4 // 2
    for r in rows.values():
        assert r["n_true"] == 3
        assert 0 <= r["n_found"] <= r["n_candidates"]
        assert abs(r["reduction_ratio"] - round(1 - r["n_candidates"] / total_pairs, 6)) < 1e-9
        assert abs(r["recall"] - round(r["n_found"] / 3, 6)) < 1e-9
    # prefix 'kitt' blocks all three kitten-variants: perfect recall
    p = rows["prefix"]
    assert p["n_candidates"] == 3 and p["n_found"] == 3 and p["recall"] == 1.0
    # soundex: K350/K352/K300 all DIFFER (trailing s changes the code)
    # -> the phonetic tier is empty but must still report a row
    ph = rows["phonetic"]
    assert ph["n_candidates"] == 0 and ph["n_found"] == 0
    assert ph["recall"] == 0.0 and ph["reduction_ratio"] == 1.0
    # window-2 sorted neighborhood: kitte<kitten<kittens adjacent pairs
    sn = rows["sorted_neighborhood"]
    assert sn["n_candidates"] == 4 and sn["n_found"] == 2


def test_weighted_pagerank_driver_replay(spark):
    """Weighted walk: rank flows proportionally to edge weight; the
    distributed result equals a driver replay, mass stays 1, and a
    heavier edge pulls more rank than a lighter one."""
    from pl_fuzzy_frame_match_spark.operators.graph import pagerank

    edges = [(1, 2, 10.0), (1, 3, 1.0), (2, 3, 1.0)]
    df = spark.createDataFrame(edges, ["u", "v", "w"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=5, weight_col="w").collect()
    }
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0) + w
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0) + w
    n = len(adj)
    ranks = {x: 1.0 / n for x in adj}
    for _ in range(5):
        nxt = {x: 0.15 / n for x in adj}
        for u, nbrs in adj.items():
            wsum = sum(nbrs.values())
            for v, w in nbrs.items():
                nxt[v] += 0.85 * ranks[u] * w / wsum
        ranks = nxt
    for x in ranks:
        assert abs(got[x] - ranks[x]) < 1e-9, (x, got[x], ranks[x])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # 1 and 2 bound by the heavy edge: both out-rank 3
    assert got[3] == min(got.values())
    # duplicate weighted rows sum their weights
    df2 = spark.createDataFrame(
        [(1, 2, 4.0), (1, 2, 6.0), (1, 3, 1.0), (2, 3, 1.0)],
        ["u", "v", "w"],
    )
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(df2, iterations=5, weight_col="w").collect()
    }
    for x in got:
        assert abs(got2[x] - got[x]) < 1e-12


def test_stream_phonetic_probe_matches_batch(spark, tmp_path):
    """Streaming phonetic probe (frozen Soundex index) == the same
    body run as a batch query; 20th streaming twin."""
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        phonetic_probe_batch,
        stream_phonetic_probe,
    )

    from pyspark.sql import functions as F

    part = load_table(spark, "/root/testdata/sf0.001", "part").select(
        F.col("p_name").alias("name")
    )
    corpus = part
    probes = part.limit(30)
    batch = {
        (r["query_name"], r["match_name"], r["similarity"])
        for r in phonetic_probe_batch(probes, corpus, "name").collect()
    }
    src = str(tmp_path / "phon_probes")
    probes.write.parquet(src)
    q = (
        stream_phonetic_probe(
            spark, src, spark.read.parquet(src).schema, corpus, "name"
        )
        .writeStream.format("memory")
        .queryName("q_phon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["query_name"], r["match_name"], r["similarity"])
        for r in spark.sql("SELECT * FROM q_phon").collect()
    }
    assert streamed == batch and len(batch) > 0


# ---------------------------------------------------------------------------
# Exact all-pairs TF-IDF cosine (round 9, session B)
# ---------------------------------------------------------------------------


def test_tfidf_cosine_pairs_matches_bruteforce(spark):
    """Prefix-filtered result == driver brute force over the same
    tf-idf spec, at several thresholds, on a random corpus."""
    import math
    import random
    from collections import Counter

    from pl_fuzzy_frame_match_spark.operators.similarity import (
        tfidf_cosine_pairs,
    )

    rng = random.Random(424242)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    tf = {i: Counter(t.split()) for i, t in docs}
    dft = Counter(t for c in tf.values() for t in c)
    n = len(tf)
    vecs = {}
    for i, c in tf.items():
        w = {t: cnt * math.log(n / dft[t]) for t, cnt in c.items()}
        nv = math.sqrt(sum(x * x for x in w.values()))
        if nv > 0:
            vecs[i] = {t: x / nv for t, x in w.items()}

    def cos(a, b):
        return sum(va * vecs[b].get(t, 0.0) for t, va in vecs[a].items())

    ids = sorted(vecs)
    for thr in (0.3, 0.6, 0.85):
        want = {
            (a, b): round(cos(a, b), 6)
            for ai, a in enumerate(ids)
            for b in ids[ai + 1 :]
            if cos(a, b) >= thr
        }
        # both arms of the vocab crossover must match brute force:
        # dense GEMM (default cap) and forced-sparse AllPairs (cap 0)
        for cap in (2048, 0):
            got = {
                (r["left_id"], r["right_id"]): r["cosine_sim"]
                for r in tfidf_cosine_pairs(
                    df, "text", "doc_id", thr, dense_vocab_cap=cap
                ).collect()
            }
            assert set(got) == set(want), (
                thr, cap,
                sorted(set(want) - set(got))[:5],
                sorted(set(got) - set(want))[:5],
            )
            for k in want:
                assert abs(got[k] - want[k]) <= 1e-6, (k, cap, got[k])


def test_tfidf_cosine_handles_degenerate_docs(spark):
    """Docs whose every token appears in every doc have zero norm and
    drop out; identical docs score 1.0."""
    from pl_fuzzy_frame_match_spark.operators.similarity import (
        tfidf_cosine_pairs,
    )

    docs = [
        (1, "common alpha beta"),
        (2, "common alpha beta"),
        (3, "common gamma delta"),
        (4, "common"),            # idf(common)=0 -> zero norm -> dropped
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["left_id"], r["right_id"]): r["cosine_sim"]
        for r in tfidf_cosine_pairs(df, "text", "doc_id", 0.99).collect()
    }
    assert got == {(1, 2): 1.0}


def test_deterministic_walks_validity_and_replay(spark):
    """Every hop follows an edge; every walk has length+1 steps; the
    draw replays the md5 spec exactly (driver-side check); reruns are
    identical."""
    import hashlib

    from pl_fuzzy_frame_match_spark.operators.graph import (
        deterministic_walks,
    )

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = deterministic_walks(df, length=3, seed="t").collect()
    walks = {}
    for r in out:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    assert set(walks) == set(adj)
    for s, path in walks.items():
        assert sorted(path) == [0, 1, 2, 3]
        assert path[0] == s
        x = s
        for t in range(3):
            nbrs = sorted(adj[x])
            h = int(
                hashlib.md5(f"{x}:{t}:t".encode()).hexdigest()[:8], 16
            )
            expect = nbrs[h % len(nbrs)]
            assert path[t + 1] == expect, (s, t, path)
            x = path[t + 1]
    again = deterministic_walks(df, length=3, seed="t").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # a different seed changes at least one hop
    other = deterministic_walks(df, length=3, seed="u").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_skipgram_pairs_hand_computed(spark):
    from pl_fuzzy_frame_match_spark.operators.graph import skipgram_pairs

    walks = [
        (1, 0, 10), (1, 1, 20), (1, 2, 30),
        (2, 0, 10), (2, 1, 20),
    ]
    df = spark.createDataFrame(walks, ["start", "step", "node"])
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(df, window=1).collect()
    }
    # walk1 adjacent pairs: 10-20, 20-30 (both directions); walk2: 10-20
    assert got == {
        (10, 20): 2, (20, 10): 2,
        (20, 30): 1, (30, 20): 1,
    }
    got2 = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(df, window=2).collect()
    }
    assert got2[(10, 30)] == 1 and got2[(30, 10)] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skipgram_pairs(df, window=0)


# ---------------------------------------------------------------------------
# AIFF codec (round 9, session B)
# ---------------------------------------------------------------------------


def test_aiff_float80_goldens():
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        _float80_decode,
        _float80_encode,
    )

    # the canonical CD-rate golden every AIFF reference cites
    assert _float80_encode(44100).hex() == "400eac440000000000000000"[:20]
    for rate in (1, 8000, 12000, 16000, 22050, 44100, 48000, 96000):
        assert _float80_decode(_float80_encode(rate)) == rate


def test_aiff_roundtrip_and_rejection():
    import numpy as np

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        aiff_decode_samples,
        aiff_encode_pcm16,
    )

    arr = ((np.arange(36).reshape(18, 2) * 137) % 4001 - 2000).astype("i2")
    rate, ch, n, dec = aiff_decode_samples(aiff_encode_pcm16(arr, 22050))
    assert (rate, ch, n) == (22050, 2, 18)
    assert (dec == arr).all()
    # odd-length chunk padding: insert a 3-byte ANNO chunk before COMM
    enc = aiff_encode_pcm16(arr, 22050)
    anno = b"ANNO" + (3).to_bytes(4, "big") + b"abc" + b"\x00"
    patched = enc[:12] + anno + enc[12:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "big") + patched[8:]
    rate2, ch2, n2, dec2 = aiff_decode_samples(patched)
    assert (rate2, ch2, n2) == (22050, 2, 18) and (dec2 == arr).all()
    assert aiff_decode_samples(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert aiff_decode_samples(b"FORM\x00\x00\x00\x04AIFF") is None
    assert aiff_decode_samples(None) is None
    # 8-bit COMM rejected
    bad = bytearray(enc)
    comm_at = enc.index(b"COMM") + 8
    bad[comm_at + 6 : comm_at + 8] = (8).to_bytes(2, "big")
    assert aiff_decode_samples(bytes(bad)) is None


def test_aiff_wav_paths_agree(spark):
    """The two container paths decode to identical statistics —
    interchangeable downstream."""
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        aiff_sample_stats,
        synthesize_aiff_corpus,
        synthesize_wav_corpus,
        wav_sample_stats,
    )
    from pyspark.sql import functions as F

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    a = {
        r["doc_id"]: tuple(r)[1:]
        for r in aiff_sample_stats(synthesize_aiff_corpus(docs)).collect()
    }
    w = {
        r["doc_id"]: tuple(r)[1:]
        for r in wav_sample_stats(synthesize_wav_corpus(docs)).collect()
    }
    assert a == w and len(a) == 40


def test_resolve_entities_transitive_closure(spark):
    """The match graph is not transitive: A~B and B~C pass the
    threshold while A~C does not — resolution must still put all
    three in one entity, canonicalized to the lexicographic min."""
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        resolve_entities,
    )

    names = ["kitten", "kittens", "kitte", "zebra", "zebras", "apple"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["i", "n"]
    )
    got = {
        r["name"]: r["canonical_name"]
        for r in resolve_entities(
            df, "n", threshold=0.93, window=2, prefix_len=4
        ).collect()
    }
    # jw: kitte~kitten .967, kitten~kittens .971, kitte~kittens .943,
    # zebra~zebras .967 — kitten family + zebra family merge; apple alone
    assert got["kitten"] == got["kittens"] == got["kitte"] == "kitte"
    assert got["zebra"] == got["zebras"] == "zebra"
    assert got["apple"] == "apple"
    assert len(got) == 6


def test_multiformat_roundtrip(spark, tmp_path):
    """lineitem sample round-trips csv/json/orc/parquet with schema
    and values intact (csv/json via the writer's schema)."""
    from pl_fuzzy_frame_match_spark.sources.io import read_table, write_table
    from pl_fuzzy_frame_match_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").limit(200)
    baseline = sorted(map(tuple, li.collect()))
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / fmt)
        write_table(li, path, fmt)
        back = read_table(spark, path, fmt, schema=li.schema)
        assert back.schema == li.schema, fmt
        assert sorted(map(tuple, back.collect())) == baseline, fmt
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_table(li, str(tmp_path / "x"), "avro")


def test_association_rules_hand_computed(spark):
    from pl_fuzzy_frame_match_spark.operators.rules import association_rules

    baskets = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "beer"),
        (4, "beer"),  # duplicate line collapses
    ]
    df = spark.createDataFrame(baskets, ["g", "item"])
    got = {
        (r["antecedent"], r["consequent"]): (
            r["pair_count"], r["support"], r["confidence"], r["lift"]
        )
        for r in association_rules(
            df, "g", "item", min_support_count=2, min_confidence_pct=60
        ).collect()
    }
    # butter->bread: pair 2, sup(butter)=2 -> conf 1.0, lift 1.0*4/3
    assert got[("butter", "bread")] == (2, 0.5, 1.0, round(4 / 3, 6))
    # bread->butter: conf 2/3 >= 60%
    assert got[("bread", "butter")] == (
        2, 0.5, round(2 / 3, 6), round(2 * 4 / (3 * 2), 6)
    )
    # milk->bread conf 1.0; bread->milk conf 2/3
    assert ("milk", "bread") in got and ("bread", "milk") in got
    # nothing else (beer has no pairs; pairs below support cut)
    assert len(got) == 4
    # integer confidence gate: at 70% bread->butter (66.7%) drops
    tighter = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(
            df, "g", "item", min_support_count=2, min_confidence_pct=70
        ).collect()
    }
    assert ("bread", "butter") not in tighter
    assert ("butter", "bread") in tighter


def test_eigenvector_centrality_properties(spark):
    """Unit norm each round; star center dominates; driver replay."""
    import math

    from pl_fuzzy_frame_match_spark.operators.graph import (
        eigenvector_centrality,
    )

    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (4, 5)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: r["score"]
        for r in eigenvector_centrality(df, iterations=4).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    x = {k: 1.0 / math.sqrt(len(adj)) for k in adj}
    for _ in range(4):
        y = {k: sum(x[j] for j in adj[k]) for k in adj}
        nrm = math.sqrt(sum(v * v for v in y.values()))
        x = {k: v / nrm for k, v in y.items()}
    for k in x:
        assert abs(got[k] - x[k]) < 1e-9, (k, got[k], x[k])
    assert abs(sum(v * v for v in got.values()) - 1.0) < 1e-9
    assert got[1] == max(got.values())  # hub of the star


def test_readability_hand_computed(spark):
    from pl_fuzzy_frame_match_spark.functions.text import readability_stats

    docs = [
        (1, "The cat sat. The dog ran! Did it?"),   # 8 words, 3 sentences
        (2, "strength"),                            # 1 word, 1 vowel group
        (3, "xyzzy pfft"),  # no aeiouy... wait y counts: xyzzy has y twice
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"], r["fk_grade"]
        )
        for r in readability_stats(df, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2, 3}
    # doc 1: words: the cat sat. the dog ran! did it? -> 8 words
    # syllables: the=1 cat=1 sat.=1 the=1 dog=1 ran!=1 did=1 it?=1 -> 8
    w, s, sy, g = got[1]
    assert (w, s, sy) == (8, 3, 8)
    assert abs(g - round(0.39 * 8 / 3 + 11.8 * 1 - 15.59, 6)) < 1e-9
    # strength: one vowel group 'e'
    assert got[2][:3] == (1, 1, 1)
    # xyzzy: groups 'y','y' -> 2; pfft: none -> floor 1
    assert got[3][:3] == (2, 1, 3)


def test_stream_entity_assign_matches_batch(spark, tmp_path):
    """Online entity assignment (frozen resolved index, stateful
    best-match per name) == the batch groupBy form; unmatched names
    become their own entity; 21st streaming twin."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.blocking import (
        resolve_entities,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        entity_assign_batch,
        stream_entity_assign,
    )

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    entities = resolve_entities(part, "p_name", threshold=0.88).cache()
    probes = (
        part.select(F.col("p_name").alias("name")).distinct().limit(25)
        .unionByName(
            spark.createDataFrame(
                [("utterly novel widgetron",)], ["name"]
            )
        )
    )
    batch = {
        (r["query_name"], r["entity"], r["match_sim"])
        for r in entity_assign_batch(probes, entities, "name").collect()
    }
    assert ("utterly novel widgetron", "utterly novel widgetron", None) in batch
    src = str(tmp_path / "ea_probes")
    probes.write.parquet(src)
    q = (
        stream_entity_assign(
            spark, src, spark.read.parquet(src).schema, entities, "name"
        )
        .writeStream.format("memory")
        .queryName("q_ea")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["query_name"], r["entity"], r["match_sim"])
        for r in spark.sql("SELECT * FROM q_ea").collect()
    }
    assert streamed == batch and len(batch) == 26


def test_label_propagation_two_cliques(spark):
    """Two cliques joined by one bridge edge: after 2 synchronous
    rounds each clique converges to its min id; driver replay pins
    the exact sync/tie semantics."""
    import itertools
    from collections import Counter

    from pl_fuzzy_frame_match_spark.operators.graph import label_propagation

    c1, c2 = [1, 2, 3, 4], [10, 11, 12, 13]
    edges = (
        list(itertools.combinations(c1, 2))
        + list(itertools.combinations(c2, 2))
        + [(4, 10)]
    )
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=2).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(2):
        nxt = {}
        for n in adj:
            cnt = Counter(lab[m] for m in adj[n])
            best = min(cnt, key=lambda k: (-cnt[k], k))
            nxt[n] = best
        lab = nxt
    assert got == lab
    # community structure: every clique-1 node labeled 1
    assert all(got[n] == 1 for n in c1)


def test_token_sort_similarity_permutation_invariant(spark):
    from pl_fuzzy_frame_match_spark.functions.phonetic import (
        token_sort_similarity,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "small ring", "ring small", 1.0),      # pure permutation
        (2, "small ring", "small ring", 1.0),
        (3, "Big  Blue Bolt", "bolt big blue", 1.0),  # case+spacing
    ]
    df = spark.createDataFrame(rows, ["i", "a", "b", "want"])
    out = df.select(
        "i", "want",
        F.round(token_sort_similarity(F.col("a"), F.col("b")), 6).alias("s"),
    ).collect()
    for r in out:
        assert r["s"] == r["want"], r["i"]
    # order-sensitive lev on the raw strings would NOT be 1.0
    from pl_fuzzy_frame_match_spark.functions.kernels import distance_column

    raw = df.where("i = 1").select(
        (F.lit(1.0) - distance_column(
            "levenshtein", F.lower(F.col("a")), F.lower(F.col("b"))
        )).alias("s")
    ).first()["s"]
    assert raw < 1.0


def test_negative_sampled_pairs_spec(spark):
    """Negatives follow the documented md5 draw exactly; positives
    keep label 1; negatives inherit multiplicity; negatives=0 is
    positives only."""
    import hashlib

    from pl_fuzzy_frame_match_spark.operators.graph import (
        negative_sampled_pairs,
    )

    pairs = spark.createDataFrame(
        [(10, 20, 3), (20, 30, 1)], ["center", "context", "cnt"]
    )
    nodes = spark.createDataFrame([(10,), (20,), (30,), (40,)], ["node"])
    out = negative_sampled_pairs(pairs, nodes, negatives=2, seed="n").collect()
    pos = [(r["center"], r["context"], r["cnt"]) for r in out if r["label"] == 1]
    neg = [(r["center"], r["context"], r["cnt"]) for r in out if r["label"] == 0]
    assert sorted(pos) == [(10, 20, 3), (20, 30, 1)]
    ordered = [10, 20, 30, 40]
    want_neg = []
    for c, p, cnt in [(10, 20, 3), (20, 30, 1)]:
        for j in range(2):
            h = int(hashlib.md5(f"{c}:{p}:{j}:n".encode()).hexdigest()[:8], 16)
            want_neg.append((c, ordered[h % 4], cnt))
    assert sorted(neg) == sorted(want_neg)
    only_pos = negative_sampled_pairs(pairs, nodes, negatives=0).collect()
    assert all(r["label"] == 1 for r in only_pos) and len(only_pos) == 2


def test_block_purging_drops_only_hot_blocks(spark):
    """max_block purges oversized blocks entirely; small blocks are
    untouched; default None keeps the uncapped behavior."""
    from pl_fuzzy_frame_match_spark.functions.phonetic import (
        phonetic_blocked_pairs,
    )
    from pl_fuzzy_frame_match_spark.operators.blocking import (
        prefix_block_pairs,
    )

    # 5 sound-alike names in one hot block + one small block of 2
    hot = [f"robert{i}" for i in range(5)]  # same soundex R163
    small = ["kitte", "kitta"]  # both K300
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(hot + small)], ["i", "n"]
    )
    full = {(r["left_name"], r["right_name"])
            for r in phonetic_blocked_pairs(df, "n").collect()}
    capped = {(r["left_name"], r["right_name"])
              for r in phonetic_blocked_pairs(df, "n", max_block=4).collect()}
    assert len(full) == 10 + 1          # C(5,2) hot + 1 small pair
    assert capped == {("kitta", "kitte")}
    # prefix tier: same purge semantics
    pfull = prefix_block_pairs(df, "n", prefix_len=6).collect()
    pcapped = prefix_block_pairs(df, "n", prefix_len=6, max_block=4).collect()
    assert len(pfull) == 10 and len(pcapped) == 0


def test_khop_reach_path_graph(spark):
    """On a path 1-2-3-4-5: hop-1 = degree, hop-2 adds the
    second-ring, self never counted."""
    from pl_fuzzy_frame_match_spark.operators.graph import khop_reach

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    got = {
        r["node"]: (r["n_hop1"], r["n_hop2"])
        for r in khop_reach(df, hops=2).collect()
    }
    assert got == {
        1: (1, 2), 2: (2, 3), 3: (2, 4), 4: (2, 3), 5: (1, 2)
    }


def test_token_set_similarity_subset_dominance(spark):
    from pl_fuzzy_frame_match_spark.functions.phonetic import (
        token_set_similarity,
        token_sort_similarity,
    )
    from pyspark.sql import functions as F

    rows = [
        # subset: token_set == 1.0, token_sort < 1.0
        (1, "big blue bolt", "blue bolt big heavy industrial extra"),
        # duplicate tokens collapse (set semantics)
        (2, "ring ring ring", "ring"),
        # disjoint: low score
        (3, "alpha beta", "gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    out = {
        r["i"]: (r["tset"], r["tsort"])
        for r in df.select(
            "i",
            F.round(token_set_similarity(F.col("a"), F.col("b")), 6).alias("tset"),
            F.round(token_sort_similarity(F.col("a"), F.col("b")), 6).alias("tsort"),
        ).collect()
    }
    assert out[1][0] == 1.0 and out[1][1] < 1.0
    assert out[2][0] == 1.0
    assert out[3][0] < 0.5
