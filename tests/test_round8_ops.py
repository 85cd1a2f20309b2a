"""Round-8 operators.

MJPEG AVI coverage (VERDICT r7 high/medium items): sample_frames
unpacks the widened 5-tuple scan and dispatches per-fourcc,
mjpeg_encode_frames round-trips RGB and grayscale through the
pure-Python JPEG codec, malformed chunks degrade to None instead of
killing the stage, the empty-input encode raises a clear error, and
the video-hash family works on compressed payloads.

Plus the round's post-verdict additions: the dense-corpus best-match
recall gate for the sketch ANN tier, and the BPE tokenizer family
(merge learning driver/distributed equivalence, the classic Sennrich
worked example, non-overlapping merge-fold semantics, encode
segmentation + monotone-compression properties, and the streaming
tokenizer twin)."""

from __future__ import annotations

import numpy as np
import pytest


def _flat_gray_frames(values, h=16, w=16):
    """Per-frame constant grayscale stacks: flat 8-aligned blocks are
    EXACT through the baseline JPEG codec (see
    test_jpeg_flat_even_blocks_exact), so roundtrips assert equality."""
    return np.stack(
        [np.full((h, w), v, dtype=np.uint8) for v in values]
    )


def test_mjpeg_roundtrip_grayscale_exact():
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        avi_decode_frames,
        mjpeg_encode_frames,
    )

    frames = _flat_gray_frames([30, 128, 220])
    payload = mjpeg_encode_frames(frames)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    w, h, n, dec = avi_decode_frames(payload)
    assert (w, h, n) == (16, 16, 3)
    # grayscale JPEG replicates to 3 channels; flat blocks are exact
    for f in range(3):
        for c in range(3):
            assert (dec[f, :, :, c] == frames[f]).all()


def test_mjpeg_roundtrip_rgb_psnr():
    import math

    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        avi_decode_frames,
        mjpeg_encode_frames,
    )

    y, x = np.ogrid[:24, :32]
    frames = np.stack(
        [
            np.stack(
                [
                    ((np.sin(y / 5.0 + k + f) + 1) * 110).astype(np.uint8)
                    * np.ones((1, 32), dtype=np.uint8)
                    for k in range(3)
                ],
                axis=2,
            )
            for f in range(4)
        ]
    )
    w, h, n, dec = avi_decode_frames(mjpeg_encode_frames(frames))
    assert (w, h, n) == (32, 24, 4)
    mse = float(((dec.astype(float) - frames.astype(float)) ** 2).mean())
    assert 10 * math.log10(255**2 / max(mse, 1e-9)) > 30
    # deterministic encode: same frames -> same container bytes
    assert mjpeg_encode_frames(frames) == mjpeg_encode_frames(frames)


def test_mjpeg_malformed_chunk_and_dim_mismatch_safe():
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        _avi_scan,
        _mjpeg_frame_at,
        avi_decode_frames,
        mjpeg_encode_frames,
    )

    payload = bytearray(mjpeg_encode_frames(_flat_gray_frames([60, 180])))
    scan = _avi_scan(bytes(payload))
    assert scan is not None
    w, h, _bpp, comp, frames = scan
    assert comp == b"MJPG" and len(frames) == 2

    # corrupt the first frame's JPEG SOI marker: that frame decodes to
    # None and the whole-payload decoder degrades to None, not a raise
    off0, _ln0 = frames[0]
    payload[off0] = 0x00
    corrupted = bytes(payload)
    assert _mjpeg_frame_at(corrupted, w, h, *frames[0]) is None
    assert avi_decode_frames(corrupted) is None

    # container header dims that disagree with the embedded JPEG -> None
    good = mjpeg_encode_frames(_flat_gray_frames([60]))
    gscan = _avi_scan(good)
    goff, gln = gscan[4][0]
    assert _mjpeg_frame_at(good, 8, 8, goff, gln) is None


def test_mjpeg_encode_empty_raises_clear_error():
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        mjpeg_encode_frames,
    )

    with pytest.raises(ValueError, match="at least one frame"):
        mjpeg_encode_frames(np.zeros((0, 8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="at least one frame"):
        mjpeg_encode_frames([])


def test_sample_frames_mjpeg_path(spark):
    """sample_frames on an MJPEG AVI: the widened 5-tuple scan unpacks
    (the round-7 break), the MJPG fourcc routes to the JPEG frame
    decoder, offsets point into the container, and the PNG-re-encoded
    frames match a direct decode of the same chunks."""
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        avi_decode_frames,
        mjpeg_encode_frames,
        png_decode_pixels,
        sample_frames,
    )

    payloads = {
        i: mjpeg_encode_frames(
            _flat_gray_frames([(i * 37 + f * 11) % 256 for f in range(5)])
        )
        for i in range(4)
    }
    vids = spark.createDataFrame(
        [(i, p) for i, p in payloads.items()], ["doc_id", "payload"]
    )
    out = sample_frames(vids, n_frames=2).collect()
    assert len(out) == 4 * 2
    for r in out:
        assert r["frame_idx"] in (0, 2)
        h, w, nch, px = png_decode_pixels(bytes(r["frame"]))
        assert (h, w, nch) == (16, 16, 3)
        _, _, _, dec = avi_decode_frames(payloads[r["doc_id"]])
        assert (px == dec[r["frame_idx"]]).all()
        assert 0 < r["frame_offset_bytes"] < len(payloads[r["doc_id"]])


def test_sample_frames_dib_path_still_works(spark):
    """Regression twin for the round-7 break: the uncompressed-DIB
    sampler (zero-fourcc branch of the 5-tuple scan) still samples."""
    from pl_fuzzy_frame_match_spark.operators.multimodal import (
        avi_encode_frames,
        sample_frames,
    )

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, size=(4, 12, 12, 3), dtype=np.uint8)
    vids = spark.createDataFrame(
        [(1, avi_encode_frames(frames))], ["doc_id", "payload"]
    )
    out = sample_frames(vids, n_frames=4).collect()
    assert len(out) == 4
    assert sorted(r["frame_idx"] for r in out) == [0, 1, 2, 3]


def test_video_hashing_on_mjpeg_input(spark):
    """The video-hash family works on COMPRESSED (MJPEG) payloads:
    within-group brightness-shifted clips still pair (flat blocks
    shift uniformly, dhash gradients are invariant), cross-group clips
    never do — same contract synthesize_near_dup_videos pins for
    uncompressed AVI."""
    from pl_fuzzy_frame_match_spark.operators.videohash import (
        synthesize_mjpeg_videos,
        video_frame_hashes,
        video_near_dup_pairs,
    )

    n = 16
    ids = spark.range(0, n).selectExpr("id AS doc_id")
    vids = synthesize_mjpeg_videos(ids)
    hashes = video_frame_hashes(vids).collect()
    assert len(hashes) == n * 5
    assert all(r["dhash"] is not None for r in hashes)

    pairs = video_near_dup_pairs(vids, threshold=0.5).collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    expected = {
        (g * 4 + i, g * 4 + j)
        for g in range(n // 4)
        for i in range(4)
        for j in range(i + 1, 4)
    }
    assert got == expected, got.symmetric_difference(expected)


def test_ann_sketch_best_match_recall_dense(spark, monkeypatch):
    """Dense-corpus quality gate for the sketch-scan tier (round 8):
    when true matches per key exceed top_n, 'pair recall vs exact' is
    ill-defined (both tiers honor a top-N contract with different
    selection orders — the auto_xl A/B measured 540K vs 243K rows for
    the same query), but the BEST match must still survive: for >= 90%
    of left keys that have any match, the minimum-distance right key
    found by the exact path appears in the sketch output. Catches a
    hamming ordering that keeps N plausible matches while dropping the
    best one."""
    from collections import defaultdict

    from pl_fuzzy_frame_match_spark.models import FuzzyMapping
    from pl_fuzzy_frame_match_spark.operators import candidates
    from pl_fuzzy_frame_match_spark.operators.matcher import fuzzy_match_dfs

    # Customer#-style dense names: every pair differs only in digits,
    # so most of the corpus is within threshold of every key
    left = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(150)], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(j, f"Customer#{j:09d}") for j in range(0, 300, 2)],
        ["rid", "rname"],
    )
    maps = [FuzzyMapping("lname", "rname", threshold_score=80.0)]

    def best_by_key(df, score_col):
        best = defaultdict(lambda: (-1.0, None))
        for r in df.select("lid", "rid", score_col).collect():
            s = r[score_col]
            if s is not None and s > best[r["lid"]][0]:
                best[r["lid"]] = (s, r["rid"])
        return best

    score = "lname_vs_rname_levenshtein"
    exact = fuzzy_match_dfs(
        left, right, maps, use_appr_nearest_neighbor=False
    )
    exact_best = best_by_key(exact, score)
    assert len(exact_best) == 150  # dense: every key matches something

    monkeypatch.setattr(candidates, "ANN_CATALYST_CAP", -1.0)
    sketch = fuzzy_match_dfs(
        left, right, maps, use_appr_nearest_neighbor=True
    )
    sketch_pairs = defaultdict(set)
    for r in sketch.select("lid", "rid", score).collect():
        sketch_pairs[r["lid"]].add((r[score], r["rid"]))

    hit = sum(
        1
        for lid, (s, rid) in exact_best.items()
        # any sketch match with the SAME best score counts (ties:
        # "Customer#...100" and "...001" are equidistant from "...000")
        if any(ss == s for ss, _ in sketch_pairs.get(lid, ()))
    )
    assert hit / len(exact_best) >= 0.9, f"best-match recall {hit}/150"


# ---------------------------------------------------------------------------
# BPE merge learning (round 8): tokenizer vocabulary induction.
# ---------------------------------------------------------------------------


def _bpe_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "low low low low low lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest"),
        ],
        ["id", "text"],
    )


def test_bpe_classic_example(spark):
    """The Sennrich et al. worked example: es, est, lo, low come out
    in that order, merged symbols participate in later merges, and
    ranks/freqs are deterministic."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    out = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in learn_bpe_merges(_bpe_corpus(spark), "text", 6).collect()
    ]
    assert out[:4] == [
        (0, "e", "s", "es", 9),
        (1, "es", "t", "est", 9),
        (2, "l", "o", "lo", 7),
        (3, "lo", "w", "low", 7),
    ]
    # a merged symbol ('est') is itself merged later
    assert any(m[2] == "est" or m[1] == "est" for m in out[4:])


def test_bpe_driver_and_distributed_agree(spark):
    """The driver-dict loop and the distributed rounds (posexplode
    pair counts + Catalyst aggregate merge fold) are the same
    operator: identical merge tables on a mixed corpus with ties,
    single-char words, and repeated-letter runs."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [
            (1, "aaa aaa baab x yz yz zy"),
            (2, "banana bandana cabana a b"),
            (3, "mississippi mississippi missing"),
        ],
        ["id", "text"],
    )
    drv = [tuple(r) for r in learn_bpe_merges(df, "text", 8).collect()]
    dist = [
        tuple(r)
        for r in learn_bpe_merges(
            df, "text", 8, max_driver_words=0
        ).collect()
    ]
    assert drv == dist and len(drv) == 8


def test_bpe_merge_fold_non_overlapping(spark):
    """'aaa' under merge (a,a) must yield [aa, a] — left-to-right
    non-overlapping scan (the fold's tail is the MERGED token after a
    merge, so it cannot chain) — on BOTH paths via the freq of the
    first merge: 3x 'aaaa' contributes 3 pairs per word scan-counted
    (overlaps counted in pair stats) but applies as 2 'aa' per word."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["id", "text"])
    for kw in ({}, {"max_driver_words": 0}):
        out = [
            (r["rank"], r["merged"], r["freq"])
            for r in learn_bpe_merges(df, "text", 2, **kw).collect()
        ]
        # round 0: pair (a,a) — 3 scan-positions per 'aaaa' x corpus
        # count 3 = freq 9; round 1 merges (aa,aa)
        assert out[0] == (0, "aa", 9)
        assert out[1][1] == "aaaa"


def test_bpe_degenerate_inputs(spark):
    """Single-char-word corpora produce no pairs (empty merge table,
    not an error); null texts are ignored."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, None)], ["id", "text"]
    )
    for kw in ({}, {"max_driver_words": 0}):
        assert learn_bpe_merges(df, "text", 4, **kw).count() == 0


def test_bpe_encode_matches_learned_segmentation(spark):
    """bpe_encode_tokens (pandas-UDF rank-sequential merges) must
    reproduce the learner's own segmentation: encoding the training
    corpus with the learned table and re-counting pair frequencies of
    rank-0's pair yields zero (every occurrence was merged), and the
    classic corpus segments as the worked example predicts."""
    from pl_fuzzy_frame_match_spark.operators.bpe import (
        bpe_encode_tokens,
        learn_bpe_merges,
    )

    df = _bpe_corpus(spark)
    merges = learn_bpe_merges(df, "text", 4)
    enc = bpe_encode_tokens(df, "text", merges).collect()
    toks = {r["id"]: r["bpe_tokens"] for r in enc}
    # after merges es, est, lo, low: 'low' -> ['low'], 'lower' ->
    # ['low','e','r'], 'newest' -> ['n','e','w','est'],
    # 'widest' -> ['w','i','d','est']
    assert toks[1][:3] == ["low", "low", "low"]
    assert toks[2][:4] == ["n", "e", "w", "est"]
    assert toks[3][:4] == ["w", "i", "d", "est"]
    # merge-table input forms are interchangeable: DataFrame vs rows
    enc2 = bpe_encode_tokens(df, "text", merges.collect()).collect()
    assert {r["id"]: r["bpe_tokens"] for r in enc2} == toks


def test_bpe_fertility_monotone_in_merges(spark):
    """More merges can only shorten (or keep) the token stream — the
    compression property the fertility query reports. Null texts
    encode to empty arrays, not errors."""
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.bpe import (
        bpe_encode_tokens,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "the theme therefore then there a"), (2, None)],
        ["id", "text"],
    )
    counts = []
    for n in (0, 3, 8):
        merges = learn_bpe_merges(
            df.where(F.col("text").isNotNull()), "text", n
        ) if n else []
        enc = bpe_encode_tokens(df, "text", merges)
        total = enc.agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
        counts.append(total)
        assert (
            enc.where(F.col("id") == 2).collect()[0]["bpe_tokens"] == []
        )
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] < counts[0]  # merges actually compress


def test_stream_bpe_tokenize_matches_batch(spark, tmp_path):
    """The streaming BPE tokenizer (frozen merge table shipped to the
    ingest stream) produces exactly the batch encoder's output."""
    from pl_fuzzy_frame_match_spark.operators.bpe import (
        bpe_encode_tokens,
        learn_bpe_merges,
    )
    from pl_fuzzy_frame_match_spark.sources.tables import load_table
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_bpe_tokenize,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        "text IS NOT NULL"
    )
    merges = learn_bpe_merges(docs, "text", 6).collect()
    batch = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode_tokens(docs, "text", merges).collect()
    }
    src = str(tmp_path / "docs_bpe_stream")
    docs.write.parquet(src)
    q = (
        stream_bpe_tokenize(
            spark, src, spark.read.parquet(src).schema, merges
        )
        .writeStream.format("memory")
        .queryName("q_bpe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in spark.sql("SELECT * FROM q_bpe").collect()
    }
    assert streamed == batch
    assert all(
        r["n_bpe_tokens"] == len(batch[r["doc_id"]])
        for r in spark.sql("SELECT * FROM q_bpe").collect()
    )


def test_bpe_min_freq_cutoff(spark):
    """min_freq stops merging before hapax pairs enter the vocab —
    identically on both paths."""
    from pl_fuzzy_frame_match_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [(1, "aa aa aa aa xy")], ["id", "text"]
    )
    for kw in ({}, {"max_driver_words": 0}):
        out = learn_bpe_merges(df, "text", 5, min_freq=2, **kw).collect()
        assert [(r["merged"], r["freq"]) for r in out] == [("aa", 4)]
        # without the cutoff the hapax 'xy' pair is learned too
        full = learn_bpe_merges(df, "text", 5, **kw).collect()
        assert any(r["merged"] == "xy" and r["freq"] == 1 for r in full)
