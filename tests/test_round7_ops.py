"""Round-7 operators: direct image feature vectors (VERDICT r6 #3),
durable audio/video indexes + incremental probes + streaming video
dedup twin (r6 #4), two-sided degenerate-key probe (r6 #7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# VERDICT r6 #3: image feature vectors emitted directly from the decode
# pass must equal the channel-summed image_histograms fold they replace.
# ---------------------------------------------------------------------------


def test_image_feature_vectors_match_histograms(spark):
    from collections import defaultdict

    from pl_fuzzy_frame_match_spark.operators.imagehash import (
        image_feature_vectors,
        image_histograms,
        synthesize_near_dup_images,
    )

    docs = spark.range(0, 60).selectExpr("id AS doc_id")
    imgs = synthesize_near_dup_images(docs)
    direct = {
        r["doc_id"]: r["v"] for r in image_feature_vectors(imgs).collect()
    }
    folded = defaultdict(lambda: [0.0] * 16)
    for r in image_histograms(imgs).collect():
        folded[r["doc_id"]][r["bin"]] += float(r["n"])
    assert set(direct) == set(folded)
    for k, v in direct.items():
        assert v == folded[k], k
    # undecodable payloads emit NO vector row (same contract as
    # image_histograms: join back to flag them)
    junk = spark.createDataFrame(
        [(1, b"not an image"), (2, b"")], ["doc_id", "payload"]
    )
    assert image_feature_vectors(junk).count() == 0


# ---------------------------------------------------------------------------
# VERDICT r6 #7: a degenerate RIGHT key family (diverse left) must also
# reroute the banded tier to the skew-immune blocked sketch scan.
# ---------------------------------------------------------------------------


def _diverse_keys(spark, n=500):
    return spark.range(n).selectExpr("md5(CAST(id AS STRING)) AS k")


def _degenerate_keys(spark, n=500):
    return spark.range(n).selectExpr(
        "concat('Customer#', lpad(CAST(id AS STRING), 9, '0')) AS k"
    )


def test_degenerate_right_side_routes_to_sketch(spark, monkeypatch):
    from pl_fuzzy_frame_match_spark.operators import candidates as c

    routed = []
    real_banded, real_blocked = c._banded_topn, c._sketch_scan_topn_blocked
    monkeypatch.setattr(
        c, "_banded_topn",
        lambda *a, **kw: routed.append("banded") or real_banded(*a, **kw),
    )
    monkeypatch.setattr(
        c, "_sketch_scan_topn_blocked",
        lambda *a, **kw: routed.append("sketch_blocked")
        or real_blocked(*a, **kw),
    )
    monkeypatch.setattr(c, "SKETCH_SCAN_CAP", 10)
    monkeypatch.setattr(c, "BROADCAST_KEY_LIMIT", 100)

    out = c.approx_candidate_pairs(
        _diverse_keys(spark).selectExpr("k AS a"),
        _degenerate_keys(spark).selectExpr("k AS b"),
        "a", "b", top_n=3, n_left_keys=500, n_right_keys=500,
    )
    assert out.count() >= 0
    assert routed == ["sketch_blocked"]


# ---------------------------------------------------------------------------
# VERDICT r6 #4: durable index + incremental probe for audio and video —
# probe hits must equal the full-corpus pair set restricted to
# (batch x index) cross-split pairs.
# ---------------------------------------------------------------------------


def test_durable_audio_index_probe_matches_full_pairs(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.audiohash import (
        audio_near_dup_pairs,
        build_audio_fp_index,
        incremental_audio_near_dup_pairs,
        synthesize_near_dup_wavs,
    )

    idx_path = str(tmp_path / "audio_index")
    corpus_ids = spark.createDataFrame(
        [(g * 4,) for g in range(12)], ["doc_id"]
    )
    build_audio_fp_index(synthesize_near_dup_wavs(corpus_ids), idx_path)
    stored = spark.read.parquet(idx_path)
    assert stored.columns == ["index_id", "afp"]
    assert stored.count() == 12

    batch_ids = spark.createDataFrame(
        [(g * 4 + 2,) for g in range(12)]
        + [(g * 4,) for g in range(80, 84)],
        ["doc_id"],
    )
    hits = incremental_audio_near_dup_pairs(
        synthesize_near_dup_wavs(batch_ids), idx_path
    ).collect()

    # ground truth: full-corpus banded pairs restricted to cross-split
    full_ids = corpus_ids.unionByName(batch_ids)
    full = audio_near_dup_pairs(synthesize_near_dup_wavs(full_ids))
    corpus = {r["doc_id"] for r in corpus_ids.collect()}
    batch = {r["doc_id"] for r in batch_ids.collect()}
    want = {
        (b, a, h)
        for a, b, h in (
            (r["left_id"], r["right_id"], r["hamming"])
            for r in full.collect()
        )
        if a in corpus and b in batch
    } | {
        (a, b, h)
        for a, b, h in (
            (r["left_id"], r["right_id"], r["hamming"])
            for r in full.collect()
        )
        if a in batch and b in corpus
    }
    got = {(r["doc_id"], r["index_id"], r["hamming"]) for r in hits}
    assert got == want, got.symmetric_difference(want)
    # every within-group re-level is flagged, novel groups are not
    assert {g * 4 + 2 for g in range(12)} == {r["doc_id"] for r in hits}


def test_durable_video_index_probe_matches_full_pairs(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.videohash import (
        build_video_hash_index,
        incremental_video_near_dup_pairs,
        synthesize_near_dup_videos,
        video_near_dup_pairs,
    )

    idx_path = str(tmp_path / "video_index")
    corpus_ids = spark.createDataFrame(
        [(g * 4,) for g in range(10)], ["doc_id"]
    )
    build_video_hash_index(
        synthesize_near_dup_videos(corpus_ids), idx_path
    )
    stored = spark.read.parquet(idx_path)
    assert set(stored.columns) == {"index_id", "dhash"}
    assert stored.select("index_id").distinct().count() == 10

    batch_ids = spark.createDataFrame(
        [(g * 4 + 3,) for g in range(10)]
        + [(g * 4,) for g in range(70, 74)],
        ["doc_id"],
    )
    hits = incremental_video_near_dup_pairs(
        synthesize_near_dup_videos(batch_ids), idx_path, threshold=0.5
    ).collect()

    full_ids = corpus_ids.unionByName(batch_ids)
    full = video_near_dup_pairs(
        synthesize_near_dup_videos(full_ids), threshold=0.5
    )
    corpus = {r["doc_id"] for r in corpus_ids.collect()}
    batch = {r["doc_id"] for r in batch_ids.collect()}
    want = set()
    for r in full.collect():
        a, b = r["left_id"], r["right_id"]
        if a in corpus and b in batch:
            want.add((b, a, r["n_shared"], r["jaccard_sim"]))
        elif a in batch and b in corpus:
            want.add((a, b, r["n_shared"], r["jaccard_sim"]))
    got = {
        (r["doc_id"], r["index_id"], r["n_shared"], r["jaccard_sim"])
        for r in hits
    }
    assert got == want, got.symmetric_difference(want)
    assert {g * 4 + 3 for g in range(10)} == {r["doc_id"] for r in hits}


def test_video_index_stopword_cap(spark, tmp_path):
    """max_hash_df at build time drops frame hashes whose document
    frequency (videos per hash) exceeds the cap. This corpus has one
    video per group, so every hash has df=1: cap 1 must keep the
    index identical to the uncapped build (the cap only ever removes
    genuinely hot hashes)."""
    from pl_fuzzy_frame_match_spark.operators.videohash import (
        build_video_hash_index,
        synthesize_near_dup_videos,
    )

    idx_path = str(tmp_path / "video_index_capped")
    corpus_ids = spark.createDataFrame(
        [(g * 4,) for g in range(8)], ["doc_id"]
    )
    vids = synthesize_near_dup_videos(corpus_ids)
    # corpus videos are one per group -> every frame hash has df=1;
    # cap 0 would drop everything, cap 1 keeps everything
    build_video_hash_index(vids, idx_path, max_hash_df=1)
    kept = spark.read.parquet(idx_path).count()
    build_video_hash_index(vids, idx_path, max_hash_df=None)
    uncapped = spark.read.parquet(idx_path).count()
    assert kept == uncapped  # no hash exceeds df=1 in this corpus


# ---------------------------------------------------------------------------
# Streaming video dedup twin (completes the media trio).
# ---------------------------------------------------------------------------


def test_video_fingerprints_set_semantics(spark):
    """Brightness-shifted copies whose frame-hash SETS are identical
    fingerprint identically (most groups in the synth corpus — a
    255-clamped shift can flip a few gradient bits, so dhash exposure
    invariance is exact only away from saturation); cross-group clips
    always differ; undecodable payloads carry a null fingerprint."""
    from pl_fuzzy_frame_match_spark.operators.videohash import (
        synthesize_near_dup_videos,
        video_fingerprints,
    )

    ids = spark.range(0, 32).selectExpr("id AS doc_id")
    rows = video_fingerprints(synthesize_near_dup_videos(ids)).collect()
    assert len(rows) == 32
    fps = {r["doc_id"]: r["vfp"] for r in rows}
    assert all(v is not None for v in fps.values())
    # deterministic corpus: 6 of 8 groups collapse fully, 2 split on a
    # clamped-pixel bit flip -> 10 distinct fingerprints
    group_sizes = [
        len({fps[g * 4 + i] for i in range(4)}) for g in range(8)
    ]
    assert group_sizes == [1, 1, 1, 2, 1, 2, 1, 1], group_sizes
    assert len(set(fps.values())) == 10
    assert len({fps[g * 4] for g in range(8)}) == 8  # cross-group
    junk = spark.createDataFrame(
        [(1, b"RIFFxxxxAVI "), (2, b"")], ["doc_id", "payload"]
    )
    jr = video_fingerprints(junk).collect()
    assert len(jr) == 2 and all(r["vfp"] is None for r in jr)


def test_stream_video_dedup_matches_batch(spark, tmp_path):
    from pl_fuzzy_frame_match_spark.operators.videohash import (
        synthesize_near_dup_videos,
        video_fingerprints,
    )
    from pl_fuzzy_frame_match_spark.streaming.stream_ops import (
        stream_video_dedup,
    )

    ids = spark.range(0, 32).selectExpr("id AS doc_id")
    vids = synthesize_near_dup_videos(ids)
    src = str(tmp_path / "vids_stream")
    vids.write.parquet(src)

    batch_fps = {
        r["vfp"]
        for r in video_fingerprints(spark.read.parquet(src)).collect()
        if r["vfp"] is not None
    }
    out = stream_video_dedup(spark, src, spark.read.parquet(src).schema)
    q = (
        out.writeStream.format("memory")
        .queryName("t_vid_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, vfp FROM t_vid_dedup").collect()
    # one survivor per distinct fingerprint — exactly the batch
    # dropDuplicates survivors count (10: see the set-semantics test),
    # so the stream twin matches the batch path and near-dup groups
    # genuinely collapsed (10 << 32)
    assert len(rows) == len({r["vfp"] for r in rows}) == len(batch_fps) == 10
