"""Video fingerprinting + near-duplicate VIDEO dedup — the final
member of the multimodal dedup family (text MinHash/SimHash, image
dhash, audio energy fingerprint, this): a training pipeline
deduplicates re-encoded / re-leveled copies of the same clip, which
byte-exact dedup cannot see.

A video's fingerprint is its SET of per-frame dhashes, computed over
the REAL decoded frames (`operators/multimodal.avi_decode_frames` —
stdlib RIFF walk, no ffmpeg; the integer-exact gradient hash from
`operators/imagehash`). Near-dup detection is set similarity:
candidates are videos sharing >= 1 identical frame hash (an EQUI-join
on the 64-bit hash — linear, the frame-hash analogue of the exact
n-gram prefix filter), verified with the exact Jaccard over the two
frame-hash sets. Every step is integer arithmetic + counting, so a
SQL oracle recomputes per-frame hash bits from a closed-form pixel
function WITHOUT decoding and replays the full pair set.

Scale notes: the hash frame is ~12 bytes per (video, distinct frame
hash) — frames never leave the decode pass. A globally-common frame
(black frame, title card) makes its hash a hot join key; pass
``max_hash_df`` to drop frame hashes appearing in more than that many
videos from BOTH candidate generation and the Jaccard ("informative
frame" similarity — the stopword trick), keeping the join linear on
real corpora. Default None = exact set Jaccard.

The reference (a fuzzy string matcher) has no video surface; this is
a pipeline extension in the same family as `operators/dedup.py`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

VIDEO_FRAME_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def video_frame_hashes(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """One row per (video, frame): decode the AVI and dhash every
    frame in a single Arrow-batched map-only pass. Undecodable
    payloads emit ONE null-hash row (the video stays visible
    downstream); decodable videos never emit nulls."""
    from .imagehash import dhash64_from_pixels
    from .multimodal import avi_decode_frames

    schema = StructType(
        [StructField(id_col, LongType())] + VIDEO_FRAME_HASH_SCHEMA.fields[1:]
    )

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dec = avi_decode_frames(b)
                if dec is None:
                    rows.append((rid, None, None, None, None, None))
                    continue
                w, h, n, frames = dec
                for f in range(n):
                    rows.append(
                        (rid, w, h, n, f, dhash64_from_pixels(frames[f]))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    out = df.select(id_col, payload_col)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    return out.mapInPandas(hash_batches, schema=schema)


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    threshold: float = 0.5,
    max_hash_df: int | None = None,
) -> DataFrame:
    """Near-duplicate video pairs (left_id < right_id, n_shared,
    jaccard_sim): frame-hash set Jaccard >= ``threshold``. Candidate
    generation is an equi-join on the frame hash (videos sharing no
    identical frame never meet — linear); the verify joins each
    side's distinct-hash count back in and computes
    shared / (|A| + |B| - shared) exactly, rounded to 6 decimals
    before the threshold (engine-portable tie handling)."""
    hashed = (
        video_frame_hashes(df, id_col, payload_col)
        .where(F.col("dhash").isNotNull())
        .select(F.col(id_col).alias("__vid"), "dhash")
        .distinct()
        .localCheckpoint(eager=True)  # 3 plan references below
    )
    if max_hash_df is not None:
        dfreq = hashed.groupBy("dhash").agg(
            F.count(F.lit(1)).alias("__df")
        )
        hashed = (
            hashed.join(
                F.broadcast(
                    dfreq.where(F.col("__df") > max_hash_df).select("dhash")
                ),
                on="dhash",
                how="left_anti",
            )
            .localCheckpoint(eager=True)
        )
    sizes = hashed.groupBy("__vid").agg(F.count(F.lit(1)).alias("__n"))
    a, b = hashed.alias("a"), hashed.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.__vid") < F.col("b.__vid")),
            "inner",
        )
        .groupBy(
            F.col("a.__vid").alias("left_id"),
            F.col("b.__vid").alias("right_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(
        F.col("__vid").alias("left_id"), F.col("__n").alias("__na")
    )
    nb = sizes.select(
        F.col("__vid").alias("right_id"), F.col("__n").alias("__nb")
    )
    return (
        shared.join(F.broadcast(na), on="left_id")
        .join(F.broadcast(nb), on="right_id")
        .withColumn(
            "jaccard_sim",
            F.round(
                F.col("n_shared")
                / (F.col("__na") + F.col("__nb") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
        .select(
            "left_id",
            "right_id",
            F.col("n_shared").cast("int").alias("n_shared"),
            "jaccard_sim",
        )
    )


def video_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough_cols: list | None = None,
) -> DataFrame:
    """One 64-bit SET fingerprint per video — the order-insensitive
    fold of its distinct frame dhashes (FNV-1a-style multiply over the
    sorted set), computed in the SAME decode pass as the frame hashes
    so a clip contributes ~28 bytes downstream. Two videos whose frame
    sets match exactly — e.g. a brightness-shifted re-encode, by
    dhash's exposure invariance — fingerprint identically, which is
    the key the streaming dedup twin (`stream_video_dedup`) keeps
    FIRST on. Deterministic integer arithmetic; undecodable payloads
    emit a null fingerprint and survive. Not a similarity hash: one
    differing frame changes it (use `video_near_dup_pairs` /
    `incremental_video_near_dup_pairs` for Jaccard matching)."""
    from .imagehash import dhash64_from_pixels
    from .multimodal import avi_decode_frames

    extra = [c for c in (passthrough_cols or []) if c]
    out = df.select(id_col, payload_col, *extra)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    extra_fields = [out.schema[c] for c in extra]
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", IntegerType()),
            StructField("vfp", LongType()),
        ]
        + extra_fields
    )

    def fp_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        mask = (1 << 64) - 1
        for pdf in batches:
            rows = []
            extras = [pdf[c] for c in extra]
            for i, (rid, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                tail = tuple(col.iloc[i] for col in extras)
                b = bytes(payload) if payload is not None else b""
                dec = avi_decode_frames(b)
                if dec is None:
                    rows.append((rid, None, None, None, None) + tail)
                    continue
                w, h, n, frames = dec
                hashes = sorted(
                    {
                        dhash64_from_pixels(frames[f]) & mask
                        for f in range(n)
                    }
                )
                fp = 0xCBF29CE484222325
                for hv in hashes:
                    fp = ((fp ^ hv) * 0x100000001B3) & mask
                if fp >= 1 << 63:
                    fp -= 1 << 64
                rows.append((rid, w, h, n, fp) + tail)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return out.mapInPandas(fp_batches, schema=schema)


def build_video_hash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hash_df: int | None = None,
) -> None:
    """Write the durable video near-dup index: one parquet of
    ``(index_id, dhash)`` — the DISTINCT frame-hash set of every
    already-ingested video (~12 bytes per (video, distinct frame);
    frames never leave the build pass). The video member of the
    CDC-ingest index trio (VERDICT r6 #4). ``max_hash_df`` applies
    the stopword cap at BUILD time (drop frame hashes appearing in
    more than that many corpus videos), so probes inherit the
    "informative frame" similarity and the hot-key protection."""
    hashed = (
        video_frame_hashes(df, id_col, payload_col)
        .where(F.col("dhash").isNotNull())
        .select(F.col(id_col).alias("index_id"), "dhash")
        .distinct()
    )
    if max_hash_df is not None:
        hashed = hashed.localCheckpoint(eager=True)
        dfreq = hashed.groupBy("dhash").agg(
            F.count(F.lit(1)).alias("__df")
        )
        hashed = hashed.join(
            F.broadcast(
                dfreq.where(F.col("__df") > max_hash_df).select("dhash")
            ),
            on="dhash",
            how="left_anti",
        )
    hashed.write.mode("overwrite").parquet(path)


def incremental_video_near_dup_pairs(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    threshold: float = 0.5,
) -> DataFrame:
    """Probe a NEW batch of videos against the durable frame-hash
    index (CDC-ingest shape): hash the batch's frames map-only,
    equi-join on the 64-bit frame hash against the stored sets
    (batch videos sharing no frame with a corpus video never meet),
    then the exact set Jaccard — shared / (|batch set| + |index set|
    − shared), rounded to 6 decimals before the threshold like the
    batch path. Probe cost tracks the BATCH; the corpus is only ever
    read as its hash index (whose per-video sizes are one groupBy of
    the index — no payload decode). If the index was built with
    ``max_hash_df``, its stopword cap is inherited: a capped hash is
    absent from the index so it can't generate candidates, but it DOES
    still count in the batch-side set size — pass the same cap's
    output through `video_frame_hashes` externally if strict batch/
    index symmetry is needed. Returns (id, index_id, n_shared,
    jaccard_sim)."""
    spark = batch.sparkSession
    idx = spark.read.parquet(index_path).select(
        F.col("index_id"), "dhash"
    )
    sizes_idx = idx.groupBy("index_id").agg(
        F.count(F.lit(1)).alias("__ni")
    )
    probe = (
        video_frame_hashes(batch, id_col, payload_col)
        .where(F.col("dhash").isNotNull())
        .select(F.col(id_col), "dhash")
        .distinct()
        .localCheckpoint(eager=True)  # candidate join + size agg
    )
    sizes_probe = probe.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__np")
    )
    shared = (
        probe.join(idx, on="dhash", how="inner")
        .groupBy(id_col, "index_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # sizes_probe is batch-sized -> broadcast; sizes_idx is one row per
    # CORPUS video (unbounded) -> shuffle join, AQE may still broadcast
    # the (small, batch-driven) shared side at runtime.
    return (
        shared.join(F.broadcast(sizes_probe), on=id_col)
        .join(sizes_idx, on="index_id")
        .withColumn(
            "jaccard_sim",
            F.round(
                F.col("n_shared")
                / (F.col("__np") + F.col("__ni") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
        .select(
            id_col,
            "index_id",
            F.col("n_shared").cast("int").alias("n_shared"),
            "jaccard_sim",
        )
    )


def synthesize_near_dup_videos(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    group_size: int = 4,
    n_frames: int = 6,
) -> DataFrame:
    """Attach a deterministic 6-frame 16x16 AVI per row where docs
    sharing ``doc_id // group_size`` are BRIGHTNESS-SHIFTED COPIES of
    one clip: frame pixels are a closed-form integer hash of
    (group, frame, y, x) — quadratic mix, the image-corpus rationale —
    written as equal R=G=B channels (so dhash's integer-mean grayscale
    IS the base value and the SQL oracle needs no channel dimension),
    and variant ``v = doc_id % group_size`` shifts every pixel by +v
    clamped at 255. Within a group frame hashes match (dhash exposure
    invariance) except for occasional clamped-pixel bit flips =>
    video Jaccard near 1.0 (always >= 0.5 in the test corpora);
    cross-group frames are independent => Jaccard 0."""
    import numpy as np

    from .multimodal import avi_encode_frames

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                gid, v = d // group_size, d % group_size
                f, y, x = np.meshgrid(
                    np.arange(n_frames),
                    np.arange(16),
                    np.arange(16),
                    indexing="ij",
                )
                a = (gid * 523 + f * 131 + y * 31 + x + 1).astype(
                    np.int64
                )
                h1 = (a * a) % 16777216
                base = ((h1 * 2654435761) % (1 << 32)) // (1 << 24)
                px = np.minimum(base + v, 255).astype(np.uint8)
                rgb = np.repeat(px[..., None], 3, axis=3)
                payloads.append(avi_encode_frames(rgb))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


def synthesize_mjpeg_videos(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    group_size: int = 4,
    n_frames: int = 5,
) -> DataFrame:
    """Attach a deterministic 5-frame 32x32 MJPEG AVI per row — the
    COMPRESSED-video twin of :func:`synthesize_near_dup_videos`, built
    so the lossy codec reconstructs BIT-EXACTLY: every frame is a 4x4
    grid of flat 8x8 blocks holding EVEN gray values (2x2 left dhash
    too few gradients — cross-group frame hashes collided), the regime
    where
    the baseline JPEG encoder's Annex-K quantization error is exactly
    zero (see `operators/jpeg.py` / `multimodal_jpeg_pixels`). Block
    values are a closed-form quadratic hash of
    (``doc_id // group_size``, frame, block row, block col) folded to
    even 0..254; variant ``v = doc_id % group_size`` brightness-shifts
    every block by ``+2v`` clamped at 254 (still flat + even => still
    exact), so within-group clips are near-dups for the video-hash
    family while a SQL oracle recomputes any decoded-pixel statistic
    WITHOUT a JPEG codec."""
    import numpy as np

    from .multimodal import mjpeg_encode_frames

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                gid, v = d // group_size, d % group_size
                f, by, bx = np.meshgrid(
                    np.arange(n_frames),
                    np.arange(4),
                    np.arange(4),
                    indexing="ij",
                )
                a = (gid * 523 + f * 131 + by * 31 + bx + 1).astype(
                    np.int64
                )
                h1 = (a * a) % 16777216
                base = (
                    ((h1 * 2654435761) % (1 << 32)) // (1 << 24) % 128
                ) * 2
                vals = np.minimum(base + 2 * v, 254).astype(np.uint8)
                frames = np.repeat(
                    np.repeat(vals, 8, axis=1), 8, axis=2
                )
                payloads.append(mjpeg_encode_frames(frames))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)
