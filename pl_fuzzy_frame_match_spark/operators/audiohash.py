"""Acoustic fingerprinting + near-duplicate AUDIO dedup — the audio
member of the multimodal dedup trio (text MinHash/SimHash, image
dhash, this): a training-data pipeline deduplicates re-encoded and
re-leveled copies of the same clip, which byte-exact dedup cannot see.

``afp64`` is a 64-bit ENERGY-GRADIENT fingerprint over the REAL
decoded PCM (`operators/multimodal.wav_decode_samples` — stdlib RIFF
walk, no audio library): per-frame absolute amplitude summed over
channels, 65 equal time windows (floor boundaries), one bit per
adjacent-window mean comparison. Comparisons are CROSS-MULTIPLIED
(``e[k] * n[k+1] < e[k+1] * n[k]``) so the whole hash is integer
arithmetic with no division — exactly SQL-replayable, and negative
sample values never meet a floor/truncation divergence between
engines. The gradient form makes the hash invariant to VOLUME: a
re-leveled copy (all amplitudes scaled by a positive factor) keeps
every comparison, the acoustic analogue of dhash's exposure
invariance.

Near-dup pairs reuse `operators/dedup.hamming_band_pairs`: complete
recall by pigeonhole at ``max_hamming <= bands - 1``, so the default
operator is exact and oracle-replayable end to end (RIFF encode ->
decode -> window energies -> gradient bits -> band join).

The reference (a fuzzy string matcher) has no audio surface; this is
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

# 65 windows -> 64 adjacent comparisons = 64 bits
_AFP_WINDOWS = 65


def afp64_from_samples(arr) -> int | None:
    """64-bit energy-gradient fingerprint from an
    ``int16 ndarray[frames, channels]`` — integer arithmetic only:
    per-frame |amplitude| summed over channels, floor-boundary window
    sums, cross-multiplied adjacent-window mean comparisons. None when
    the clip is shorter than the window grid (no empty windows)."""
    import numpy as np

    n = int(arr.shape[0])
    if n < _AFP_WINDOWS:
        return None
    a = np.abs(arr.astype(np.int64)).sum(axis=1)
    wb = [(k * n) // _AFP_WINDOWS for k in range(_AFP_WINDOWS + 1)]
    e = [int(a[wb[k] : wb[k + 1]].sum()) for k in range(_AFP_WINDOWS)]
    cnt = [wb[k + 1] - wb[k] for k in range(_AFP_WINDOWS)]
    val = 0
    for k in range(_AFP_WINDOWS - 1):
        if e[k] * cnt[k + 1] < e[k + 1] * cnt[k]:
            val |= 1 << k
    return val - (1 << 64) if val >= (1 << 63) else val


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("afp", LongType()),
    ]
)


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough_cols: list | None = None,
) -> DataFrame:
    """(id, rate, channels, frames, afp) per WAV payload — REAL PCM16
    decode and fingerprint in ONE Arrow-batched map-only pass (the
    fingerprint frame is ~28 bytes/clip regardless of clip length).
    Undecodable or sub-grid payloads emit null fingerprints and the
    row survives — corrupt audio must never kill a stage.
    ``passthrough_cols`` ride along unchanged (the streaming twin's
    event-time column)."""
    from .multimodal import wav_decode_samples

    extra = [c for c in (passthrough_cols or []) if c]
    out = df.select(id_col, payload_col, *extra)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    extra_fields = [out.schema[c] for c in extra]
    schema = StructType(
        [StructField(id_col, LongType())]
        + AUDIO_FP_SCHEMA.fields[1:]
        + extra_fields
    )

    def fp_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            extras = [pdf[c] for c in extra]
            for i, (rid, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                tail = tuple(col.iloc[i] for col in extras)
                b = bytes(payload) if payload is not None else b""
                dec = wav_decode_samples(b)
                if dec is None:
                    rows.append((rid, None, None, None, None) + tail)
                    continue
                rate, ch, n, arr = dec
                rows.append(
                    (rid, rate, ch, n, afp64_from_samples(arr)) + tail
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return out.mapInPandas(fp_batches, schema=schema)


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate audio pairs (left_id < right_id, hamming):
    decode + fingerprint map-only, then the dedup family's Hamming
    banding — complete recall by pigeonhole at ``max_hamming <=
    bands - 1``, so the default operator is exact."""
    from .dedup import hamming_band_pairs

    hashed = (
        audio_fingerprints(df, id_col, payload_col)
        .where(F.col("afp").isNotNull())
        .select(F.col(id_col), F.col("afp").alias("__ahash"))
        .localCheckpoint(eager=True)  # both banding sides read it
    )
    return hamming_band_pairs(hashed, id_col, "__ahash", max_hamming, bands)


def build_audio_fp_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> None:
    """Write the durable audio near-dup index: one parquet of
    ``(index_id, afp)`` per already-ingested clip — the audio member
    of the CDC-ingest index trio (VERDICT r6 #4; image twin
    `operators/imagehash.build_image_hash_index`, text twin
    `operators/dedup.build_minhash_index`). ~16 bytes/clip; PCM decode
    happens once at build time, never again at probe time."""
    fp = audio_fingerprints(df, id_col, payload_col).where(
        F.col("afp").isNotNull()
    ).select(F.col(id_col).alias("index_id"), F.col("afp").alias("afp"))
    fp.write.mode("overwrite").parquet(path)


def incremental_audio_near_dup_pairs(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Probe a NEW batch of clips against the durable fingerprint
    index (CDC-ingest shape): fingerprint the batch map-only, band-
    join against the stored fingerprints via the shared
    `dedup.hamming_band_probe`, exact ``bit_count`` verify — probe
    cost tracks the BATCH, the corpus is only ever read as its
    16-byte/clip index. Complete recall at ``max_hamming <= bands -
    1`` (pigeonhole). Returns (id, index_id, hamming)."""
    from .dedup import hamming_band_probe

    spark = batch.sparkSession
    idx = spark.read.parquet(index_path)
    probe = audio_fingerprints(batch, id_col, payload_col).where(
        F.col("afp").isNotNull()
    ).select(F.col(id_col), "afp")
    return hamming_band_probe(
        probe, idx, id_col, "afp",
        index_hash_col="afp",
        max_hamming=max_hamming, bands=bands,
    )


def synthesize_near_dup_wavs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    group_size: int = 4,
    n_frames: int = 256,
) -> DataFrame:
    """Attach a deterministic mono PCM16 WAV per row where docs
    sharing ``doc_id // group_size`` are RE-LEVELED COPIES of one
    clip: the base signal is a closed-form integer hash of
    (group, frame) — quadratic mix, same rationale as the image
    corpus — and variant ``v = doc_id % group_size`` scales every
    amplitude by ``(8 + v) / 8`` with sign-symmetric integer floor,
    so within-group fingerprints agree to small Hamming (volume
    invariance) while cross-group signals are independent. All
    intermediates BIGINT-safe; a SQL oracle recomputes the exact
    fingerprint bits without decoding."""
    import numpy as np

    from .multimodal import wav_encode_pcm16

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                gid, v = d // group_size, d % group_size
                i = np.arange(n_frames, dtype=np.int64)
                a = gid * 7919 + i + 1
                h1 = (a * a) % 16777216
                u = (h1 * 2654435761) % (1 << 32)
                base = (u // (1 << 20)) % 4001 - 2000
                scaled = np.sign(base) * (
                    (np.abs(base) * (8 + v)) // 8
                )
                arr = scaled.astype("<i2").reshape(n_frames, 1)
                payloads.append(wav_encode_pcm16(arr, 8000))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)
