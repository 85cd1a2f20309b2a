"""Perceptual image hashing + near-duplicate IMAGE dedup — the
multimodal analogue of MinHash text dedup a training-data pipeline
needs (VERDICT r5 #7).

Hashes are computed over the REAL decoded pixels (the pure-Python
PNG/GIF codecs in `operators/multimodal.py` — no imaging library), in
the SAME Arrow-batched ``mapInPandas`` pass as the decode, so hashing
10^9 stored images is one map-only scan: no shuffle until the
(tiny) hash frame reaches the banding join.

Two hashes, two contracts:

- ``dhash64`` (gradient hash, Krawetz): INTEGER-EXACT by construction
  — integer-mean grayscale, area-mean downscale to an 8-row x 9-col
  grid with floor boundaries, one bit per horizontally-adjacent cell
  comparison. Every step is integer arithmetic, so a SQL oracle can
  recompute the hash from a closed-form pixel function WITHOUT
  decoding, value-checking the decode -> hash path end to end.
- ``phash64`` (DCT hash): 32x32 resample -> 2-D DCT-II -> low-
  frequency 8x8 block -> median threshold. Float DCT, deterministic
  within an engine but not SQL-replayable; quality-gated by tests.

Near-dup pairs use the dedup family's Hamming banding
(`operators/dedup.hamming_band_pairs` — the SimHash machinery): with
``bands`` 16-bit bands, any pair within Hamming distance ``bands - 1``
agrees exactly on >= 1 band (pigeonhole), so for the default
``max_hamming=3, bands=4`` the banded candidate set is COMPLETE — the
operator is exact, not approximate, and the DuckDB oracle replays the
full pair set brute-force.

The reference (a fuzzy string matcher) has no image surface; this is
a pipeline extension in the same family as `operators/dedup.py`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# dhash grid: 8 rows x 9 cols -> 8x8 horizontal comparisons = 64 bits
_DH_ROWS, _DH_COLS = 8, 9


def dhash64_from_pixels(px) -> int | None:
    """64-bit gradient hash from a ``uint8 ndarray[h, w, nch]`` —
    integer arithmetic only (SQL-replayable): grayscale is the
    integer mean across channels, downscale is the floor of each
    area-block's pixel sum over its pixel count, bit ``i*8 + j`` is
    ``cell[i][j] < cell[i][j+1]``. None when the raster is smaller
    than the grid (no empty blocks)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if h < _DH_ROWS or w < _DH_COLS:
        return None
    nch = px.shape[2] if px.ndim == 3 else 1
    g = px.reshape(h, w, nch).astype(np.int64).sum(axis=2) // nch
    rb = [(i * h) // _DH_ROWS for i in range(_DH_ROWS + 1)]
    cb = [(j * w) // _DH_COLS for j in range(_DH_COLS + 1)]
    cells = [
        [
            int(g[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].sum())
            // ((rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j]))
            for j in range(_DH_COLS)
        ]
        for i in range(_DH_ROWS)
    ]
    val = 0
    for i in range(_DH_ROWS):
        for j in range(_DH_COLS - 1):
            if cells[i][j] < cells[i][j + 1]:
                val |= 1 << (i * 8 + j)
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_from_pixels(px) -> int | None:
    """64-bit DCT hash (pHash): nearest-sample to 32x32 grayscale,
    2-D DCT-II, keep the low-frequency 8x8 block, threshold each
    coefficient against the block median. Float math — deterministic
    in-engine (fixed numpy ops), not SQL-replayable."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if h < 2 or w < 2:
        return None
    nch = px.shape[2] if px.ndim == 3 else 1
    g = px.reshape(h, w, nch).astype(np.float64).mean(axis=2)
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    s = g[np.ix_(yi, xi)]
    k = np.arange(32)
    u = k.reshape(-1, 1)
    c = np.cos(np.pi * (k + 0.5) * u / 32.0)  # DCT-II basis
    d = c @ s @ c.T
    block = d[:8, :8].ravel()
    med = float(np.median(block))
    val = 0
    for idx, coef in enumerate(block):
        if coef > med:
            val |= 1 << idx
    return val - (1 << 64) if val >= (1 << 63) else val


IMAGE_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash", LongType()),
        StructField("phash", LongType()),
    ]
)


def image_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough_cols: list | None = None,
) -> DataFrame:
    """(id, width, height, dhash, phash) per image payload — REAL
    PNG/GIF pixel decode and both hashes in ONE Arrow-batched
    ``mapInPandas`` pass (map-only; the hash frame is ~24 bytes/image
    no matter the raster size, so everything downstream is tiny).
    Undecodable or sub-grid payloads emit null hashes and the row
    survives — a corrupt image must never kill a stage.

    ``passthrough_cols`` are carried through unchanged (the streaming
    twin needs its event-time column to survive the pass). Small
    single-file scans arrive as ONE partition and would run the whole
    decode serially (the `_fanout` gotcha, PLANS.md r5) — fan out
    first; streams skip the fanout (repartitioning a stream is the
    sink's job) and at real scale the scan already has enough
    partitions so it is a no-op anyway."""
    from .multimodal import gif_decode_pixels, png_decode_pixels

    extra = [c for c in (passthrough_cols or []) if c]
    df = df.select(id_col, payload_col, *extra)
    if not df.isStreaming:
        from .dedup import _fanout

        df = _fanout(df)

    extra_fields = [df.schema[c] for c in extra]
    schema = StructType(
        [StructField(id_col, LongType())]
        + IMAGE_HASH_SCHEMA.fields[1:]
        + extra_fields
    )

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode_pixels

        for pdf in batches:
            rows = []
            extras = [pdf[c] for c in extra]
            for i, (rid, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                tail = tuple(col.iloc[i] for col in extras)
                b = bytes(payload) if payload is not None else b""
                dec = (
                    png_decode_pixels(b)
                    or gif_decode_pixels(b)
                    or jpeg_decode_pixels(b)
                )
                if dec is None:
                    rows.append((rid, None, None, None, None) + tail)
                    continue
                h, w, _nch, px = dec
                rows.append(
                    (
                        rid,
                        w,
                        h,
                        dhash64_from_pixels(px),
                        phash64_from_pixels(px),
                    )
                    + tail
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.mapInPandas(hash_batches, schema=schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs (left_id < right_id, hamming):
    decode + hash in one map-only pass, then the dedup family's
    Hamming banding over the 64-bit hash. For ``max_hamming <=
    bands - 1`` the pigeonhole guarantee makes the candidate set
    COMPLETE, so with the integer-exact dhash the whole operator is
    SQL-oracle-replayable; larger ``max_hamming`` trades recall for
    the same banding cost (the SimHash contract)."""
    from .dedup import hamming_band_pairs

    hashed = (
        image_hashes(df, id_col, payload_col)
        .where(F.col(hash_col).isNotNull())
        .select(F.col(id_col), F.col(hash_col).alias("__ihash"))
        # both banding sides read this frame; one decode pass, not two
        .localCheckpoint(eager=True)
    )
    return hamming_band_pairs(hashed, id_col, "__ihash", max_hamming, bands)


def synthesize_near_dup_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    group_size: int = 4,
) -> DataFrame:
    """Attach a deterministic 16x16 grayscale PNG per row where docs
    sharing ``doc_id // group_size`` are NEAR-DUPLICATES: the base
    raster is a closed-form integer hash of (group, y, x) — QUADRATIC
    in the mixed index, because a linear Weyl sequence gives every
    group the same gradient structure and dhash (gradient-based) then
    collides across groups (measured: 6,384 incidental cross-group
    pairs linear vs 0 quadratic at 500 docs) — and each variant
    ``v = doc_id % group_size`` is a uniform +v brightness shift
    clamped at 255, so within-group hashes agree to Hamming <= 1
    (dhash's exposure invariance) while cross-group hashes are
    independent. All intermediates stay under 2^63 (BIGINT-safe for
    the DuckDB replay). Every PNG filter type appears ((id+y) % 5).
    Closed form => a SQL oracle recomputes the exact dhash without
    decoding (same construction as `synthesize_png_corpus`)."""
    import numpy as np

    from .multimodal import png_encode_pixels

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                gid, v = d // group_size, d % group_size
                y, x = np.meshgrid(
                    np.arange(16), np.arange(16), indexing="ij"
                )
                a = (gid * 131 + y * 31 + x + 1).astype(np.int64)
                h1 = (a * a) % 16777216
                base = ((h1 * 2654435761) % (1 << 32)) // (1 << 24)
                px = np.minimum(base + v, 255).astype("uint8")
                px = px.reshape(16, 16, 1)
                filters = [(d + yy) % 5 for yy in range(16)]
                payloads.append(png_encode_pixels(px, 0, filters))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channel", IntegerType()),
        StructField("bin", IntegerType()),
        StructField("n", LongType()),
    ]
)


def image_histograms(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bins: int = 16,
) -> DataFrame:
    """REAL per-channel intensity histograms over decoded pixels
    (PNG/GIF/JPEG) — the handcrafted feature stage in front of the
    similarity family (normalize the counts and they are an
    ``array<float>`` for `operators/similarity`); unlike the
    model-backed `multimodal.extract_features` stub this one is real
    end to end. One map-only Arrow pass; one output row per
    (image, channel, bin) with ``bin = pixel_value * bins // 256`` —
    integer-exact, so a SQL oracle recomputes the counts from a
    closed-form corpus. Undecodable payloads emit no rows (their ids
    simply have no histogram — join back to flag them)."""
    import numpy as np

    from .multimodal import gif_decode_pixels, png_decode_pixels

    schema = StructType(
        [StructField(id_col, LongType())] + HIST_SCHEMA.fields[1:]
    )

    def hist_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode_pixels

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dec = (
                    png_decode_pixels(b)
                    or gif_decode_pixels(b)
                    or jpeg_decode_pixels(b)
                )
                if dec is None:
                    continue
                h, w, nch, px = dec
                binned = (px.astype(np.int64) * bins) // 256
                for c in range(nch):
                    counts = np.bincount(
                        binned[:, :, c].ravel(), minlength=bins
                    )
                    for bi in range(bins):
                        if counts[bi]:
                            rows.append((rid, c, bi, int(counts[bi])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    out = df.select(id_col, payload_col)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    return out.mapInPandas(hist_batches, schema=schema)


def image_feature_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bins: int = 16,
) -> DataFrame:
    """Dense channel-summed intensity-histogram feature vector, one
    ``array<double>`` row per decodable image, emitted DIRECTLY from
    the numpy decode pass (VERDICT r6 #3): `image_histograms` already
    holds the full histogram in numpy inside ``mapInPandas``, so
    assembling the KNN feature vector by exploding to
    (doc, channel, bin) rows and folding with nested interpreted HOFs
    cost two extra shuffles and O(bins^2) interpreted ops per doc.
    Same integer binning (``value * bins // 256``) and same
    channel-sum semantics as ``image_histograms(...).groupBy(id, bin)``
    — equivalence is pinned by a test, and the image-KNN DuckDB oracle
    still value-checks decode -> featurize -> search end to end.
    Cosine downstream is scale-invariant, so the raw counts are the
    vector (no normalization step to disagree over)."""
    import numpy as np

    from .multimodal import gif_decode_pixels, png_decode_pixels

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("v", ArrayType(DoubleType())),
        ]
    )

    def vec_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode_pixels

        for pdf in batches:
            ids = []
            vecs = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dec = (
                    png_decode_pixels(b)
                    or gif_decode_pixels(b)
                    or jpeg_decode_pixels(b)
                )
                if dec is None:
                    continue
                h, w, nch, px = dec
                binned = (px.astype(np.int64) * bins) // 256
                counts = np.bincount(binned.ravel(), minlength=bins)
                ids.append(rid)
                vecs.append(counts.astype(np.float64).tolist())
            # explicit dtypes: an empty default-constructed frame gives
            # "v" float64 dtype, which Arrow can't cast to list<double>
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "v": pd.Series(vecs, dtype="object"),
                }
            )

    out = df.select(id_col, payload_col)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    return out.mapInPandas(vec_batches, schema=schema)


def build_image_hash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> None:
    """Write the durable image near-dup index: one parquet of
    ``(index_id, dhash)`` per already-ingested image — the image
    analogue of `operators/dedup.build_minhash_index`. ~16 bytes/image
    on disk; decode happens once at build time, never again at probe
    time (band keys are derived from the stored hash at probe time —
    cheaper than materializing ``bands`` rows per image in the
    index)."""
    hashed = image_hashes(df, id_col, payload_col).where(
        F.col("dhash").isNotNull()
    ).select(F.col(id_col).alias("index_id"), "dhash")
    hashed.write.mode("overwrite").parquet(path)


def incremental_image_near_dup_pairs(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Probe a NEW batch of images against the durable index
    (CDC-ingest shape, the image analogue of
    `dedup.incremental_near_dup_pairs`): hash the batch map-only,
    band-join against the stored hashes, exact ``bit_count`` verify —
    probe cost tracks the BATCH size, the corpus is only ever read as
    its 16-byte/image hash index. Complete recall at ``max_hamming <=
    bands - 1`` (pigeonhole). Returns (id, index_id, hamming)."""
    from .dedup import hamming_band_probe

    spark = batch.sparkSession
    idx = spark.read.parquet(index_path)
    probe = image_hashes(batch, id_col, payload_col).where(
        F.col("dhash").isNotNull()
    ).select(F.col(id_col), "dhash")
    return hamming_band_probe(
        probe, idx, id_col, "dhash",
        max_hamming=max_hamming, bands=bands,
    )
