"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested. PNG pixel decoding (stdlib zlib inflate +
per-scanline unfiltering), GIF frame decoding (pure-Python LZW +
palette expansion) and WAV PCM16 sample decoding (RIFF walk) are REAL
and dependency-free; ``decode_image`` uses the raster codecs natively
and falls back to Pillow for other formats when importable
(null-metadata rows for undecodable payloads — a corrupt image must
never kill a 100 TB stage), raising ``NotImplementedError`` only for
other formats without the library (``fake=True`` substitutes
deterministic pseudo-metadata so the pipeline shape can be exercised
regardless). ffmpeg-backed video frame sampling and model-backed
feature extraction remain honest stubs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 encoded text —
    in production this is the raw image/audio/video bytes from the
    lakehouse)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over the opaque payload: byte size,
    content digest. No decode, no Python."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder (CLEARLY FAKE):
    pseudo width/height/channels derived from the content digest."""
    d = hashlib.md5(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 4


def pil_available() -> bool:
    """Optional-dependency probe: True when Pillow is importable (it is
    NOT shipped in this container — the probe makes the real decode
    path light up automatically wherever the library exists)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False



def _png_header_meta(data: bytes):
    """(width, height, channels) from the IHDR alone — no inflate, no
    unfiltering. Channels reported AFTER palette expansion (3), the
    same convention the full decoder uses. None if not a PNG or the
    IHDR is malformed/unsupported."""
    if len(data) < 33 or bytes(data[:8]) != _PNG_SIG:
        return None
    if data[12:16] != b"IHDR":
        return None
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    bitdepth, colortype = data[24], data[25]
    nch = _PNG_CHANNELS.get(colortype)
    if bitdepth != 8 or nch is None or w <= 0 or h <= 0:
        return None
    return w, h, (3 if colortype == 3 else nch)


def _gif_header_meta(data: bytes):
    """(width, height, 3) from the first image descriptor — no LZW.
    Falls back to the logical-screen dimensions only when an image
    descriptor byte WAS seen but its block is truncated; a stream
    containing no image descriptor at all returns None (ADVICE r5:
    a truncated GIF with no image data must not report valid
    dimensions). None if not a GIF."""
    if len(data) < 13 or bytes(data[:6]) not in (b"GIF87a", b"GIF89a"):
        return None
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    truncated_descriptor = False
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b == 0x2C:
            if pos + 10 <= len(data):
                w = int.from_bytes(data[pos + 5 : pos + 7], "little")
                h = int.from_bytes(data[pos + 7 : pos + 9], "little")
                if w > 0 and h > 0:
                    return w, h, 3
                return None
            truncated_descriptor = True
        break
    if not truncated_descriptor:
        return None
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    return (w, h, 3) if w > 0 and h > 0 else None


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads into typed metadata via ``mapInPandas``
    (Arrow batches, one Python worker per partition — the production
    shape for CPU-bound media decode on a Spark cluster).

    Real path: PNG payloads decode NATIVELY via
    :func:`png_decode_pixels` (stdlib zlib + numpy, full pixel
    reconstruction) regardless of Pillow. Other formats use
    ``PIL.Image.open`` when importable (:func:`pil_available`);
    payloads Pillow cannot parse emit NULL dimensions instead of
    failing the job — at 100 TB a corrupt image must never kill a
    stage. A non-PNG payload with Pillow absent raises
    ``NotImplementedError`` at execution time (honest failure);
    ``fake=True`` substitutes :func:`_fake_decode` so tests exercise
    the full Spark plumbing either way.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = False
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                use_pil = True
            except Exception:
                pass
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if fake:
                    w, h, c = _fake_decode(data)
                    rows.append((rid, len(data), w, h, c))
                    continue
                # PNG/GIF metadata comes from the HEADER parsers —
                # O(header bytes), not a full pixel reconstruction
                # (pixel-level ops use png_pixel_stats/wav_audio_
                # features, which run the real codecs). A payload whose
                # MAGIC matches PNG/GIF but whose header is corrupt
                # emits a null-metadata row — never a stage-killing
                # raise ("a corrupt image must never kill a stage").
                from .jpeg import jpeg_header_meta

                meta = (
                    _png_header_meta(data)
                    or _gif_header_meta(data)
                    or jpeg_header_meta(data)
                )
                if meta is not None:
                    mw, mh, mc = meta
                    rows.append((rid, len(data), mw, mh, mc))
                    continue
                magic_img = (
                    bytes(data[:8]) == _PNG_SIG
                    or bytes(data[:6]) in (b"GIF87a", b"GIF89a")
                    or bytes(data[:2]) == b"\xff\xd8"
                )
                if not use_pil:
                    if magic_img:
                        # PNG/GIF magic but the native header parser
                        # rejected it, and no Pillow to retry with:
                        # metadata nulls, row survives.
                        rows.append((rid, len(data), None, None, None))
                        continue
                    # other formats without Pillow: the decoder
                    # genuinely cannot run — honest failure
                    raise NotImplementedError(
                        "non-PNG/GIF image decoding requires PIL/libvips"
                        " — not available in this environment; PNG and"
                        " GIF decode natively, or pass fake=True for"
                        " the stub"
                    )
                # Pillow is importable: PNG/GIF payloads the native
                # header parser rejects (bit depths 1/2/4/16, exotic
                # color types) are often still VALID — let Pillow try
                # before emitting the null row (ADVICE r5).
                try:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(data)) as img:
                        rows.append(
                            (
                                rid,
                                len(data),
                                int(img.width),
                                int(img.height),
                                len(img.getbands()),
                            )
                        )
                except Exception:
                    # undecodable payload: metadata nulls, row survives
                    rows.append((rid, len(data), None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_META_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODED_META_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset_bytes", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling for video/audio payloads: one payload row fans
    out to ``n_frames`` rows of (frame index, byte offset, frame
    bytes) via ``mapInPandas`` — the 1:N batch shape a real ffmpeg
    sampler produces, with output partitioning inherited from the
    payload partitions so downstream per-frame UDFs parallelize
    without a shuffle.

    REAL for AVI payloads (round 6): the stdlib RIFF walk
    (:func:`_avi_scan`) locates the frame chunks, ``n_frames`` evenly
    spaced frames are decoded, and each is re-encoded as a standalone
    PNG (:func:`png_encode_pixels`) — real image bytes every
    downstream image operator decodes directly; ``frame_offset_bytes``
    is the frame chunk's true byte offset in the container, the
    seek-address a range-read would use at 100 TB. Compressed video
    still needs ffmpeg: with ``fake=False`` a non-AVI payload raises
    ``NotImplementedError`` (honest failure), and ``fake=True`` keeps
    the deterministic byte-window stub for plumbing tests."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not data:
                    continue
                if fake:
                    step = max(len(data) // n_frames, 1)
                    for i in range(min(n_frames, len(data))):
                        off = i * step
                        rows.append((rid, i, off, data[off : off + step]))
                    continue
                scan = _avi_scan(data)
                if scan is None:
                    raise NotImplementedError(
                        "compressed-video frame sampling requires"
                        " ffmpeg/pyav — uncompressed AVI samples"
                        " natively; pass fake=True for the byte-window"
                        " stub"
                    )
                w, h, _bpp, comp, frames = scan
                frame_at = (
                    _mjpeg_frame_at if comp == b"MJPG" else _avi_frame_at
                )
                n_total = len(frames)
                take = min(n_frames, n_total)
                for i in range(take):
                    fi = (i * n_total) // take
                    off, ln = frames[fi]
                    px = frame_at(data, w, h, off, ln)
                    if px is None:
                        continue  # short chunk: skip, never kill
                    rows.append(
                        (rid, fi, off, png_encode_pixels(px, 2))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        sample_batches, schema=FRAME_SCHEMA
    )


def extract_features(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Feature extraction over opaque payloads: one ``array<float>``
    embedding per payload via ``mapInPandas`` — the shape a CLIP/CNN
    encoder stage has on a Spark cluster (Arrow batches in, fixed-dim
    vectors out, partitioning preserved so the downstream similarity
    ops run without a shuffle).

    STUB: a real encoder needs a model runtime, absent here.
    ``fake=True`` derives a deterministic unit vector from the content
    digest (identical payloads -> identical features, so dedup /
    similarity plumbing is exercisable end-to-end); ``fake=False``
    raises at execution time.
    """
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime — not"
                    " available here; pass fake=True for the digest stub"
                )
            ids, vecs = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                seed = int.from_bytes(
                    hashlib.md5(bytes(payload)).digest()[:8], "big"
                )
                v = np.random.default_rng(seed).standard_normal(dim)
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype("float32").tolist())
                ids.append(rid)
            yield pd.DataFrame({id_col: ids, "features": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        encode_batches, schema=schema
    )


def resize_meta(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize planning over decoded metadata — pure JVM arithmetic
    (aspect-preserving scale factor + letterbox padding), no pixel
    work: the part of a resize stage that is NOT the stubbed decoder.
    Feeds the real resize UDF its per-image geometry at scale."""
    scale = F.least(
        F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
    )
    return (
        decoded.withColumn("scale", F.round(scale, 6))
        .withColumn("out_w", F.round(F.col("width") * scale).cast("int"))
        .withColumn("out_h", F.round(F.col("height") * scale).cast("int"))
        .withColumn(
            "pad_x", ((F.lit(target_w) - F.col("out_w")) / 2).cast("int")
        )
        .withColumn(
            "pad_y", ((F.lit(target_h) - F.col("out_h")) / 2).cast("int")
        )
    )


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL aspect-preserving letterbox resize over the native
    decoders (round 6 — `resize_meta` was the geometry-only half):
    decode PNG/GIF/JPEG, nearest-neighbor resample onto a
    ``target_h x target_w`` zero-padded canvas (image centered), and
    re-encode as PNG — one Arrow-batched map-only pass, the tensor-
    prep stage in front of any vision encoder.

    Geometry is INTEGER-EXACT (engine-portable, no float round):
    width-limited when ``target_w * h <= target_h * w``, then
    ``out_w = target_w`` and ``out_h = (2*h*target_w + w) // (2*w)``
    (HALF_UP of ``h * target_w / w`` for positive rationals) — and
    symmetrically otherwise; the sample map is ``src[(i*h)//out_h,
    (j*w)//out_w]``. Every step is integer arithmetic, so a SQL
    oracle recomputes the resized pixel statistics from a closed-form
    source corpus without decoding. Undecodable payloads emit a
    null-payload row (never a stage kill). Output:
    ``(id, width, height, channels, payload)``."""
    import numpy as np

    from .jpeg import jpeg_decode_pixels

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField(payload_col, BinaryType()),
        ]
    )
    _CT = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG colortype

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
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
                    rows.append((rid, None, None, None, None))
                    continue
                h, w, nch, px = dec
                if target_w * h <= target_h * w:  # width-limited
                    out_w = target_w
                    out_h = max(1, (2 * h * target_w + w) // (2 * w))
                else:
                    out_h = target_h
                    out_w = max(1, (2 * w * target_h + h) // (2 * h))
                pad_x = (target_w - out_w) // 2
                pad_y = (target_h - out_h) // 2
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                canvas = np.zeros(
                    (target_h, target_w, nch), dtype=np.uint8
                )
                canvas[
                    pad_y : pad_y + out_h, pad_x : pad_x + out_w
                ] = px[np.ix_(yi, xi)]
                rows.append(
                    (
                        rid,
                        target_w,
                        target_h,
                        nch,
                        png_encode_pixels(canvas, _CT[nch]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    out = df.select(id_col, payload_col)
    if not out.isStreaming:
        from .dedup import _fanout

        out = _fanout(out)
    return out.mapInPandas(resize_batches, schema=out_schema)


# ---------------------------------------------------------------------------
# Pure-Python PNG pixel codec (stdlib zlib + numpy — no Pillow).
# Closes the "pixel decode is environment-limited" gap: REAL pixel
# reconstruction (zlib inflate + per-scanline unfiltering, filters
# 0-4, color types 0/2/3/4/6 at bit depth 8) with nothing beyond the
# standard library. Cites: PNG spec (RFC 2083 / ISO 15948) filter
# algorithms; reference repo has no media surface (multimodal ops are
# this engine's training-pipeline extension).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode_pixels(data: bytes):
    """Decode a (non-interlaced, bit-depth-8) PNG into
    ``(height, width, channels, uint8 ndarray[h, w, channels])`` using
    only stdlib zlib + numpy. Palette images (color type 3) expand
    through their PLTE to RGB. Returns None for anything that is not a
    PNG this codec covers (a corrupt image must never kill a stage —
    callers emit null metadata instead)."""
    import zlib

    import numpy as np

    if not isinstance(data, (bytes, bytearray)) or not bytes(
        data[:8]
    ) == _PNG_SIG:
        return None
    data = bytes(data)
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bitdepth, colortype, comp, filt, interlace = ihdr[8:13]
    nch = _PNG_CHANNELS.get(colortype)
    if (
        bitdepth != 8
        or nch is None
        or comp != 0
        or filt != 0
        or interlace != 0
        or w <= 0
        or h <= 0
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * nch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(h):
        f = raw[at]
        at += 1
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=at
        ).copy()
        at += stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up (vectorized; uint8 wraps mod 256 by design)
            cur = line + prev
        elif f == 1:  # Sub (sequential in x)
            cur = line
            for x in range(nch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
        elif f == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                cur[x] = (int(line[x]) + _paeth(a, b, c)) & 0xFF
        else:
            return None
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, nch)
    if colortype == 3:
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max()) >= pal.shape[0]:
            return None
        px = pal[px[:, :, 0]]
        nch = 3
    return h, w, nch, px


def png_encode_pixels(px, colortype: int, row_filters=None) -> bytes:
    """Encode a uint8 ndarray[h, w, channels] as a PNG (bit depth 8,
    no interlace), applying the given PNG filter type per scanline
    (default 0). The encode-side filter is the exact inverse of
    :func:`png_decode_pixels`'s unfilter, so round-trips are
    bit-exact — used by the synth corpus and the golden tests to prove
    the decoder handles every filter type."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, nch = px.shape
    assert _PNG_CHANNELS.get(colortype) == nch and colortype != 3
    flat = px.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(row_filters[y]) if row_filters is not None else 0
        cur = flat[y]
        left = np.concatenate([np.zeros(nch, dtype=np.int32), cur[:-nch]])
        upleft = np.concatenate([np.zeros(nch, dtype=np.int32), prev[:-nch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            pred = np.array(
                [
                    _paeth(int(left[x]), int(prev[x]), int(upleft[x]))
                    for x in range(stride)
                ],
                dtype=np.int32,
            )
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


PNG_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_px", LongType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


def png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL pixel-level statistics over PNG, GIF or baseline-JPEG
    payloads — full
    zlib/LZW/Huffman+IDCT reconstruction per image, no imaging library. Arrow-batched
    mapInPandas, one worker per partition (the production shape for
    CPU-bound media decode); undecodable payloads emit null stats and
    the row survives. The worker emits INTEGERS only (exact sum, min,
    max — no float accumulation); the mean rounds in Catalyst, whose
    HALF_UP matches the SQL oracle (Python's round() is banker's and
    would flip exact .5e-7 ties like s/128)."""

    # output schema follows the caller's id column name (a composite
    # surrogate key is a legitimate id — e.g. the frame-sampling query
    # keys stats by doc_id * 16 + frame_idx)
    out_schema = StructType(
        [StructField(id_col, LongType())] + PNG_PIXEL_STATS_SCHEMA.fields[1:]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode_pixels

        rows = []
        for pdf in batches:
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                dec = (
                    png_decode_pixels(b)
                    or gif_decode_pixels(b)
                    or jpeg_decode_pixels(b)
                )
                if dec is None:
                    rows.append(
                        (rid, None, None, None, None, None, None, None)
                    )
                    continue
                h, w, nch, px = dec
                n = int(px.size)
                s = int(px.astype("int64").sum())
                rows.append(
                    (rid, w, h, nch, n, s, int(px.min()), int(px.max()))
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in out_schema.fields]
        )

    raw = df.select(id_col, payload_col).mapInPandas(
        stats, schema=out_schema
    )
    return raw.select(
        id_col,
        "width",
        "height",
        "channels",
        "n_px",
        "sum_px",
        F.round(F.col("sum_px") / F.col("n_px"), 6).alias("mean_px"),
        "min_px",
        "max_px",
    )


# the stats operator accepts PNG **or** GIF payloads; this alias names
# that contract without breaking the original import path
raster_pixel_stats = png_pixel_stats


def synthesize_png_corpus(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic real-PNG payload per row: geometry,
    color type, per-scanline filter and every pixel value are pure
    functions of the id (pixel (y, x, c) = (id*7 + y*13 + x*3 + c*29)
    mod 256; filter (id + y) mod 5 — every PNG filter type appears in
    the corpus). Because the pattern is closed-form, a SQL oracle can
    recompute the exact pixel statistics WITHOUT decoding — the
    encode -> inflate -> unfilter -> stats path is value-checked end
    to end."""
    import numpy as np

    out_fields = list(df.schema.fields) + [
        StructField(payload_col, BinaryType())
    ]
    out_schema = StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                w, h = 4 + d % 5, 3 + d % 4
                colortype = (0, 2, 6)[d % 3]
                nch = _PNG_CHANNELS[colortype]
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(nch), indexing="ij"
                )
                px = ((d * 7 + y * 13 + x * 3 + c * 29) % 256).astype(
                    "uint8"
                )
                filters = [(d + yy) % 5 for yy in range(h)]
                payloads.append(
                    png_encode_pixels(px, colortype, filters)
                )
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


def png_dimensions(payload: "F.Column"):
    """REAL image-dimension extraction for PNG payloads in PURE
    CATALYST — no Python, no imaging library: a PNG is an 8-byte
    signature followed by the IHDR chunk whose big-endian width/height
    live at byte offsets 17-20 / 21-24. ``conv(hex(substring(...)))``
    decodes the big-endian ints inside whole-stage codegen, so header
    scanning 10^9 stored images is a map-only scan-speed pass (the
    pixel DECODE still needs Pillow — `decode_image` — but the
    dimension/aspect filters a curation pipeline applies first don't).
    Returns (width, height) columns, null for non-PNG payloads."""
    is_png = F.hex(F.substring(payload, 1, 8)) == F.lit("89504E470D0A1A0A")
    w = F.conv(F.hex(F.substring(payload, 17, 4)), 16, 10).cast("int")
    h = F.conv(F.hex(F.substring(payload, 21, 4)), 16, 10).cast("int")
    return (
        F.when(is_png, w).alias("png_width"),
        F.when(is_png, h).alias("png_height"),
    )


def jpeg_dimensions(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL JPEG dimension extraction via marker-walk (SOFn segments
    carry big-endian height/width at offsets 5/7 of their payload).
    JPEG's variable-length segment structure needs an actual scanner,
    so this is an Arrow-batched ``mapInPandas`` over the payload —
    still a map-only pass (no shuffle), reading only the first few KB
    of each blob in practice. Non-JPEG / truncated payloads yield
    nulls. Complements :func:`png_dimensions` (pure Catalyst)."""
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("jpeg_width", IntegerType()),
            StructField("jpeg_height", IntegerType()),
        ]
    )

    _SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

    def dims(payload) -> tuple:
        if payload is None:
            return (None, None)
        b = bytes(payload)
        if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
            return (None, None)
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return (None, None)
            # skip 0xFF fill-byte padding between segments (ADVICE r3:
            # the spec allows any number of fill 0xFFs before a marker)
            while i + 9 < len(b) and b[i + 1] == 0xFF:
                i += 1
            marker = b[i + 1]
            # standalone markers carry no length field: TEM (0x01) and
            # RST0-7 (0xD0-0xD7) — advance past the 2 marker bytes
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in _SOF:
                h = (b[i + 5] << 8) | b[i + 6]
                w = (b[i + 7] << 8) | b[i + 8]
                return (w, h)
            if marker == 0xD9:  # EOI before any SOF
                return (None, None)
            seg_len = (b[i + 2] << 8) | b[i + 3]
            if seg_len < 2:
                return (None, None)
            i += 2 + seg_len
        return (None, None)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs = [], []
            for payload in pdf[payload_col]:
                w, h = dims(payload)
                ws.append(w)
                hs.append(h)
            pdf = pdf.copy()
            pdf["jpeg_width"] = pd.array(ws, dtype="Int32")
            pdf["jpeg_height"] = pd.array(hs, dtype="Int32")
            yield pdf

    return df.mapInPandas(scan, schema)


def _le16(payload, pos: int):
    """Little-endian uint16 at 1-indexed byte position, as a Catalyst
    int Column (two single-byte hex converts — stays in codegen)."""
    lo = F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("int")
    hi = F.conv(F.hex(F.substring(payload, pos + 1, 1)), 16, 10).cast("int")
    return lo + hi * 256


def _le24(payload, pos: int):
    """Little-endian uint24 at 1-indexed byte position (Catalyst)."""
    return _le16(payload, pos) + F.conv(
        F.hex(F.substring(payload, pos + 2, 1)), 16, 10
    ).cast("int") * 65536


def _le32(payload, pos: int):
    """Little-endian uint32 at 1-indexed byte position (Catalyst)."""
    return _le16(payload, pos).cast("bigint") + _le16(
        payload, pos + 2
    ).cast("bigint") * 65536


def bmp_dimensions(payload):
    """PURE-CATALYST BMP dimensions: signature ``BM``, then
    BITMAPINFOHEADER biWidth / biHeight as int32 LE at file offsets
    18 / 22 (1-indexed 19 / 23). biHeight is SIGNED — negative for
    top-down DIBs — so heights past 2^31 wrap to their absolute
    value. Returns (bmp_width, bmp_height) Columns, null for non-BMP
    payloads; map-only codegen like :func:`gif_dimensions`."""
    is_bmp = F.substring(payload, 1, 2).cast("string") == "BM"
    w = _le32(payload, 19)
    h_raw = _le32(payload, 23)
    h = F.when(
        h_raw >= F.lit(2147483648), F.lit(4294967296) - h_raw
    ).otherwise(h_raw)
    return (
        F.when(is_bmp, w.cast("int")).alias("bmp_width"),
        F.when(is_bmp, h.cast("int")).alias("bmp_height"),
    )


def gif_dimensions(payload):
    """PURE-CATALYST GIF logical-screen dimensions: signature
    ``GIF87a``/``GIF89a`` then width/height as little-endian uint16 at
    byte offsets 6/8 (GIF89a spec §18). Returns two Column expressions
    (null for non-GIF payloads) — header scanning 10^9 stored images
    stays a map-only whole-stage-codegen pass, like
    :func:`png_dimensions`."""
    sig = F.substring(payload, 1, 6).cast("string")
    is_gif = sig.isin("GIF87a", "GIF89a")
    return (
        F.when(is_gif, _le16(payload, 7)).alias("gif_width"),
        F.when(is_gif, _le16(payload, 9)).alias("gif_height"),
    )


def webp_dimensions(payload):
    """PURE-CATALYST WebP dimensions for all three container layouts
    (RIFF....WEBP, then):

    - ``VP8X`` (extended): canvas width-1 / height-1 as uint24 LE at
      chunk-payload offsets 4/7 (bytes 24/27 of the file);
    - ``VP8 `` (lossy): 14-bit width/height at frame-header offsets
      6/8 behind the 0x9D012A start code (bytes 26/28), masked 0x3FFF;
    - ``VP8L`` (lossless): signature byte 0x2F then width-1 as 14 bits
      from byte 21 LSB-first, height-1 as the following 14 bits.

    Returns (webp_width, webp_height) Columns, null for non-WebP
    payloads. All bit math is integer arithmetic on single-byte
    ``conv(hex(...))`` extractions — map-only, codegen-friendly."""
    def byte(pos):
        return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("int")

    is_riff_webp = (
        (F.substring(payload, 1, 4).cast("string") == "RIFF")
        & (F.substring(payload, 9, 4).cast("string") == "WEBP")
    )
    fourcc = F.substring(payload, 13, 4).cast("string")

    # VP8X: canvas size = stored uint24 + 1
    vp8x_w = _le24(payload, 25) + 1
    vp8x_h = _le24(payload, 28) + 1

    # VP8 (lossy): validate the 9D 01 2A start code at bytes 24-26
    vp8_sync = (
        (byte(24) == 0x9D) & (byte(25) == 0x01) & (byte(26) == 0x2A)
    )
    vp8_w = _le16(payload, 27).bitwiseAND(F.lit(0x3FFF))
    vp8_h = _le16(payload, 29).bitwiseAND(F.lit(0x3FFF))

    # VP8L: signature byte 0x2F at byte 21, then two 14-bit fields
    vp8l_sig = byte(21) == 0x2F
    b1, b2, b3, b4 = byte(22), byte(23), byte(24), byte(25)
    vp8l_w = b1 + (b2.bitwiseAND(F.lit(0x3F)) * 256) + 1
    vp8l_h = (
        F.shiftright(b2, 6)
        + (b3 * 4)
        + (b4.bitwiseAND(F.lit(0x0F)) * 1024)
        + 1
    )

    w = (
        F.when(fourcc == "VP8X", vp8x_w)
        .when((fourcc == "VP8 ") & vp8_sync, vp8_w)
        .when((fourcc == "VP8L") & vp8l_sig, vp8l_w)
    )
    h = (
        F.when(fourcc == "VP8X", vp8x_h)
        .when((fourcc == "VP8 ") & vp8_sync, vp8_h)
        .when((fourcc == "VP8L") & vp8l_sig, vp8l_h)
    )
    return (
        F.when(is_riff_webp, w).alias("webp_width"),
        F.when(is_riff_webp, h).alias("webp_height"),
    )


def jpeg_exif_orientation(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """EXIF orientation (tag 0x0112, values 1-8) from the JPEG APP1
    segment: marker-walk to ``Exif\\x00\\x00``, honor the TIFF byte
    order (``II``/``MM``), scan IFD0's 12-byte entries. Arrow-batched
    ``mapInPandas`` like :func:`jpeg_dimensions` — map-only, reads only
    the header region. Null where no valid APP1/EXIF/orientation
    exists."""
    schema = StructType(
        list(df.schema.fields)
        + [StructField("exif_orientation", IntegerType())]
    )

    def orientation(payload) -> "int | None":
        if payload is None:
            return None
        b = bytes(payload)
        if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
            return None
        i = 2
        while i + 4 < len(b):
            if b[i] != 0xFF:
                return None
            while i + 4 < len(b) and b[i + 1] == 0xFF:
                i += 1
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xD9, 0xDA):  # EOI / image data: no APP1
                return None
            seg_len = (b[i + 2] << 8) | b[i + 3]
            if seg_len < 2:
                return None
            if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
                t = i + 10  # TIFF header start
                if t + 8 > len(b):
                    return None
                order = b[t : t + 2]
                if order == b"II":
                    dec = lambda lo, n: int.from_bytes(
                        b[lo : lo + n], "little"
                    )
                elif order == b"MM":
                    dec = lambda lo, n: int.from_bytes(b[lo : lo + n], "big")
                else:
                    return None
                if dec(t + 2, 2) != 42:
                    return None
                ifd = t + dec(t + 4, 4)
                if ifd + 2 > len(b):
                    return None
                n_entries = dec(ifd, 2)
                for e in range(n_entries):
                    lo = ifd + 2 + 12 * e
                    if lo + 12 > len(b):
                        return None
                    if dec(lo, 2) == 0x0112:  # orientation, SHORT
                        val = dec(lo + 8, 2)
                        return val if 1 <= val <= 8 else None
                return None
            i += 2 + seg_len
        return None

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["exif_orientation"] = pd.array(
                [orientation(p) for p in pdf[payload_col]], dtype="Int32"
            )
            yield pdf

    return df.mapInPandas(scan, schema)


# ---------------------------------------------------------------------------
# Pure-Python WAV (RIFF PCM16) codec — the audio analogue of the PNG
# codec above: real sample decoding with nothing beyond the stdlib.
# ---------------------------------------------------------------------------


def wav_encode_pcm16(samples, sample_rate: int) -> bytes:
    """Encode int16 ndarray[frames, channels] as a canonical RIFF/WAVE
    PCM16 file (little-endian interleaved)."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    n_frames, ch = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode_samples(data: bytes):
    """Decode a RIFF/WAVE PCM16 payload into
    ``(sample_rate, channels, n_frames, int16 ndarray[frames, ch])``
    with stdlib struct + numpy. Returns None for non-WAV / compressed
    / non-16-bit payloads (corrupt audio must never kill a stage)."""
    import struct

    import numpy as np

    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 12
        or bytes(data[:4]) != b"RIFF"
        or bytes(data[8:12]) != b"WAVE"
    ):
        return None
    data = bytes(data)
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"fmt ":
            fmt = chunk
        elif typ == b"data":
            pcm = chunk
        pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    if fmt is None or pcm is None or len(fmt) < 16:
        return None
    audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16 or ch < 1:
        return None
    n = len(pcm) // (2 * ch)
    if n == 0:
        return None
    arr = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return int(rate), int(ch), int(n), arr


WAV_SAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sum_s", LongType()),
        StructField("min_s", IntegerType()),
        StructField("max_s", IntegerType()),
    ]
)


def wav_sample_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL PCM sample statistics over WAV payloads (full sample
    reconstruction, stdlib-only). Integer sum/min/max are exact; the
    mean rounds in Catalyst (HALF_UP — matches the SQL oracle, unlike
    Python's banker's round). Undecodable payloads emit null stats."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = wav_decode_samples(bytes(payload))
                if dec is None:
                    rows.append((rid, None, None, None, None, None, None))
                    continue
                rate, ch, n, arr = dec
                rows.append(
                    (
                        rid,
                        rate,
                        ch,
                        n,
                        int(arr.astype("int64").sum()),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in WAV_SAMPLE_STATS_SCHEMA.fields]
        )

    raw = df.select(id_col, payload_col).mapInPandas(
        stats, schema=WAV_SAMPLE_STATS_SCHEMA
    )
    return raw.select(
        id_col,
        "sample_rate",
        "channels",
        "n_frames",
        "sum_s",
        F.round(
            F.col("sum_s") / (F.col("n_frames") * F.col("channels")), 6
        ).alias("mean_s"),
        "min_s",
        "max_s",
    )


def synthesize_wav_corpus(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic real-WAV payload per row: sample rate,
    channel count, frame count and every PCM sample are closed-form in
    the id (sample(i, c) = ((id*31 + i*17 + c*101) mod 4001) - 2000),
    so a SQL oracle recomputes exact sample statistics without
    decoding — value-checking the RIFF walk + PCM reconstruction end
    to end."""
    import numpy as np

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                rate = 8000 + (d % 3) * 4000
                ch = 1 + d % 2
                nf = 16 + d % 16
                i, c = np.meshgrid(
                    np.arange(nf), np.arange(ch), indexing="ij"
                )
                arr = ((d * 31 + i * 17 + c * 101) % 4001 - 2000).astype(
                    "<i2"
                )
                payloads.append(wav_encode_pcm16(arr, rate))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


# ---------------------------------------------------------------------------
# Pure-Python GIF codec (LZW decode/encode, stdlib only) — the
# palette-raster sibling of the PNG codec: real pixel reconstruction
# for GIF87a/89a, first frame, non-interlaced.
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes):
    """GIF-flavor LZW: variable code width starting min+1, CLEAR
    resets the table, EOI terminates. Returns list of index bytes or
    None on a malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table = None
    width = min_code_size + 1
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if table is None:
                return None
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real LZW encoder (dictionary growth up to 12 bits, CLEAR on
    overflow) — exercises the decoder's table-building path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_decode_pixels(data: bytes):
    """Decode the FIRST frame of a non-interlaced GIF into
    ``(height, width, 3, uint8 RGB ndarray)`` with a pure-Python LZW
    inflater — no imaging library. Returns None for non-GIF,
    interlaced, or malformed payloads."""
    import numpy as np

    if not isinstance(data, (bytes, bytearray)) or bytes(data[:6]) not in (
        b"GIF87a",
        b"GIF89a",
    ):
        return None
    data = bytes(data)
    if len(data) < 13:
        return None
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        pos += n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return None
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            return None
        # image descriptor
        if pos + 10 > len(data):
            return None
        w = int.from_bytes(data[pos + 5 : pos + 7], "little")
        h = int.from_bytes(data[pos + 7 : pos + 9], "little")
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x40:  # interlaced: unsupported
            return None
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            pal = data[pos : pos + n]
            pos += n
        if pal is None or w <= 0 or h <= 0 or pos >= len(data):
            return None
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(min_code, bytes(lzw))
        if idx is None or len(idx) < w * h:
            return None
        arr = np.frombuffer(idx, dtype=np.uint8, count=w * h).reshape(h, w)
        palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(arr.max()) >= palette.shape[0]:
            return None
        return h, w, 3, palette[arr]
    return None


def gif_encode_pixels(indices, palette, loop_ext: bool = False) -> bytes:
    """Encode an index matrix + RGB palette as a GIF89a (global color
    table, one frame, real LZW). ``palette`` rows must be a power of
    two >= 2."""
    import numpy as np

    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    psize = palette.shape[0]
    assert psize >= 2 and (psize & (psize - 1)) == 0
    depth = psize.bit_length() - 1  # log2
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1) & 0x07, 0, 0])
    out += palette.tobytes()
    if loop_ext:  # a skippable application extension (tests the walk)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    min_code = max(2, depth)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, indices.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def synthesize_gif_corpus(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic real-GIF payload per row: geometry,
    palette size, every palette entry and every index are closed-form
    in the id (palette[i][c] = (i*37 + c*11 + id) mod 256, index(y, x)
    = (id*3 + y*5 + x*7) mod psize) — so a SQL oracle recomputes exact
    pixel statistics without running LZW. Every payload round-trips
    through the real LZW encoder/decoder pair."""
    import numpy as np

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                psize = (4, 8, 16)[d % 3]
                w, h = 3 + d % 6, 2 + d % 5
                i, c = np.meshgrid(
                    np.arange(psize), np.arange(3), indexing="ij"
                )
                pal = ((i * 37 + c * 11 + d) % 256).astype(np.uint8)
                y, x = np.meshgrid(
                    np.arange(h), np.arange(w), indexing="ij"
                )
                idx = ((d * 3 + y * 5 + x * 7) % psize).astype(np.uint8)
                payloads.append(
                    gif_encode_pixels(idx, pal, loop_ext=bool(d % 2))
                )
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("channels", IntegerType()),
        StructField("sum_sq", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def wav_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio features from decoded PCM: energy (exact int64 sum
    of squared samples; RMS derived in Catalyst) and zero-crossing
    rate (strict sign flips per channel, summed) — the classic cheap
    speech/noise discriminators a corpus-quality pipeline computes
    before any model inference. Arrow-batched mapInPandas over
    :func:`wav_decode_samples`; undecodable payloads emit nulls."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = wav_decode_samples(bytes(payload))
                if dec is None:
                    rows.append((rid, None, None, None, None))
                    continue
                _rate, ch, n, arr = dec
                a = arr.astype("int64")
                zc = int(((a[:-1, :] * a[1:, :]) < 0).sum()) if n > 1 else 0
                rows.append((rid, n, ch, int((a * a).sum()), zc))
        yield pd.DataFrame(
            rows, columns=[f.name for f in WAV_FEATURES_SCHEMA.fields]
        )

    raw = df.select(id_col, payload_col).mapInPandas(
        feats, schema=WAV_FEATURES_SCHEMA
    )
    return raw.select(
        id_col,
        "n_frames",
        "channels",
        "sum_sq",
        F.round(
            F.sqrt(
                F.col("sum_sq") / (F.col("n_frames") * F.col("channels"))
            ),
            6,
        ).alias("rms"),
        "zero_crossings",
    )


# ---------------------------------------------------------------------------
# Pure-Python AVI codec (RIFF container; uncompressed 24-bit DIB and
# MJPEG streams, stdlib only) — the VIDEO sibling of the PNG/GIF/WAV
# codecs: real container walk + raster reconstruction, no ffmpeg.
# Covers the uncompressed ('00db'/DIB) stream a synthetic corpus or a
# raw capture pipeline produces, and (round 7) the MJPEG ('00dc',
# biCompression 'MJPG') stream real capture hardware / archival
# pipelines produce — each frame is a standalone baseline JPEG,
# decoded by `operators/jpeg.py`. Inter-frame-compressed codecs
# (H.264 etc.) remain the documented NotImplementedError (they
# genuinely need ffmpeg/pyav).
# ---------------------------------------------------------------------------


def avi_encode_frames(frames, fps: int = 10) -> bytes:
    """Encode ``uint8 ndarray[n, h, w, 3]`` (RGB) as a canonical AVI:
    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    LIST('movi' '00db'...)). Frames are stored as standard DIBs —
    bottom-up rows, BGR, stride padded to 4 bytes."""
    import struct

    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _c = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(tag: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", tag + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # us per frame
        frame_bytes * fps,  # max bytes/sec
        0, 0x10,  # padding, flags (HASINDEX off)
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    movi_payload = b""
    for f in range(n):
        rgb = frames[f]
        bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        row = np.zeros((h, stride), dtype=np.uint8)
        row[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_payload += chunk(b"00db", row.tobytes())
    body = (
        b"AVI "
        + lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        + lst(b"movi", movi_payload)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def mjpeg_encode_frames(frames, fps: int = 10) -> bytes:
    """Encode ``uint8 ndarray[n, h, w]`` (grayscale) or
    ``[n, h, w, 3]`` (RGB) as an MJPEG AVI: same RIFF layout as
    :func:`avi_encode_frames` but stream fourcc / biCompression
    'MJPG' and each '00dc' chunk a standalone baseline JFIF JPEG
    (:func:`..jpeg.jpeg_encode_pixels`) — the compressed-video shape
    capture hardware and archival pipelines actually emit, closable
    here with zero dependencies because the repo carries its own
    baseline JPEG codec."""
    import struct

    import numpy as np

    from .jpeg import jpeg_encode_pixels

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim < 3 or frames.shape[0] == 0:
        raise ValueError("mjpeg_encode_frames: at least one frame required")
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(tag: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", tag + payload)

    jpegs = [jpeg_encode_pixels(frames[f]) for f in range(n)]
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),
        max_bytes * fps,
        0, 0x10,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n,
        max_bytes, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
        max_bytes, 0, 0, 0, 0,
    )
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    body = (
        b"AVI "
        + lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        + lst(b"movi", movi_payload)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _avi_scan(data: bytes):
    """RIFF walk shared by the decoder and the frame sampler:
    ``(width, height, bpp, compression_fourcc,
    [(chunk_offset, chunk_len), ...])`` for an AVI payload, None for
    non-AVI/malformed. ``compression_fourcc`` is the strf
    biCompression field as 4 raw bytes (all-zero = uncompressed
    DIB, b'MJPG' = motion JPEG)."""
    import struct

    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 12
        or bytes(data[:4]) != b"RIFF"
        or bytes(data[8:12]) != b"AVI "
    ):
        return None
    data = bytes(data)

    w = h = bpp = None
    comp = b"\x00\x00\x00\x00"
    frames = []

    def walk(pos: int, end: int) -> bool:
        nonlocal w, h, bpp, comp
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
            payload_end = pos + 8 + ln
            if payload_end > end:
                return False
            if tag == b"LIST":
                if not walk(pos + 12, payload_end):
                    return False
            elif tag == b"strf" and ln >= 40:
                _sz, bw, bh, _pl, bits = struct.unpack(
                    "<IiiHH", data[pos + 8 : pos + 24]
                )
                w, h, bpp = int(bw), abs(int(bh)), int(bits)
                comp = data[pos + 24 : pos + 28]
            elif tag[2:4] in (b"db", b"dc") and tag[:2].isdigit():
                frames.append((pos + 8, ln))
            pos = payload_end + (ln & 1)
        return True

    if not walk(12, len(data)):
        return None
    if w is None or w <= 0 or h <= 0 or not frames:
        return None
    if comp != b"MJPG" and (bpp != 24 or any(comp)):
        return None  # inter-frame codecs: not decodable here
    return w, h, bpp, comp, frames


def _avi_frame_at(data: bytes, w: int, h: int, off: int, ln: int):
    """One DIB frame -> uint8 ndarray[h, w, 3] (RGB), or None when the
    chunk is short."""
    import numpy as np

    stride = (w * 3 + 3) & ~3
    if ln < stride * h:
        return None
    raw = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]  # undo bottom-up + BGR


def _mjpeg_frame_at(data: bytes, w: int, h: int, off: int, ln: int):
    """One MJPEG ('00dc') frame -> uint8 ndarray[h, w, 3] (RGB), or
    None when the embedded JPEG is malformed or disagrees with the
    container header dims. Grayscale JPEGs replicate to 3 channels so
    every downstream frame consumer sees one raster shape."""
    from .jpeg import jpeg_decode_pixels

    dec = jpeg_decode_pixels(bytes(data[off : off + ln]))
    if dec is None:
        return None
    jh, jw, nch, px = dec
    if jh != h or jw != w:
        return None
    if nch == 1:
        import numpy as np

        px = np.repeat(px, 3, axis=2)
    return px


def avi_decode_frames(data: bytes):
    """Decode an uncompressed 24-bit or MJPEG AVI into
    ``(width, height, n_frames, uint8 ndarray[n, h, w, 3])`` — RIFF
    walk with stdlib struct + numpy; MJPEG frames go through the
    pure-Python baseline JPEG decoder (`operators/jpeg.py`). Returns
    None for non-AVI, inter-frame-compressed, or malformed payloads
    (corrupt video must never kill a stage)."""
    import numpy as np

    scan = _avi_scan(data)
    if scan is None:
        return None
    w, h, _bpp, comp, frames = scan
    data = bytes(data)
    mjpeg = comp == b"MJPG"
    out = []
    for off, ln in frames:
        frame = (
            _mjpeg_frame_at(data, w, h, off, ln)
            if mjpeg
            else _avi_frame_at(data, w, h, off, ln)
        )
        if frame is None:
            return None
        out.append(frame)
    return w, h, len(out), np.stack(out)


# ---------------------------------------------------------------------------
# BMP codec (round 9): uncompressed 24-bit BI_RGB DIBs — the simplest
# real raster container, and the one whose decode bugs are all
# LAYOUT bugs (BGR channel order, 4-byte row stride padding,
# bottom-up vs top-down row order). The stats query therefore emits
# per-channel sums (catches BGR swaps) and a positional weighted
# checksum (catches stride/row-order errors) — orientation-invariant
# whole-image sums alone would miss both.
# ---------------------------------------------------------------------------


def bmp_encode_rgb24(arr, topdown: bool = False) -> bytes:
    """Encode a logical-RGB uint8 array [h, w, 3] as a 24-bit BI_RGB
    BMP: BITMAPFILEHEADER + BITMAPINFOHEADER(40), rows padded to 4
    bytes, pixels stored B,G,R; bottom-up unless ``topdown`` (then
    biHeight is negative, per the DIB spec)."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = range(h) if topdown else range(h - 1, -1, -1)
    body = b"".join(
        arr[y, :, ::-1].tobytes() + pad for y in rows  # RGB -> BGR
    )
    bih = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if topdown else h, 1, 24, 0, stride * h,
        2835, 2835, 0, 0,
    )
    bfh = struct.pack("<2sIHHI", b"BM", 14 + 40 + stride * h, 0, 0, 54)
    return bfh + bih + body


def bmp_decode_pixels(data: bytes):
    """Decode a 24-bit BI_RGB BMP into
    ``(width, height, topdown, uint8 ndarray[h, w, 3] logical RGB)``
    — stdlib struct + numpy, honoring the pixel-array offset, row
    stride padding, BGR order, and both row orders. Returns None for
    non-BMP / compressed / non-24-bit payloads (corrupt images must
    never kill a stage)."""
    import struct

    import numpy as np

    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 54
        or bytes(data[:2]) != b"BM"
    ):
        return None
    data = bytes(data)
    offset = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h_raw = struct.unpack_from("<Iii", data, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if hsize < 40 or planes != 1 or bpp != 24 or comp != 0 or w <= 0:
        return None
    topdown = h_raw < 0
    h = -h_raw if topdown else h_raw
    if h <= 0:
        return None
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(data):
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not topdown:
        px = px[::-1]  # file stores bottom row first
    return int(w), int(h), bool(topdown), np.ascontiguousarray(px)


BMP_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("topdown", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("wsum", LongType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


def bmp_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact integer pixel statistics over BMP payloads: per-channel
    sums in LOGICAL RGB (a BGR-order bug flips sum_r/sum_b), plus the
    positional checksum ``wsum = sum(v(x,y,c) * (y*w + x + 1))`` (a
    stride or row-order bug reshuffles positions and flips it).
    Undecodable payloads emit null stats. Arrow-batched map-only."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = bmp_decode_pixels(bytes(payload))
                if dec is None:
                    rows.append(
                        (rid,) + (None,) * 9
                    )
                    continue
                w, h, td, px = dec
                p64 = px.astype("int64")
                wgt = (
                    np.arange(h)[:, None] * w + np.arange(w)[None, :] + 1
                )
                rows.append(
                    (
                        rid,
                        w,
                        h,
                        int(td),
                        int(p64[:, :, 0].sum()),
                        int(p64[:, :, 1].sum()),
                        int(p64[:, :, 2].sum()),
                        int((p64.sum(axis=2) * wgt).sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in BMP_PIXEL_STATS_SCHEMA.fields]
        )

    return df.select(id_col, payload_col).mapInPandas(
        stats, schema=BMP_PIXEL_STATS_SCHEMA
    )


def synthesize_bmp_corpus(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic real-BMP payload per row: geometry, row
    order, and every pixel are closed-form in the id
    (v(x, y, c) = (id*7 + y*13 + x*3 + c*29) mod 256, c = R,G,B;
    w = id%6+3 — strides exercise every 4-byte padding residue;
    h = id%4+2; top-down iff id odd), so a SQL oracle recomputes the
    exact stats without decoding."""
    import numpy as np

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                w = d % 6 + 3
                h = d % 4 + 2
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3),
                    indexing="ij",
                )
                arr = ((d * 7 + y * 13 + x * 3 + c * 29) % 256).astype(
                    np.uint8
                )
                payloads.append(bmp_encode_rgb24(arr, topdown=bool(d % 2)))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)


def tiff_struct(payload):
    """PURE-CATALYST TIFF dimensions as ONE struct<w int, h int>
    Column — a real (bounded) IFD walk, both byte orders, no Python:

    - header: ``II``/``MM`` + magic 42 in the declared endianness,
      then the uint32 offset of IFD0;
    - IFD0: uint16 entry count, then 12-byte entries
      (tag u16, type u16, count u32, value-or-offset u32);
    - ImageWidth = tag 256, ImageLength = tag 257; inline values read
      as SHORT (type 3, first two bytes of the value field in file
      byte order) or LONG (type 4, all four bytes).

    Dynamic-position subtrees (the IFD offset, the entry count, the
    entry array) are LET-BOUND via single-element ``transform``
    lambdas so each is evaluated once per row — without the binding
    the ``base`` tree is re-evaluated at every one of the ~50
    references and the parse costs ~1.3 ms/row (measured; PLANS.md
    round 9 session B). The entry walk is a higher-order transform
    over ``sequence(0, n-1)`` capped at 64 entries; tag lookup is a
    ``filter`` over the struct array. Null for non-TIFF payloads or
    dimension tags outside SHORT/LONG."""
    def byte_at(pos):
        return F.conv(
            F.hex(F.substring(payload, pos, F.lit(1))), 16, 10
        ).cast("bigint")

    sig = F.substring(payload, 1, 2).cast("string")
    is_le = sig == "II"
    is_order = is_le | (sig == "MM")

    def u16(pos):
        return F.when(
            is_le, byte_at(pos) + byte_at(pos + 1) * 256
        ).otherwise(byte_at(pos) * 256 + byte_at(pos + 1))

    def u32(pos):
        return F.when(is_le, u16(pos) + u16(pos + 2) * 65536).otherwise(
            u16(pos) * 65536 + u16(pos + 2)
        )

    magic_ok = u16(F.lit(3)) == 42
    base_expr = u32(F.lit(5)) + 1  # 1-indexed file position of the count

    def let(value, body):
        # let-binding: evaluate ``value`` once, reference it many times
        return F.element_at(F.transform(F.array(value), body), 1)

    def with_base(base):
        def with_n(n):
            n_capped = F.least(n, F.lit(64)).cast("int")
            valid = (
                is_order
                & magic_ok
                & (F.octet_length(payload) >= base + 1)
                & (n > 0)
            )

            def entry(e):
                at = base + 2 + e.cast("bigint") * 12
                typ = u16(at + 2)
                val = (
                    F.when(typ == 3, u16(at + 8))
                    .when(typ == 4, u32(at + 8))
                    .otherwise(F.lit(None).cast("bigint"))
                )
                return F.struct(u16(at).alias("tag"), val.alias("val"))

            entries = F.when(
                valid,
                F.transform(F.sequence(F.lit(0), n_capped - 1), entry),
            )

            def with_entries(ents):
                def tag_value(tag):
                    hits = F.filter(ents, lambda x: x["tag"] == tag)
                    return F.when(F.size(hits) > 0, F.element_at(hits, 1)["val"])

                return F.struct(
                    tag_value(256).cast("int").alias("w"),
                    tag_value(257).cast("int").alias("h"),
                )

            return let(entries, with_entries)

        return let(u16(base), with_n)

    return let(base_expr, with_base)


def tiff_dimensions(payload):
    """(tiff_width, tiff_height) Column pair over :func:`tiff_struct`
    — see there for the parse spec. Prefer selecting ``tiff_struct``
    once and extracting fields when both dimensions are needed on a
    hot path (each call here carries its own copy of the parse
    tree)."""
    st = tiff_struct(payload)
    return (
        st["w"].alias("tiff_width"),
        st["h"].alias("tiff_height"),
    )


# ---------------------------------------------------------------------------
# AIFF (round 9, session B): the big-endian sibling of the WAV path.
# Same closed-form synthesized samples, entirely different container:
# IFF chunk walk with BIG-endian sizes, and the sample rate stored as
# an 80-bit IEEE-754 extended float (1 sign + 15 exponent bits, bias
# 16383, 64-bit mantissa with an EXPLICIT integer bit) — decoded here
# with integer arithmetic, no struct support needed.
# ---------------------------------------------------------------------------


def _float80_encode(value: int) -> bytes:
    """80-bit IEEE extended (big-endian) for a positive integer —
    the AIFF COMM sampleRate encoding."""
    if value <= 0:
        raise ValueError("sample rate must be positive")
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return (16383 + e).to_bytes(2, "big") + mant.to_bytes(8, "big")


def _float80_decode(b: bytes) -> float:
    """Positive 80-bit IEEE extended -> float (integer arithmetic)."""
    se = int.from_bytes(b[:2], "big")
    mant = int.from_bytes(b[2:10], "big")
    if se & 0x8000 or mant == 0:
        return 0.0
    e = (se & 0x7FFF) - 16383
    return mant * 2.0 ** (e - 63)


def aiff_encode_pcm16(samples, sample_rate: int) -> bytes:
    """Encode int16 ndarray[frames, channels] as a canonical
    FORM/AIFF PCM16 file (big-endian interleaved samples, COMM with
    the 80-bit extended sample rate, SSND with zero offset/block)."""
    import numpy as np

    samples = np.asarray(samples, dtype=">i2")
    n_frames, ch = samples.shape
    data = samples.tobytes()
    comm = (
        ch.to_bytes(2, "big")
        + n_frames.to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + _float80_encode(int(sample_rate))
    )
    ssnd = bytes(8) + data  # offset=0, blockSize=0
    body = (
        b"AIFF"
        + b"COMM" + len(comm).to_bytes(4, "big") + comm
        + b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
    )
    return b"FORM" + len(body).to_bytes(4, "big") + body


def aiff_decode_samples(data: bytes):
    """Decode a FORM/AIFF PCM16 payload into
    ``(sample_rate, channels, n_frames, int16 ndarray[frames, ch])``.
    Chunk sizes are BIG-endian and 2-byte aligned; the sample rate is
    the COMM 80-bit extended float; SSND data starts after its
    offset/blockSize words. None for non-AIFF / non-16-bit payloads
    (corrupt audio must never kill a stage)."""
    import numpy as np

    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 12
        or bytes(data[:4]) != b"FORM"
        or bytes(data[8:12]) != b"AIFF"
    ):
        return None
    data = bytes(data)
    pos, comm, pcm = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "big")
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"COMM":
            comm = chunk
        elif typ == b"SSND":
            pcm = chunk
        pos += 8 + ln + (ln & 1)
    if comm is None or pcm is None or len(comm) < 18 or len(pcm) < 8:
        return None
    ch = int.from_bytes(comm[0:2], "big")
    n_frames = int.from_bytes(comm[2:6], "big")
    bits = int.from_bytes(comm[6:8], "big")
    rate = _float80_decode(comm[8:18])
    if bits != 16 or ch < 1 or rate <= 0 or rate != int(rate):
        return None
    offset = int.from_bytes(pcm[0:4], "big")
    body = pcm[8 + offset :]
    n = min(n_frames, len(body) // (2 * ch))
    if n == 0:
        return None
    arr = np.frombuffer(body, dtype=">i2", count=n * ch).reshape(n, ch)
    return int(rate), int(ch), int(n), arr


def synthesize_aiff_corpus(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic real-AIFF payload per row — the SAME
    closed-form rate/channels/frames/samples as
    :func:`synthesize_wav_corpus` (rate = 8000 + (id%3)*4000,
    ch = 1 + id%2, frames = 16 + id%16, sample = ((id*31 + i*17 +
    c*101) % 4001) - 2000), so the same SQL oracle checks a wholly
    different container + endianness + float80 path."""
    import numpy as np

    out_schema = df.select(id_col).schema.add(payload_col, "binary")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                rid = int(rid)
                rate = 8000 + (rid % 3) * 4000
                ch = 1 + rid % 2
                nf = 16 + rid % 16
                i = np.arange(nf).reshape(-1, 1)
                c = np.arange(ch).reshape(1, -1)
                arr = ((rid * 31 + i * 17 + c * 101) % 4001) - 2000
                payloads.append(aiff_encode_pcm16(arr, rate))
            yield pd.DataFrame(
                {id_col: pdf[id_col], payload_col: payloads}
            )

    return df.select(id_col).mapInPandas(synth, out_schema)


def aiff_sample_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL PCM sample statistics over AIFF payloads — the AIFF twin
    of :func:`wav_sample_stats` (same output contract, so the two
    container paths are interchangeable downstream)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = aiff_decode_samples(bytes(payload))
                if dec is None:
                    rows.append((rid, None, None, None, None, None, None))
                    continue
                rate, ch, n, arr = dec
                rows.append(
                    (
                        rid,
                        rate,
                        ch,
                        n,
                        int(arr.astype("int64").sum()),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in WAV_SAMPLE_STATS_SCHEMA.fields]
        )

    raw = df.select(id_col, payload_col).mapInPandas(
        stats, schema=WAV_SAMPLE_STATS_SCHEMA
    )
    return raw.select(
        id_col,
        "sample_rate",
        "channels",
        "n_frames",
        "sum_s",
        F.round(
            F.col("sum_s") / (F.col("n_frames") * F.col("channels")), 6
        ).alias("mean_s"),
        "min_s",
        "max_s",
    )
