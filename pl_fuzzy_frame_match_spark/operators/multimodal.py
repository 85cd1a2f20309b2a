"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested. Media decoding probes for its optional
dependency at execution time: ``decode_image`` uses Pillow when
importable (null-metadata rows for undecodable payloads — a corrupt
image must never kill a 100 TB stage) and otherwise raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-metadata from the bytes so the pipeline shape can
be exercised end-to-end without the library. ffmpeg-backed frame
sampling and model-backed feature extraction remain honest stubs.
"""

from __future__ import annotations

import hashlib
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


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads into typed metadata via ``mapInPandas``
    (Arrow batches, one Python worker per partition — the production
    shape for CPU-bound media decode on a Spark cluster).

    Real path: when Pillow is importable (:func:`pil_available`),
    ``fake=False`` decodes each payload with ``PIL.Image.open`` and
    emits (width, height, channels); payloads Pillow cannot parse emit
    NULL dimensions instead of failing the job — at 100 TB a corrupt
    image must never kill a stage. When Pillow is absent, ``fake=False``
    raises ``NotImplementedError`` at execution time (honest stub) and
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
            if not fake and not use_pil:
                raise NotImplementedError(
                    "image decoding requires PIL/libvips — not available in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if fake:
                    w, h, c = _fake_decode(data)
                    rows.append((rid, len(data), w, h, c))
                    continue
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

    STUB: real demuxing needs ffmpeg, absent here. ``fake=True``
    slices the payload into n evenly-spaced byte windows as stand-in
    frames (deterministic); ``fake=False`` raises at execution time.
    """

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg/pyav — not available in"
                    " this environment; pass fake=True for the byte-window stub"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not data:
                    continue
                step = max(len(data) // n_frames, 1)
                for i in range(min(n_frames, len(data))):
                    off = i * step
                    rows.append((rid, i, off, data[off : off + step]))
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
