"""Pure-Python baseline JPEG codec (JFIF, SOF0, stdlib + numpy) — the
last member of the native media-codec family (PNG zlib+filters, GIF
LZW, WAV PCM, AVI DIB, this): REAL entropy coding and transform math,
no imaging library.

Scope (honest): baseline sequential DCT, 8-bit, grayscale (1
component) or YCbCr 4:4:4 (3 components, no chroma subsampling),
standard Annex-K quantization and Huffman tables. Progressive,
arithmetic-coded, subsampled, or restart-marker streams return None
from the decoder (corrupt/unsupported media must never kill a stage).

Correctness contracts, in order of strength:
- JPEG is lossy, but decode(encode(px)) is DETERMINISTIC — and for
  images built from FLAT 8x8 blocks of EVEN gray values the
  quantization error is exactly zero (only the DC coefficient is
  non-zero: DC = 8*(v-128), quantizer 16 at the Annex-K tables, and
  8*(v-128)/16 = (v-128)/2 is an integer for even v — the rounded
  quotient reconstructs v bit-exactly through the full Huffman ->
  dequant -> IDCT path). The `multimodal_jpeg_pixels` query builds
  exactly that corpus, so a closed-form DuckDB oracle value-checks
  the ENTIRE codec chain.
- For arbitrary rasters, tests gate PSNR(decode(encode(x)), x) and
  bit-exact determinism.
"""

from __future__ import annotations

# --- Annex K tables ---------------------------------------------------------

_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# (bits[1..16], values) — Annex K
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, values):
    """JPEG canonical Huffman: {value: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(code16 -> value, code16 -> length) flat lookup lists for the
    decoder: peek 16 bits, one list index. JPEG canonical codes are
    prefix-free and <= 16 bits, so every 16-bit word starting with
    code c of length L maps to (value(c), L); uncovered words map to
    (-1, 0). Cached per (bits, values) — the Annex-K tables are the
    common case, so streams share one table build. (The former
    per-bit dict walk read the stream one bit at a time — the 16-bit
    LUT is 3x on the flat-block corpus frames, identical results.)"""
    key = (tuple(bits), tuple(values))
    hit = _DEC_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    import numpy as np

    enc = _canonical_codes(bits, values)
    val = np.full(1 << 16, -1, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for v, (code, length) in enc.items():
        lo = code << (16 - length)
        val[lo : lo + (1 << (16 - length))] = v
        ln[lo : lo + (1 << (16 - length))] = length
    pair = (val.tolist(), ln.tolist())
    _DEC_LUT_CACHE[key] = pair
    return pair


_DEC_LUT_CACHE: dict = {}


# The Annex-K encode tables are constant — build them once at import
# instead of four dict constructions per encoded frame (measured: the
# per-frame rebuild was ~10% of a 32x32 encode).
_ENC_DC = (_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR))
_ENC_AC = (_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR))


def _dct_matrix():
    import numpy as np

    k = np.arange(8)
    u = k.reshape(-1, 1)
    c = np.cos((2 * k + 1) * u * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c  # orthonormal: D = C @ B @ C.T, B = C.T @ D @ C


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _magnitude(v: int):
    """JPEG magnitude category + offset bits for a coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def jpeg_encode_pixels(px) -> bytes:
    """Encode ``uint8 ndarray[h, w]`` (grayscale) or ``[h, w, 3]``
    (RGB -> YCbCr 4:4:4) as a baseline JFIF JPEG with the Annex-K
    quantization and Huffman tables. Dimensions need not be multiples
    of 8 (edge blocks replicate the border pixel)."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]

    qts = [np.array(_QT_LUM, dtype=np.float64).reshape(8, 8)]
    if not gray:
        qts.append(np.array(_QT_CHR, dtype=np.float64).reshape(8, 8))
    C = _dct_matrix()
    bh, bwid = -(-h // 8), -(-w // 8)
    nblocks = bh * bwid

    # DCT + quantize + zigzag for ALL blocks of a component in one
    # batched matmul (the per-block np.ix_ slice + 8x8 matmul loop was
    # the encoder's hot path — 5x on the MJPEG corpus frames, bit-
    # identical by construction since the arithmetic is unchanged).
    # Edge blocks replicate the border pixel via the clamped index
    # gather, exactly as the old per-block ys/xs clamp did.
    zz_comp = []
    for ci, plane in enumerate(comps):
        tsel = 0 if ci == 0 else 1
        padded = plane[
            np.minimum(np.arange(bh * 8), h - 1)[:, None],
            np.minimum(np.arange(bwid * 8), w - 1)[None, :],
        ]
        blocks = (
            padded.reshape(bh, 8, bwid, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nblocks, 8, 8)
        )
        d = C @ (blocks - 128.0) @ C.T
        q = np.round(d / qts[min(tsel, len(qts) - 1)]).astype(np.int64)
        zz_comp.append(q.reshape(nblocks, 64)[:, _ZIGZAG])

    bw = _BitWriter()
    pred = [0] * len(comps)
    put = bw.put
    for bi in range(nblocks):
        for ci in range(len(comps)):
            tsel = 0 if ci == 0 else 1
            zz = zz_comp[ci][bi]
            dc = int(zz[0])
            diff = dc - pred[ci]
            pred[ci] = dc
            size, bits = _magnitude(diff)
            code, ln = _ENC_DC[tsel][size]
            put(code, ln)
            if size:
                put(bits, size)
            # walk only the nonzero AC coefficients (for the flat-block
            # oracle corpora that is none at all; the old loop paid 63
            # int() conversions per block regardless)
            ac = _ENC_AC[tsel]
            nz = np.nonzero(zz[1:])[0]
            prev = 0
            for k in nz:
                run = int(k) - prev
                prev = int(k) + 1
                while run > 15:
                    code, ln = ac[0xF0]  # ZRL
                    put(code, ln)
                    run -= 16
                v = int(zz[1 + k])
                size, bits = _magnitude(v)
                code, ln = ac[(run << 4) | size]
                put(code, ln)
                put(bits, size)
            if prev < 63:
                code, ln = ac[0x00]  # EOB
                put(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    qlum = bytes([_QT_LUM[_ZIGZAG[i]] for i in range(64)])
    out += seg(0xDB, b"\x00" + qlum)
    if not gray:
        qchr = bytes([_QT_CHR[_ZIGZAG[i]] for i in range(64)])
        out += seg(0xDB, b"\x01" + qchr)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, values) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR)
    ):
        if gray and tid == 1:
            continue
        out += seg(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
        )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


def jpeg_decode_pixels(data: bytes):
    """Decode a baseline JFIF JPEG into ``(height, width, channels,
    uint8 ndarray[h, w, channels])`` — full Huffman + dequant + IDCT
    reconstruction, stdlib + numpy. Supports SOF0, 8-bit, 1 or 3
    components, 4:4:4 only (no subsampling, no restart markers).
    Returns None for anything else (a corrupt/unsupported image must
    never kill a stage — fuzz-propertied like the PNG/GIF/WAV
    codecs)."""
    try:
        return _jpeg_decode_pixels(data)
    except (IndexError, ValueError, KeyError, OverflowError):
        # malformed segment lengths / truncated tables: null result,
        # never a stage kill
        return None


def _jpeg_decode_pixels(data: bytes):
    import numpy as np

    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 4
        or bytes(data[:2]) != b"\xff\xd8"
    ):
        return None
    data = bytes(data)
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    h = w = None
    comps = []  # (id, qt_id)
    scan_comps = []  # (comp_idx, dc_id, ac_id)
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec != 0 or p + 65 > len(payload):
                    return None
                tab = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    tab[_ZIGZAG[i]] = payload[p + 1 + i]
                qt[tid] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p + 17 <= len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(payload):
                    return None  # truncated DHT
                values = list(payload[p + 17 : p + 17 + nv])
                table = _decode_table(bits, values)
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + nv
        elif marker == 0xC0:
            if payload[0] != 8:
                return None
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            comps = []
            for ci in range(nc):
                cid, sampling, qid = payload[6 + ci * 3 : 9 + ci * 3]
                if sampling != 0x11:
                    return None  # subsampling unsupported
                comps.append((cid, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xDD):
            return None  # non-baseline / restart interval
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for si in range(ns):
                cid, tsel = payload[1 + si * 2 : 3 + si * 2]
                idxs = [i for i, (c, _q) in enumerate(comps) if c == cid]
                if not idxs:
                    return None
                scan_comps.append((idxs[0], tsel >> 4, tsel & 0x0F))
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if (
        h is None
        or scan_start is None
        or not comps
        or len(scan_comps) != len(comps)
        or h <= 0
        or w <= 0
    ):
        return None
    for _ci, qid in comps:
        if qid not in qt:
            return None
    for _idx, dci, aci in scan_comps:
        if dci not in huff_dc or aci not in huff_ac:
            return None

    # unstuff the entropy bytes once (0xFF 0x00 -> 0xFF; stop at any
    # other marker), then read the bitstream positionally: 16-bit LUT
    # lookups for Huffman symbols and 4-byte window reads for the
    # magnitude bits — the former per-bit dict walk dominated decode
    # (3x on corpus frames, identical results incl. truncation
    # behavior: a code longer than the remaining real bits rejects,
    # exactly as running out of bits mid-code did).
    raw = data[scan_start:]
    unstuffed = bytearray()
    i = 0
    nraw = len(raw)
    while i < nraw:
        byte = raw[i]
        if byte == 0xFF:
            if i + 1 < nraw and raw[i + 1] == 0x00:
                unstuffed.append(0xFF)
                i += 2
                continue
            break  # marker: stop feeding
        unstuffed.append(byte)
        i += 1
    buf = bytes(unstuffed) + b"\x00\x00\x00"
    nbits = len(unstuffed) * 8

    bh, bwid = -(-h // 8), -(-w // 8)
    nblocks = bh * bwid
    ncomp = len(comps)
    # coefficients accumulate per block (natural order); the IDCT then
    # runs ONCE per component as a batched matmul over all blocks
    coefs = np.zeros((ncomp, nblocks, 64), dtype=np.float64)
    pred = [0] * ncomp
    bp = 0
    for bi in range(nblocks):
        for idx, dci, aci in scan_comps:
            dval, dlen = huff_dc[dci]
            rem = nbits - bp
            if rem >= 16:
                avail = 16
            elif rem <= 0:
                return None
            else:
                avail = rem
            byteoff = bp >> 3
            word = (
                int.from_bytes(buf[byteoff : byteoff + 3], "big")
                >> (8 - (bp & 7))
            ) & 0xFFFF
            size = dval[word]
            length = dlen[word]
            if size < 0 or length == 0 or length > avail:
                return None
            bp += length
            if size:
                if nbits - bp < size:
                    return None
                byteoff = bp >> 3
                chunk = int.from_bytes(buf[byteoff : byteoff + 4], "big")
                bits = (chunk >> (32 - (bp & 7) - size)) & ((1 << size) - 1)
                bp += size
                pred[idx] += _extend(bits, size)
            row = coefs[idx, bi]
            row[0] = pred[idx]
            aval, alen = huff_ac[aci]
            k = 1
            while k < 64:
                rem = nbits - bp
                if rem >= 16:
                    avail = 16
                elif rem <= 0:
                    return None
                else:
                    avail = rem
                byteoff = bp >> 3
                word = (
                    int.from_bytes(buf[byteoff : byteoff + 3], "big")
                    >> (8 - (bp & 7))
                ) & 0xFFFF
                rs = aval[word]
                length = alen[word]
                if rs < 0 or length == 0 or length > avail:
                    return None
                bp += length
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        return None
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    return None
                if nbits - bp < size:
                    return None
                byteoff = bp >> 3
                chunk = int.from_bytes(buf[byteoff : byteoff + 4], "big")
                bits = (chunk >> (32 - (bp & 7) - size)) & ((1 << size) - 1)
                bp += size
                row[_ZIGZAG[k]] = _extend(bits, size)
                k += 1

    C = _dct_matrix()
    planes = []
    for idx in range(ncomp):
        q = coefs[idx].reshape(nblocks, 8, 8) * qt[comps[idx][1]]
        sp = C.T @ q @ C + 128.0  # batched IDCT over all blocks
        plane = (
            sp.reshape(bh, bwid, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bwid * 8)
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return h, w, 1, out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
        axis=2,
    )
    return h, w, 3, rgb


def jpeg_header_meta(data: bytes):
    """(width, height, channels) from the SOF marker alone — a
    marker walk, no entropy decode. Accepts any SOFn for metadata
    purposes (dimensions are marker-level even when the scan itself
    is progressive). None for non-JPEG/malformed."""
    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 4
        or bytes(data[:2]) != b"\xff\xd8"
    ):
        return None
    data = bytes(data)
    pos = 2
    _SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if marker in _SOF and pos + 4 + 6 <= len(data):
            h = int.from_bytes(data[pos + 5 : pos + 7], "big")
            w = int.from_bytes(data[pos + 7 : pos + 9], "big")
            nc = data[pos + 9]
            if h > 0 and w > 0 and nc in (1, 3, 4):
                return w, h, nc
            return None
        if marker == 0xDA:
            return None  # scan before SOF: malformed
        pos += 2 + ln
    return None


def synthesize_jpeg_corpus(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Attach a deterministic REAL JPEG payload per row: a 16x24
    grayscale image of six flat 8x8 blocks whose (EVEN) values are
    closed-form in (id, block) — the construction for which baseline
    JPEG quantization is EXACT (module docstring), so a SQL oracle can
    recompute the decoded pixel statistics without decoding and
    value-check the entire encode -> Huffman -> dequant -> IDCT
    chain."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(payload_col, BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                img = np.zeros((16, 24), dtype=np.uint8)
                for by in range(2):
                    for bx in range(3):
                        a = d * 37 + by * 5 + bx + 1
                        mix = (((a * a) % 16777216) * 2654435761
                               % (1 << 32)) // (1 << 24)
                        v = 2 * (mix % 128)
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
                payloads.append(jpeg_encode_pixels(img))
            out = pdf.copy()
            out[payload_col] = payloads
            yield out

    return df.mapInPandas(synth, out_schema)
