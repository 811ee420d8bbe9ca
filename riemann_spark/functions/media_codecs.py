"""REAL media codecs, pure stdlib — the in-container decode path.

The container has no PIL/libav, but two public formats are simple
enough to parse with ``struct`` alone, giving the multimodal pipeline
(functions/multimodal.py) at least one genuinely-decoded path:

- **PPM (P6)**: ``P6\\n<w> <h>\\n<maxval>\\n`` + raw RGB bytes — the
  netpbm format.
- **WAV (PCM)**: canonical 44-byte RIFF header + 16-bit little-endian
  signed samples.

Encoders exist so tests and the oracle query can synthesize
deterministic fixtures; decoders are full parsers (header validation,
dimension/rate extraction, payload → typed samples), not stubs. The
md5 stand-ins in multimodal.py remain the fallback for formats that
DO need external libs.
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------- PPM --

def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary PPM. ``pixels`` must be width*height*3 RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse P6 → (width, height, maxval, pixel bytes). Handles
    whitespace/comment-tolerant headers per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    pixels = data[i : i + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM payload")
    return w, h, maxval, pixels


# ------------------------------------------------------------- WAV --

def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Canonical-44-byte-header PCM WAV, 16-bit LE mono."""
    payload = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Parse PCM WAV → (sample_rate, samples). Walks RIFF chunks (not
    a fixed 44-byte assumption), validates PCM/16-bit/mono."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, rate, samples = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV: fmt={fmt} ch={ch} bits={bits}")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{size // 2}h", body[: size // 2 * 2]))
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


# ------------------------------------------------------------- PNG --
# Pure-stdlib PNG (ISO/IEC 15948): chunk walk + zlib inflate + the
# five per-scanline filters. Covers non-interlaced 8-bit gray/RGB/RGBA
# — the shapes a training-data pipeline actually stores.

import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    tagged = typ + body
    return (
        struct.pack(">I", len(body))
        + tagged
        + struct.pack(">I", zlib.crc32(tagged) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit RGB, non-interlaced, filter 0 scanlines. ``pixels`` must
    be width*height*3 RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(pixels)}")
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse PNG → (width, height, channels, recovered pixel bytes).

    Full decode: CRC-checked chunk walk, multi-IDAT concat, zlib
    inflate, and per-scanline un-filtering (None/Sub/Up/Average/Paeth).
    8-bit depth, color types 0/2/6, non-interlaced only — anything
    else raises rather than guessing."""
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG")
    i, ihdr, idat = len(PNG_SIG), None, b""
    while i + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + size]
        (crc,) = struct.unpack_from(">I", data, i + 8 + size)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        i += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(stride * h)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        for x in range(stride):
            a = out[base + x - ch] if x >= ch else 0          # left
            b = out[base + x - stride] if y > 0 else 0        # up
            c = out[base + x - stride - ch] if (y > 0 and x >= ch) else 0
            v = line[x]
            if ftype == 0:
                pass
            elif ftype == 1:
                v = (v + a) & 0xFF
            elif ftype == 2:
                v = (v + b) & 0xFF
            elif ftype == 3:
                v = (v + (a + b) // 2) & 0xFF
            elif ftype == 4:
                v = (v + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype}")
            out[base + x] = v
    return w, h, ch, bytes(out)


# ------------------------------------------------------------ JPEG --
# Pure-Python/numpy baseline JPEG (ITU-T T.81, public spec). Encoder
# writes 4:4:4 (or grayscale) SOF0 with the Annex K quantization and
# Huffman tables; decoder is a general baseline parser: it reads DQT /
# DHT tables FROM THE FILE (so any baseline 8-bit JPEG with uniform
# sampling factors decodes, not just ours), handles byte stuffing and
# RST markers, and runs dequant -> IDCT -> YCbCr->RGB. Progressive
# (SOF2), 12-bit, and mixed-subsampling files raise rather than guess.
# numpy is imported lazily (_dct_matrix): only the JPEG DCT needs it,
# and a module-level import would tax every Python worker that touches
# the stdlib-only codecs (PPM/WAV/PNG/AVI) with numpy startup.

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

# Annex K Huffman specs: (bits-per-length 1..16, symbol list)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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
for _bits, _vals in (HUFF_DC_LUMA, HUFF_DC_CHROMA, HUFF_AC_LUMA, HUFF_AC_CHROMA):
    assert sum(_bits) == len(_vals), "inconsistent Huffman spec"

_C = None  # lazy orthonormal DCT-II matrix (numpy)


def _dct_matrix():
    """8-point orthonormal DCT-II matrix — equals T.81's FDCT
    normalization. Lazy so stdlib-only codec users never import
    numpy."""
    global _C, np
    if _C is None:
        import numpy as np_

        globals()["np"] = np_
        _C = np_.array(
            [
                [
                    (np_.sqrt(1 / 8) if u == 0 else np_.sqrt(2 / 8))
                    * np_.cos((2 * x + 1) * u * np_.pi / 16)
                    for x in range(8)
                ]
                for u in range(8)
            ]
        )
    return _C


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical T.81 assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits): JPEG signed-magnitude coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(
    block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes, pred: int, w: _BitWriter
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    quant = np.round(coef / qt).astype(np.int64)
    zz = quant.reshape(64)[ZIGZAG]
    size, bits = _magnitude(int(zz[0]) - pred)
    c, ln = dc_codes[size]
    w.put(c, ln)
    if size:
        w.put(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        w.put(c, ln)
        w.put(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.put(c, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(width: int, height: int, pixels: bytes) -> bytes:
    """Baseline JFIF, 4:4:4, Annex K tables. ``pixels`` is
    width*height*3 RGB bytes. Lossy: decode recovers the image to
    within quantization error, with dimensions exact."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(pixels)}")
    _dct_matrix()
    rgb = np.frombuffer(pixels, np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    ph, pw = -height % 8, -width % 8  # pad to multiple of 8 (edge-replicate)
    planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge") for p in planes]
    qts = [np.array(QT_LUMA, np.float64).reshape(8, 8),
           np.array(QT_CHROMA, np.float64).reshape(8, 8)]
    dc_l, ac_l = _huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_AC_LUMA)
    dc_c, ac_c = _huff_codes(*HUFF_DC_CHROMA), _huff_codes(*HUFF_AC_CHROMA)
    w = _BitWriter()
    preds = [0, 0, 0]
    for by in range(0, height + ph, 8):
        for bx in range(0, width + pw, 8):
            for ci, plane in enumerate(planes):
                qt = qts[0] if ci == 0 else qts[1]
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(
                    plane[by : by + 8, bx : bx + 8], qt, dc, ac, preds[ci], w
                )
    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    zz_l = bytes(QT_LUMA[z] for z in ZIGZAG)
    zz_c = bytes(QT_CHROMA[z] for z in ZIGZAG)
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, b"\x00" + zz_l)
        + _seg(0xDB, b"\x01" + zz_c)
        + _seg(0xC0, sof)
        + dht(0, 0, HUFF_DC_LUMA)
        + dht(1, 0, HUFF_AC_LUMA)
        + dht(0, 1, HUFF_DC_CHROMA)
        + dht(1, 1, HUFF_AC_CHROMA)
        + _seg(0xDA, sos)
        + w.flush()
        + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, i: int) -> None:
        self.data = data
        self.i = i
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.i >= len(d):
            raise ValueError("truncated entropy data")
        byte = d[self.i]
        if byte == 0xFF:
            nxt = d[self.i + 1] if self.i + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.i += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                byte = 0  # feed zero bits past the end (spec-tolerated)
        else:
            self.i += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc, self.nbits = 0, 0
        d, i = self.data, self.i
        if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
            self.i = i + 2
        self.marker = None


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse baseline JPEG → (width, height, channels, RGB/gray bytes).

    General baseline decoder: DQT/DHT read from the stream, stuffing
    and RST handled, dequant + IDCT + color conversion. Restrictions
    (raise, never guess): SOF0 only, 8-bit, all components with the
    same sampling factors (4:4:4 or grayscale)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    _dct_matrix()
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("marker expected")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                for z in range(64):
                    tbl[ZIGZAG[z]] = body[j + 1 + z]
                qtables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                code, k, table = 0, 0, {}
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htables[(tc, th)] = table
                j += 17 + n
        elif marker == 0xC0:
            prec, h, w_, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if any((ch, cv) != (comps[0][1], comps[0][2]) for _, ch, cv, _ in comps):
                raise ValueError("mixed sampling factors unsupported")
            frame = (w_, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp index, dc table, ac table)
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                ci = next(k for k, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, tt >> 4, tt & 0xF))
            w_, h, comps = frame
            bw, bh = (w_ + 7) // 8, (h + 7) // 8
            planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
            preds = [0] * len(comps)
            rd = _BitReader(data, i)
            mcu = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        rd.restart()
                        preds = [0] * len(comps)
                    for ci, tdc, tac in scan:
                        dc_t, ac_t = htables[(0, tdc)], htables[(1, tac)]
                        zz = np.zeros(64, np.int64)
                        size = rd.huff(dc_t)
                        preds[ci] += _extend(rd.bits(size), size)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        blk = np.zeros(64)
                        blk[ZIGZAG] = zz
                        qt = qtables[comps[ci][3]]
                        px = _C.T @ (blk.reshape(8, 8) * qt) @ _C + 128.0
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
                    mcu += 1
            planes = [p[:h, :w_] for p in planes]
            if len(comps) == 1:
                out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
                return w_, h, 1, out.tobytes()
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            rgb = np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )
            out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
            return w_, h, 3, out.tobytes()
        elif marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i -= seglen  # standalone markers have no length field
            i += 0
        # APPn/COM and anything else: skipped via the length walk
    raise ValueError("no scan data found")


# ------------------------------------------------------- AVI/MJPEG --
# Minimal AVI (Microsoft RIFF spec, public) carrying Motion-JPEG: the
# container is a chunk walk like WAV, and each '00dc' chunk is a whole
# baseline JPEG — so with decode_jpeg above, VIDEO decode is real too:
# container parse -> per-frame entropy decode -> pixel stats.

def encode_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frames in a minimal spec-shaped AVI:
    RIFF('AVI ' hdrl(avih strl(strh strf)) movi('00dc'...) idx1)."""
    if not frames:
        raise ValueError("need at least one frame")
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0, 0
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    movi_items = b"".join(chunk(b"00dc", f) for f in frames)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", movi_items)
        + chunk(b"idx1", idx)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse AVI → (width, height, n_frames_declared, JPEG frame
    payloads). Chunk walk with LIST recursion; frames are the '..dc'
    (compressed video) chunks of the movi list, unparsed — feed each
    to decode_jpeg. Validates RIFF/AVI magic and the avih header."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = declared = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, declared
        i = lo
        while i + 8 <= hi:
            cid = data[i : i + 4]
            (size,) = struct.unpack_from("<I", data, i + 4)
            body_lo, body_hi = i + 8, i + 8 + size
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)
            elif cid == b"avih":
                fields = struct.unpack_from("<IIIIIIIIII", data, body_lo)
                declared = fields[4]
                width, height = fields[8], fields[9]
            elif cid[2:4] == b"dc":
                frames.append(data[body_lo:body_hi])
            i = body_hi + (size & 1)

    walk(12, len(data))
    if width is None or declared is None:
        raise ValueError("missing avih header")
    return width, height, declared, frames
