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
