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
