"""Real PPM/WAV codec golden cases (functions/media_codecs.py)."""

from __future__ import annotations

import pytest

from riemann_spark.functions.media_codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_ppm_roundtrip():
    px = bytes(range(2 * 3 * 3))  # 2x3 RGB
    data = encode_ppm(2, 3, px)
    w, h, maxval, back = decode_ppm(data)
    assert (w, h, maxval) == (2, 3, 255)
    assert back == px


def test_ppm_comment_tolerant_header():
    px = bytes(12)
    data = b"P6\n# a comment\n2 2\n255\n" + px
    w, h, maxval, back = decode_ppm(data)
    assert (w, h) == (2, 2) and back == px


def test_ppm_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\nx")
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(2, 2, bytes(12))[:-3])
    with pytest.raises(ValueError):
        encode_ppm(2, 2, bytes(5))


def test_wav_roundtrip_including_negatives():
    samples = [0, 1, -1, 32767, -32768, 1000, -999]
    data = encode_wav(8000, samples)
    rate, back = decode_wav(data)
    assert rate == 8000 and back == samples


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(8000, [0, 1]))
    data[20] = 3  # fmt code -> IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_real_decode_features_dispatch(spark):
    from riemann_spark.functions.multimodal import real_decode_features

    rows = [
        (1, encode_ppm(2, 2, bytes([10] * 12))),
        (2, encode_wav(44100, [5, -5, 10])),
        (3, b"garbage-bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in real_decode_features(df).collect()}
    img = got[1]
    assert (img.kind, img.width, img.height, img.n_units) == ("image", 2, 2, 12)
    assert (img.sum_val, img.min_val, img.max_val) == (120, 10, 10)
    aud = got[2]
    assert (aud.kind, aud.sample_rate, aud.n_units) == ("audio", 44100, 3)
    assert (aud.sum_val, aud.min_val, aud.max_val) == (10, -5, 10)
    assert got[3].kind is None  # dead-letter row, batch not poisoned


# ------------------------------------------------------------- PNG --

def test_png_roundtrip_rgb():
    from riemann_spark.functions.media_codecs import decode_png, encode_png

    px = bytes((i * 13 + 7) % 256 for i in range(8 * 8 * 3))
    w, h, ch, back = decode_png(encode_png(8, 8, px))
    assert (w, h, ch) == (8, 8, 3)
    assert back == px


def _hand_png(width, height, color, raw_scanlines):
    """Assemble a PNG from pre-filtered scanline bytes (filter byte
    included per line) — lets tests exercise each filter type."""
    import struct
    import zlib

    from riemann_spark.functions.media_codecs import PNG_SIG, _png_chunk

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_png_unfilters_every_type():
    from riemann_spark.functions.media_codecs import decode_png

    # 3x5 grayscale, one scanline per filter type. Expected output is
    # computed by an independent reference un-filter below.
    lines = [
        (0, [10, 20, 30]),          # None
        (1, [5, 5, 5]),             # Sub: left prediction
        (2, [1, 2, 3]),             # Up
        (3, [4, 4, 4]),             # Average
        (4, [7, 7, 7]),             # Paeth
    ]
    raw = b"".join(bytes([f]) + bytes(v) for f, v in lines)
    w, h, ch, out = decode_png(_hand_png(3, 5, 0, raw))
    assert (w, h, ch) == (3, 5, 1)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    ref = []
    for y, (f, vals) in enumerate(lines):
        row = []
        for x, v in enumerate(vals):
            a = row[x - 1] if x else 0
            b = ref[y - 1][x] if y else 0
            c = ref[y - 1][x - 1] if (y and x) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            row.append((v + pred) & 0xFF)
        ref.append(row)
    assert list(out) == [v for row in ref for v in row]


def test_png_rgba_and_errors():
    import pytest as _pytest

    from riemann_spark.functions.media_codecs import decode_png, encode_png

    # RGBA: 1x2, filter 0
    raw = b"\x00" + bytes([1, 2, 3, 4]) + b"\x00" + bytes([5, 6, 7, 8])
    w, h, ch, out = decode_png(_hand_png(1, 2, 6, raw))
    assert (w, h, ch, list(out)) == (1, 2, 4, [1, 2, 3, 4, 5, 6, 7, 8])
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # corrupt a payload byte -> CRC failure, not garbage pixels
    good = bytearray(encode_png(2, 2, bytes(range(12))))
    good[40] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(good))


def test_real_decode_features_png_dispatch(spark):
    from riemann_spark.functions.media_codecs import encode_png
    from riemann_spark.functions.multimodal import real_decode_features

    df = spark.createDataFrame(
        [(7, encode_png(2, 2, bytes([9] * 12)))], "media_id long, content binary"
    )
    r = real_decode_features(df).collect()[0]
    assert (r.kind, r.width, r.height, r.n_units) == ("image", 2, 2, 12)
    assert (r.sum_val, r.min_val, r.max_val) == (108, 9, 9)


def test_jpeg_roundtrip_solid_and_smooth():
    import numpy as np

    from riemann_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    # solid color: only DC terms — recovers to within rounding
    px = bytes([120, 60, 200]) * (16 * 16)
    w, h, ch, out = decode_jpeg(encode_jpeg(16, 16, px))
    assert (w, h, ch) == (16, 16, 3)
    a = np.frombuffer(px, np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert abs(a - b).max() <= 2

    # smooth gradient: within quantization error at Annex-K tables
    g = np.zeros((32, 48, 3), np.uint8)
    for y in range(32):
        for x in range(48):
            g[y, x] = (x * 3, y * 4, (x + y) * 2)
    w, h, ch, out = decode_jpeg(encode_jpeg(48, 32, g.tobytes()))
    assert (w, h, ch) == (48, 32, 3)
    b = np.frombuffer(out, np.uint8).reshape(32, 48, 3).astype(int)
    err = abs(g.astype(int) - b)
    assert err.mean() < 4 and err.max() < 24


def test_jpeg_pads_non_multiple_of_8():
    from riemann_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    px = bytes(((x + y) % 256) for y in range(13) for x in range(21) for _ in range(3))
    w, h, ch, out = decode_jpeg(encode_jpeg(21, 13, px))
    assert (w, h, ch, len(out)) == (21, 13, 3, 21 * 13 * 3)


def test_jpeg_rejects_garbage_and_progressive():
    import pytest as _pytest

    from riemann_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 (0xC0) to SOF2 (0xC2, progressive): refuse, don't guess
    blob = bytearray(encode_jpeg(8, 8, bytes(192)))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_real_decode_features_jpeg_dispatch(spark):
    from riemann_spark.functions.media_codecs import encode_jpeg
    from riemann_spark.functions.multimodal import real_decode_features

    df = spark.createDataFrame(
        [(11, encode_jpeg(16, 8, bytes([50, 100, 150]) * 128))],
        "media_id long, content binary",
    )
    r = real_decode_features(df).collect()[0]
    assert (r.kind, r.width, r.height, r.n_units) == ("image", 16, 8, 384)
    # solid color decodes near-exactly: bounds hold on the stats
    assert 48 <= r.min_val and r.max_val <= 152


def test_avi_mjpeg_roundtrip():
    from riemann_spark.functions.media_codecs import (
        decode_avi_mjpeg,
        decode_jpeg,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = [
        encode_jpeg(16, 8, bytes([10 * (f + 1)] * 384)) for f in range(4)
    ]
    avi = encode_avi_mjpeg(16, 8, frames, fps=5)
    w, h, n, out = decode_avi_mjpeg(avi)
    assert (w, h, n, len(out)) == (16, 8, 4, 4)
    assert out == frames  # container transport is bit-exact
    for f, blob in enumerate(out):
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (16, 8, 3)
        # solid frames recover their level within rounding
        mid = px[len(px) // 2]
        assert abs(mid - 10 * (f + 1)) <= 2


def test_avi_rejects_garbage():
    import pytest as _pytest

    from riemann_spark.functions.media_codecs import decode_avi_mjpeg

    with _pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF....WAVE")
    with _pytest.raises(ValueError):
        decode_avi_mjpeg(b"plainly not a container")


def test_scene_cut_detector_flags_only_the_scene_jump(spark):
    """The frame-difference detector fires exactly at the scene
    boundary: intra-scene generator drift and JPEG noise stay under
    threshold, the dark→bright jump clears it; cut_at is respected."""
    from riemann_spark.functions import multimodal

    d = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = multimodal.synthetic_avi_scenes(d, n_frames=5, cut_at=3)
    out = multimodal.real_scene_cuts(media).collect()
    assert len(out) == 30
    for r in out:
        assert r.is_cut == (r.frame_idx == 3)


def test_vad_segments_runs_and_energies(spark):
    """VAD run-length semantics on the shared fixture pattern: frames
    (d+f)%3==0 are silent, actives get consecutive seg ids per run,
    silence gets NULL, and energies match a pure-Python decode."""
    from riemann_spark.functions import multimodal as mm
    from riemann_spark.functions.media_codecs import decode_wav

    d = spark.createDataFrame([(3,), (4,)], "doc_id long")
    media = mm.synthetic_wav_vad(d)
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    out = mm.real_vad_segments(media).collect()
    assert len(out) == 2 * mm.VAD_FRAMES
    for r in out:
        silent = (r.media_id + r.frame_idx) % 3 == 0
        assert r.active == (not silent)
        assert (r.seg_id is None) == silent
        _rate, smp = decode_wav(blobs[r.media_id])
        win = smp[r.frame_idx * 128 : (r.frame_idx + 1) * 128]
        assert r.energy == sum(s * s for s in win)
    # doc 3: silence at f=0,3,6 -> active runs (1,2),(4,5),(7) = segs 0,1,2
    segs3 = [r.seg_id for r in sorted(out, key=lambda r: r.frame_idx)
             if r.media_id == 3]
    assert segs3 == [None, 0, 0, None, 1, 1, None, 2]


def test_image_dhash_groups_and_dead_letter(spark):
    """Same-group fixtures hash Hamming-close (usually 0: the bump
    rarely crosses a box-sum comparison), different groups diverge,
    and a non-image payload dead-letters as a NULL row."""
    from riemann_spark.functions import multimodal as mm

    d = spark.createDataFrame([(0,), (1,), (4,), (8,)], "doc_id long")
    media = mm.synthetic_image_grid(d)  # groups: {0,1}, {4}, {8}
    sig = {r.media_id: (r.b0, r.b1, r.b2, r.b3)
           for r in mm.image_dhash_bands(media).collect()}

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(sig[a], sig[b]))

    assert ham(0, 1) <= 2          # same group g=0
    assert ham(0, 4) > 6           # g=0 vs g=1
    assert ham(4, 8) > 6           # g=1 vs g=2
    bad = spark.createDataFrame([(99, b"not an image")],
                                "media_id long, content binary")
    rows = mm.image_dhash_bands(bad).collect()
    assert rows[0].b0 is None and rows[0].media_id == 99


def test_audio_envelope_groups_and_dead_letter(spark):
    from riemann_spark.functions import multimodal as mm

    d = spark.createDataFrame([(0,), (1,), (4,)], "doc_id long")
    media = mm.synthetic_wav_groups(d)  # groups {0,1}, {4}
    fp = {r.media_id: r.envelope_fp
          for r in mm.audio_envelope_fp(media).collect()}
    assert fp[0] == fp[1]      # same group: bump doesn't move the envelope
    assert fp[0] != fp[4]      # different signal shape
    bad = spark.createDataFrame([(9, b"RIFFgarbage")],
                                "media_id long, content binary")
    assert mm.audio_envelope_fp(bad).collect()[0].envelope_fp is None
