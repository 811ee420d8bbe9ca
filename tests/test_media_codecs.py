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
