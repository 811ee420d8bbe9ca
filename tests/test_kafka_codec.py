"""Kafka RecordBatch v2 codec: byte-level round trips, crc sealing,
and the Spark unwrapping path (kafka.clj:92-119 parity without a
broker — the JVM Kafka source does this server-side on a cluster)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riemann_spark.sources.kafka_codec import (
    crc32c,
    decode_record_batches,
    encode_record_batch,
    record_batches_to_rows,
    rows_to_record_batches,
)


def test_crc32c_known_answer():
    # the canonical check vector from RFC 3720 §B.4
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@pytest.mark.parametrize("compression", ["none", "gzip", "snappy"])
def test_batch_roundtrip(compression):
    recs = [
        {"key": b"k", "value": b"v1", "timestamp": 5, "headers": [("a", b"1")]},
        {"key": None, "value": b"v2", "timestamp": 9},
        {"value": None},  # tombstone-style null value
    ]
    blob = encode_record_batch(recs, base_offset=100, base_timestamp=5,
                               compression=compression)
    back = decode_record_batches(blob)
    assert [r["offset"] for r in back] == [100, 101, 102]
    assert [r["value"] for r in back] == [b"v1", b"v2", None]
    assert back[0]["key"] == b"k" and back[0]["headers"] == [("a", b"1")]
    assert [r["timestamp"] for r in back][:2] == [5, 9]


def test_concatenated_batches_and_errors():
    two = encode_record_batch([{"value": b"a"}]) + encode_record_batch(
        [{"value": b"b"}], base_offset=1
    )
    assert [r["value"] for r in decode_record_batches(two)] == [b"a", b"b"]
    # flipped payload byte must fail the crc, not return garbage
    bad = bytearray(encode_record_batch([{"value": b"abc"}]))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="crc32c"):
        decode_record_batches(bytes(bad))
    with pytest.raises(ValueError, match="trailing"):
        decode_record_batches(two + b"\x00")


def test_spark_pack_unpack_preserves_values(spark):
    df = spark.range(200).select(
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("v")
    )
    packed = rows_to_record_batches(df, "v", batch_size=16, compression="gzip")
    unpacked = record_batches_to_rows(packed)
    vals = sorted(bytes(r.value).decode() for r in unpacked.collect())
    assert vals == sorted(f"payload-{i}" for i in range(200))
    # offsets restart per encoded batch by design (broker assigns them)
    assert unpacked.count() == 200


def test_snappy_batch_xerial_framing():
    """Kafka's snappy codec is snappy-java's XERIAL stream framing
    (magic header + int32-length chunks of raw snappy blocks), not a
    bare block — assert the header is on the wire and that a >32 KB
    record section splits into multiple chunks that still round-trip."""
    import struct

    from riemann_spark.sources.kafka_codec import (
        _XERIAL_MAGIC,
        decode_record_batches,
        encode_record_batch,
    )

    recs = [{"value": (b"x%d" % i) * 2000, "timestamp": i} for i in range(40)]
    raw = encode_record_batch(recs, compression="snappy")
    # the compressed records section starts at batch offset 61
    assert _XERIAL_MAGIC in raw
    out = decode_record_batches(raw)
    assert [r["value"] for r in out] == [r["value"] for r in recs]
    assert [r["timestamp"] for r in out] == list(range(40))
