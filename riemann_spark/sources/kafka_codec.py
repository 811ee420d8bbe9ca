"""Kafka RecordBatch (magic v2) wire codec — pure stdlib.

The reference's kafka-consumer (kafka.clj:92-119) hands record VALUES
to its message codecs; the broker-side byte layout is the public Kafka
protocol's RecordBatch v2 (KIP-98 format, documented in the Kafka
protocol guide): a fixed 61-byte batch header (big-endian, crc32c over
attributes..end) followed by varint-delimited records whose signed
ints are zigzag-encoded. This module implements that layout so the
Kafka ingest path has a correctness-checkable codec without a broker:

- ``encode_record_batch`` / ``decode_record_batches`` — byte-level
  round trip, including gzip-compressed record sections (attribute
  codec bits) and record headers.
- ``record_batches_to_rows`` — Arrow-batched mapInPandas: binary
  batch column → one row per record (offset, timestamp, key, value),
  composing with ``msg_binary_to_events`` / ``events_from_json`` for
  the value payload exactly like ``read_kafka_msg_frames`` does on a
  live broker (there the JVM Kafka source does this unwrapping).

crc32c is the Castagnoli CRC (reflected poly 0x82F63B78) — table-
driven, byte-at-a-time; zlib.crc32 is the wrong polynomial.
"""

from __future__ import annotations

import gzip
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

# ------------------------------------------------------------ crc32c

_CRC32C_TABLE: list[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------- zigzag varints

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _varint(n: int) -> bytes:
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


# ------------------------------------------------------ batch codec

_CODEC_NONE, _CODEC_GZIP, _CODEC_SNAPPY = 0, 1, 2

# Kafka's snappy codec uses snappy-java's XERIAL stream framing, not
# bare blocks: an 8-byte magic + two int32 version fields, then
# [int32 length][raw snappy block] chunks (32 KB input per chunk).
# The raw blocks are the same snappy block format our hand-rolled
# codec in sources/prometheus_rw.py speaks.
_XERIAL_MAGIC = b"\x82SNAPPY\x00"
_XERIAL_BLOCK = 32 * 1024


def _xerial_compress(data: bytes) -> bytes:
    from riemann_spark.sources.prometheus_rw import snappy_compress

    out = bytearray(_XERIAL_MAGIC + struct.pack(">ii", 1, 1))
    for i in range(0, len(data), _XERIAL_BLOCK):
        blk = snappy_compress(data[i : i + _XERIAL_BLOCK])
        out += struct.pack(">i", len(blk)) + blk
    return bytes(out)


def _xerial_decompress(data: bytes) -> bytes:
    from riemann_spark.sources.prometheus_rw import snappy_decompress

    if not data.startswith(_XERIAL_MAGIC):
        # some producers ship bare snappy blocks; accept those too
        return snappy_decompress(data)
    i, out = 16, bytearray()
    while i + 4 <= len(data):
        (n,) = struct.unpack_from(">i", data, i)
        i += 4
        out += snappy_decompress(bytes(data[i : i + n]))
        i += n
    return bytes(out)


def _encode_record(
    offset_delta: int,
    ts_delta: int,
    key: bytes | None,
    value: bytes | None,
    headers: list[tuple[str, bytes | None]],
) -> bytes:
    body = bytearray(b"\x00")  # record attributes: unused, always 0
    body += _varint(ts_delta)
    body += _varint(offset_delta)
    for blob in (key, value):
        if blob is None:
            body += _varint(-1)
        else:
            body += _varint(len(blob)) + blob
    body += _varint(len(headers))
    for hk, hv in headers:
        kb = hk.encode()
        body += _varint(len(kb)) + kb
        if hv is None:
            body += _varint(-1)
        else:
            body += _varint(len(hv)) + hv
    return _varint(len(body)) + bytes(body)


def encode_record_batch(
    records: list[dict[str, Any]],
    base_offset: int = 0,
    base_timestamp: int = 0,
    compression: str = "none",
) -> bytes:
    """One RecordBatch from record dicts with optional ``key`` /
    ``value`` (bytes), ``timestamp`` (int ms), ``headers``
    (list of (str, bytes))."""
    if not records:
        raise ValueError("empty batch")
    stamps = [int(r.get("timestamp", base_timestamp)) for r in records]
    payload = b"".join(
        _encode_record(
            i,
            stamps[i] - base_timestamp,
            r.get("key"),
            r.get("value"),
            r.get("headers", []),
        )
        for i, r in enumerate(records)
    )
    if compression == "gzip":
        attrs = _CODEC_GZIP
        payload = gzip.compress(payload, mtime=0)  # mtime=0: deterministic
    elif compression == "snappy":
        attrs = _CODEC_SNAPPY
        payload = _xerial_compress(payload)
    elif compression == "none":
        attrs = _CODEC_NONE
    else:
        raise ValueError(f"unsupported compression {compression!r}")
    # header fields after crc, then the records section
    tail = (
        struct.pack(
            ">hiqqqhii",
            attrs,
            len(records) - 1,      # lastOffsetDelta
            base_timestamp,
            max(stamps),
            -1,                    # producerId (idempotence off)
            -1,                    # producerEpoch
            -1,                    # baseSequence
            len(records),
        )
        + payload
    )
    crc = crc32c(tail)
    # batchLength counts bytes after the batchLength field itself
    inner = struct.pack(">ibI", -1, 2, crc) + tail  # leaderEpoch, magic, crc
    return struct.pack(">qi", base_offset, len(inner)) + inner


def decode_record_batches(data: bytes) -> list[dict[str, Any]]:
    """Concatenated RecordBatches → flat record list with absolute
    ``offset`` / ``timestamp`` plus ``key`` / ``value`` / ``headers``.
    crc32c is verified per batch; unknown magic or a bad crc raises."""
    out: list[dict[str, Any]] = []
    pos = 0
    while pos + 12 <= len(data):
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        end = pos + 12 + batch_len
        (
            _epoch, magic, crc, attrs, _last_delta, base_ts, _max_ts,
            _pid, _pepoch, _pseq, n_records,
        ) = struct.unpack_from(">ibIhiqqqhii", data, pos + 12)
        if magic != 2:
            raise ValueError(f"unsupported batch magic {magic}")
        if crc32c(data[pos + 21 : end]) != crc:
            raise ValueError("RecordBatch crc32c mismatch")
        payload = data[pos + 61 : end]
        if attrs & 0x07 == _CODEC_GZIP:
            payload = gzip.decompress(payload)
        elif attrs & 0x07 == _CODEC_SNAPPY:
            payload = _xerial_decompress(payload)
        elif attrs & 0x07 != _CODEC_NONE:
            raise ValueError(f"unsupported compression codec {attrs & 0x07}")
        i = 0
        for _ in range(n_records):
            rec_len, i = _read_varint(payload, i)
            rec_end = i + rec_len
            i += 1  # record attributes
            ts_delta, i = _read_varint(payload, i)
            off_delta, i = _read_varint(payload, i)
            blobs: list[bytes | None] = []
            for _b in range(2):
                ln, i = _read_varint(payload, i)
                if ln < 0:
                    blobs.append(None)
                else:
                    blobs.append(payload[i : i + ln])
                    i += ln
            n_hdr, i = _read_varint(payload, i)
            headers: list[tuple[str, bytes | None]] = []
            for _h in range(n_hdr):
                kl, i = _read_varint(payload, i)
                hk = payload[i : i + kl].decode()
                i += kl
                vl, i = _read_varint(payload, i)
                if vl < 0:
                    headers.append((hk, None))
                else:
                    headers.append((hk, payload[i : i + vl]))
                    i += vl
            if i != rec_end:
                raise ValueError("record length mismatch")
            out.append(
                {
                    "offset": base_offset + off_delta,
                    "timestamp": base_ts + ts_delta,
                    "key": blobs[0],
                    "value": blobs[1],
                    "headers": headers,
                }
            )
        pos = end
    if pos != len(data):
        raise ValueError("trailing bytes after last batch")
    return out


# ----------------------------------------------------- spark wiring

RECORD_SCHEMA = StructType(
    [
        StructField("offset", LongType()),
        StructField("timestamp", LongType()),
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
    ]
)

_BATCH_SCHEMA = StructType([StructField("batch", BinaryType())])


def record_batches_to_rows(df: DataFrame, bin_col: str = "batch") -> DataFrame:
    """Binary RecordBatch column → one row per record (the unwrapping
    a live Kafka source does broker-side). Arrow-batched mapInPandas;
    the heavy value blob stays put — no shuffle."""
    import pandas as pd

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            offs, stamps, keys, vals = [], [], [], []
            for buf in pdf[bin_col]:
                for r in decode_record_batches(bytes(buf)):
                    offs.append(r["offset"])
                    stamps.append(r["timestamp"])
                    keys.append(r["key"])
                    vals.append(r["value"])
            yield pd.DataFrame(
                {"offset": offs, "timestamp": stamps, "key": keys, "value": vals}
            )

    return df.select(bin_col).mapInPandas(dec, RECORD_SCHEMA)


def rows_to_record_batches(
    df: DataFrame,
    value_col: str,
    batch_size: int = 64,
    compression: str = "none",
) -> DataFrame:
    """Pack a binary value column into RecordBatches (the producer
    half, for tests/egress): consecutive rows within each Arrow batch
    chunk into batches of ``batch_size`` records. Offsets restart per
    partition — callers needing global offsets own that assignment,
    exactly as a real broker does."""
    import pandas as pd

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [bytes(v) for v in pdf[value_col]]
            blobs = [
                encode_record_batch(
                    [{"value": v} for v in vals[i : i + batch_size]],
                    base_offset=i,
                    compression=compression,
                )
                for i in range(0, len(vals), batch_size)
            ]
            yield pd.DataFrame({"batch": blobs})

    return df.select(value_col).mapInPandas(enc, _BATCH_SCHEMA)
