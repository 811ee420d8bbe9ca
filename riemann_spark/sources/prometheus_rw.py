"""Prometheus remote-write: the REAL wire protocol — snappy-compressed
protobuf ``prompb.WriteRequest`` bodies POSTed with the remote-write
headers. Complements the exposition-text pushgateway path
(tsdb_lines.py / prometheus.clj:118-145) with what a modern Prometheus
/ Mimir / Thanos receiver actually speaks.

Both layers are hand-rolled pure Python from the public specs, in the
same style as sources/protobuf.py and sources/kafka_codec.py (no
snappy or protobuf packages in this container):

- snappy block format (google/snappy format_description.txt): uvarint
  preamble with the uncompressed length, then tagged chunks — 00
  literal, 01 copy with 1-byte offset, 10 copy with 2-byte offset,
  11 copy with 4-byte offset. The COMPRESSOR here emits literals plus
  2-byte-offset copies found by a 4-byte rolling hash table (the same
  greedy scheme the reference C implementation uses); the
  DECOMPRESSOR handles the full spec including overlapping copies
  (the RLE idiom: offset < length).
- prompb (prometheus/prompb/remote.proto + types.proto, public):
  WriteRequest{repeated TimeSeries=1}; TimeSeries{repeated Label=1,
  repeated Sample=2}; Label{name=1, value=2}; Sample{value=1 double,
  timestamp=2 int64 milliseconds}.

Event mapping follows the exposition formatter: metric name =
sanitized service (prometheus.clj replace-disallowed), ``host`` label,
``tags`` label joined by the separator; the name rides the reserved
``__name__`` label per the remote-write spec.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

from riemann_spark.sources.protobuf import (
    _msg_field,
    _read_uvarint,
    _str_field,
    _tag,
    _uvarint,
)

_LEN = 2  # protobuf length-delimited wire type
_FIX64 = 1

# ------------------------------------------------------------ snappy --

_MIN_MATCH = 4
_MAX_OFFSET_2B = 0xFFFF


def snappy_compress(data: bytes) -> bytes:
    """Snappy block-format compress: greedy 4-byte-hash matcher
    emitting literals and 2-byte-offset copies. Every output is a
    spec-valid snappy stream (worst case: one big literal)."""
    n = len(data)
    out = bytearray(_uvarint(n))

    def emit_literal(lo: int, hi: int) -> None:
        ln = hi - lo
        while ln > 0:
            chunk = min(ln, 0x10000)
            if chunk <= 60:
                out.append(((chunk - 1) << 2) | 0)
            elif chunk <= 0x100:
                out.append((60 << 2) | 0)
                out.append(chunk - 1)
            else:
                out.append((61 << 2) | 0)
                out.extend(struct.pack("<H", chunk - 1))
            out.extend(data[lo : lo + chunk])
            lo += chunk
            ln -= chunk

    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + _MIN_MATCH <= n:
        key = data[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_OFFSET_2B:
            # extend the match
            m = _MIN_MATCH
            while i + m < n and data[cand + m] == data[i + m] and m < 64:
                m += 1
            emit_literal(lit_start, i)
            out.append(((m - 1) << 2) | 2)  # copy, 2-byte offset
            out += struct.pack("<H", i - cand)
            i += m
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)


def snappy_decompress(blob: bytes) -> bytes:
    """Full-spec snappy block decompress (all four tag types,
    overlapping copies byte-by-byte per the RLE idiom)."""
    expect, i = _read_uvarint(blob, 0)
    out = bytearray()
    n = len(blob)
    while i < n:
        tag = blob[i]
        i += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln < 60:
                ln += 1
            else:
                extra = ln - 59
                ln = int.from_bytes(blob[i : i + extra], "little") + 1
                i += extra
            out += blob[i : i + ln]
            i += ln
            continue
        if ttype == 1:  # copy, 1-byte offset, 3-bit length
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | blob[i]
            i += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = struct.unpack_from("<H", blob, i)[0]
            i += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = struct.unpack_from("<I", blob, i)[0]
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: invalid copy offset")
        start = len(out) - off
        for k in range(ln):  # may overlap its own output
            out.append(out[start + k])
    if len(out) != expect:
        raise ValueError(f"snappy: length mismatch {len(out)} != {expect}")
    return bytes(out)


# ------------------------------------------------------------ prompb --

def _sanitize(name: str) -> str:
    """replace-disallowed (prometheus.clj:12-15)."""
    import re

    return re.sub(r"_{2,}", "_", re.sub(r"[^a-zA-Z0-9_]", "_", name))


def encode_write_request(
    rows: list[dict], separator: str = ","
) -> bytes:
    """rows: dicts with service/host/metric/time (+tags list). One
    TimeSeries per event (the remote-write batch shape riemann's
    per-event forwarders would produce); timestamp in ms."""
    out = bytearray()
    for r in rows:
        if r.get("service") is None or r.get("metric") is None:
            continue
        ts = bytearray()
        labels = [("__name__", _sanitize(str(r["service"])))]
        if r.get("host") is not None:
            labels.append(("host", str(r["host"])))
        if r.get("tags"):
            labels.append(("tags", separator.join(map(str, r["tags"]))))
        for k, v in labels:
            ts += _msg_field(1, _str_field(1, k) + _str_field(2, v))
        sample = (
            _tag(1, _FIX64)
            + struct.pack("<d", float(r["metric"]))
            + _tag(2, 0)
            + _uvarint(int(float(r.get("time") or 0.0) * 1000) & 0xFFFFFFFFFFFFFFFF)
        )
        ts += _msg_field(2, sample)
        out += _msg_field(1, bytes(ts))
    return bytes(out)


def decode_write_request(buf: bytes) -> list[dict]:
    """WriteRequest bytes → [{name, labels, value, timestamp_ms}]."""

    def fields(b: bytes) -> Iterator[tuple[int, int, bytes | int]]:
        i, n = 0, len(b)
        while i < n:
            key, i = _read_uvarint(b, i)
            f, wt = key >> 3, key & 7
            if wt == _LEN:
                ln, i = _read_uvarint(b, i)
                yield f, wt, b[i : i + ln]
                i += ln
            elif wt == 0:
                v, i = _read_uvarint(b, i)
                yield f, wt, v
            elif wt == _FIX64:
                yield f, wt, b[i : i + 8]
                i += 8
            else:
                raise ValueError(f"unsupported wire type {wt}")

    series = []
    for f, _, ts_bytes in fields(buf):
        if f != 1:
            continue
        labels: dict[str, str] = {}
        value = None
        ts_ms = None
        for g, wt, payload in fields(ts_bytes):
            if g == 1:  # Label
                # kv.get defaults: a foreign sender may omit name or
                # value (proto3 default "" is not serialized).
                kv = {h: p for h, _, p in fields(payload)}
                labels[kv.get(1, b"").decode()] = kv.get(2, b"").decode()
            elif g == 2:  # Sample
                for h, swt, p in fields(payload):
                    if h == 1:
                        value = struct.unpack("<d", p)[0]
                    elif h == 2:
                        # int64 on the wire is a two's-complement
                        # uvarint: sign-convert negative timestamps.
                        ts_ms = p if isinstance(p, int) else None
                        if ts_ms is not None and ts_ms >= 1 << 63:
                            ts_ms -= 1 << 64
        series.append(
            {
                "name": labels.get("__name__"),
                "labels": {k: v for k, v in labels.items() if k != "__name__"},
                "value": value,
                "timestamp_ms": ts_ms,
            }
        )
    return series


# ----------------------------------------------------- spark plumbing --

_RW_SCHEMA = "body binary"
_RW_DEC_SCHEMA = (
    "name string, host string, tags_label string, value double, timestamp_ms long"
)


def events_to_remote_write(df: DataFrame) -> DataFrame:
    """Encode event rows into per-Arrow-batch snappy-compressed
    WriteRequest bodies (binary column ``body``) — the egress half,
    distributed via mapInPandas like the protobuf Msg codec."""
    import pandas as pd

    cols = [c for c in ("host", "service", "metric", "tags", "time") if c in df.columns]

    def enc(batches):
        for pdf in batches:
            rows = []
            series = [pdf[c] for c in cols]
            for vals in zip(*[s.to_numpy() for s in series]):
                d = dict(zip(cols, vals))
                if d.get("tags") is not None and not isinstance(d["tags"], list):
                    d["tags"] = list(d["tags"])
                rows.append(d)
            yield pd.DataFrame({"body": [snappy_compress(encode_write_request(rows))]})

    from riemann_spark.operators.skew import spread_for_python

    return spread_for_python(df.select(*cols)).mapInPandas(enc, _RW_SCHEMA)


def remote_write_to_samples(df: DataFrame, bin_col: str = "body") -> DataFrame:
    """Decode remote-write bodies back to sample rows (ingest half —
    what a receiver endpoint does)."""
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            names, hosts, tags_l, values, tss = [], [], [], [], []
            for body in pdf[bin_col]:
                for s in decode_write_request(snappy_decompress(bytes(body))):
                    names.append(s["name"])
                    hosts.append(s["labels"].get("host"))
                    tags_l.append(s["labels"].get("tags"))
                    values.append(s["value"])
                    tss.append(s["timestamp_ms"])
            yield pd.DataFrame(
                {
                    "name": names,
                    "host": hosts,
                    "tags_label": tags_l,
                    "value": values,
                    "timestamp_ms": tss,
                }
            )

    return df.mapInPandas(dec, _RW_DEC_SCHEMA)
