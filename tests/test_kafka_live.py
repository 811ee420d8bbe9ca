"""Live-broker Kafka integration (kafka.clj:92-119 parity, the real
thing): requires a reachable broker named in $KAFKA_BOOTSTRAP_SERVERS
plus the spark-sql-kafka package, so it SKIPS cleanly in this
container (no broker, no package) and goes green anywhere a broker
exists — e.g. ``docker run -p 9092:9092 apache/kafka`` then
``KAFKA_BOOTSTRAP_SERVERS=localhost:9092 pytest tests/test_kafka_live.py``.

The produce side writes wire-correct RecordBatch v2 bytes with OUR
codec (sources/kafka_codec.py) straight onto the broker socket via the
public Kafka Produce API — the same bytes the codec tests seal — so
the broker round-trip proves codec + reader share one wire format:
what ``rows_to_record_batches`` packs is exactly what
``read_kafka_events`` / ``read_kafka_msg_frames`` consume.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not BOOTSTRAP,
        reason="no live broker: set KAFKA_BOOTSTRAP_SERVERS (e.g. localhost:9092)",
    ),
]


def _kafka_request(sock: socket.socket, api_key: int, api_version: int,
                   correlation_id: int, body: bytes, client_id: str = "rspark-test") -> bytes:
    """Frame one Kafka protocol request (public wire format: int32 size
    header, int16 api_key/version, int32 correlation id, nullable
    string client id) and read the full response."""
    cid = client_id.encode()
    header = struct.pack(">hhih", api_key, api_version, correlation_id, len(cid)) + cid
    msg = header + body
    sock.sendall(struct.pack(">i", len(msg)) + msg)
    (size,) = struct.unpack(">i", _read_exact(sock, 4))
    return _read_exact(sock, size)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("broker closed connection")
        buf += chunk
    return buf


def _produce_v3(bootstrap: str, topic: str, batch: bytes) -> None:
    """Produce API v3 (message.format.v2 floor): one topic, partition 0,
    acks=-1. Body layout per the public protocol spec."""
    host, port = bootstrap.split(":")
    t = topic.encode()
    partition_data = struct.pack(">ii", 0, len(batch)) + batch
    topic_data = (
        struct.pack(">h", len(t)) + t + struct.pack(">i", 1) + partition_data
    )
    body = (
        struct.pack(">h", -1)  # transactional_id: null
        + struct.pack(">hi", -1, 30000)  # acks=-1, timeout
        + struct.pack(">i", 1)  # 1 topic
        + topic_data
    )
    with socket.create_connection((host, int(port)), timeout=10) as sock:
        resp = _kafka_request(sock, api_key=0, api_version=3,
                              correlation_id=1, body=body)
        # response: correlation_id, [topics: name [partitions: idx err ...]]
        off = 4
        (n_topics,) = struct.unpack_from(">i", resp, off)
        off += 4
        (tlen,) = struct.unpack_from(">h", resp, off)
        off += 2 + tlen
        (n_parts,) = struct.unpack_from(">i", resp, off)
        off += 4
        _idx, err = struct.unpack_from(">ih", resp, off)
        assert err == 0, f"broker produce error code {err}"


def test_live_json_events_roundtrip(spark, tmp_path):
    """events → OUR RecordBatch bytes → broker → read_kafka_events →
    event rows. Asserts the full kafka-consumer parity path."""
    from riemann_spark.sources.kafka_codec import encode_record_batch
    from riemann_spark.sources.readers import read_kafka_events

    topic = f"rspark_live_{uuid.uuid4().hex[:8]}"
    events = [
        {"host": "h1", "service": "cpu", "state": "ok", "metric": 0.5,
         "time": 100.0, "tags": ["t1"]},
        {"host": "h2", "service": "mem", "state": "warning", "metric": 0.9,
         "time": 101.0, "tags": []},
    ]
    batch = encode_record_batch(
        [{"value": json.dumps(e).encode()} for e in events]
    )
    _produce_v3(BOOTSTRAP, topic, batch)

    stream = read_kafka_events(
        spark, BOOTSTRAP, topic, starting_offsets="earliest"
    )
    name = f"kl_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.host: (r.service, r.state, r.metric) for r in spark.table(name).collect()}
    assert rows == {"h1": ("cpu", "ok", 0.5), "h2": ("mem", "warning", 0.9)}


def test_live_msg_frames_roundtrip(spark, tmp_path):
    """Protobuf Msg frames over Kafka (the TCP transport bridged):
    events_to_msg_binary bytes produced with the wire codec, consumed
    by read_kafka_msg_frames — codec and reader share one code path."""
    from riemann_spark.sources.kafka_codec import encode_record_batch
    from riemann_spark.sources.protobuf import encode_msg
    from riemann_spark.sources.readers import read_kafka_msg_frames

    topic = f"rspark_msg_{uuid.uuid4().hex[:8]}"
    msg = encode_msg(
        [{"host": "h3", "service": "disk", "metric": 7.5, "time_us": 5_000_000}]
    )
    _produce_v3(BOOTSTRAP, topic, encode_record_batch([{"value": msg}]))

    stream = read_kafka_msg_frames(spark, BOOTSTRAP, topic, starting_offsets="earliest")
    name = f"km_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert [(r.host, r.service, r.metric) for r in rows] == [("h3", "disk", 7.5)]
