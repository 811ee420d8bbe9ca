"""ws-server / sse-server loopback round-trips: real sockets, RFC 6455
framing, reference routes (websockets.clj:143-162, sse.clj:47-78)."""

from __future__ import annotations

import json
import socket
import urllib.request
from urllib.parse import quote

from riemann_spark.query import parse as parse_query
from riemann_spark.query.compiler import to_predicate
from riemann_spark.sources.sse import SseEventServer
from riemann_spark.sources.websockets import (
    WsClient,
    WsEventServer,
    encode_frame,
    read_frame,
)

INDEX = [
    {"host": "a", "service": "api", "state": "ok", "metric": 1.0},
    {"host": "b", "service": "api", "state": "critical", "metric": 9.0},
    {"host": "c", "service": "db", "state": "ok", "metric": 3.0},
]


def search(q: str) -> list[dict]:
    pred = to_predicate(parse_query(q))
    return [e for e in INDEX if pred(e)]


def test_ws_events_put_ingest():
    rows = [{"host": f"h{i}", "service": "s", "metric": float(i)} for i in range(3)]
    body = "\n".join(json.dumps(r) for r in rows).encode()
    with WsEventServer() as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/events", data=body, method="PUT"
        )
        resp = json.load(urllib.request.urlopen(req, timeout=10))
        assert resp == [{"ok": True}] * 3
        assert srv.ingested == rows


def test_ws_index_snapshot_then_live():
    q = quote('state = "ok"')
    with WsEventServer(index_search=search) as srv:
        c = WsClient(srv.port, f"/index?query={q}&subscribe=true")
        snap = [json.loads(c.recv_text()) for _ in range(2)]
        assert [e["host"] for e in snap] == ["a", "c"]
        srv.wait_subscribers("index")
        srv.publish("index", [
            {"host": "d", "state": "ok", "metric": 2.0},
            {"host": "e", "state": "critical", "metric": 8.0},  # filtered
            {"host": "f", "state": "ok", "metric": 4.0},
        ])
        assert json.loads(c.recv_text())["host"] == "d"
        assert json.loads(c.recv_text())["host"] == "f"
        c.close()


def test_ws_index_snapshot_only_closes():
    q = quote("metric > 2")
    with WsEventServer(index_search=search) as srv:
        c = WsClient(srv.port, f"/index?query={q}")
        assert json.loads(c.recv_text())["host"] == "b"
        assert json.loads(c.recv_text())["host"] == "c"
        assert c.recv_text() is None  # server-sent close
        c.close()


def test_ws_pubsub_channel_and_ping():
    with WsEventServer() as srv:
        c = WsClient(srv.port, "/pubsub/alerts?query=" + quote("metric > 5"))
        srv.wait_subscribers("alerts")
        # ping → pong (control frames pass through the read loop)
        c._sock.sendall(encode_frame(b"hi", opcode=9, mask=True))
        op, payload = read_frame(c._rf)
        assert (op, payload) == (10, b"hi")
        srv.publish("alerts", [{"host": "x", "metric": 6.0}, {"host": "y", "metric": 1.0}])
        assert json.loads(c.recv_text())["host"] == "x"
        c.close()


def test_sse_stream_filters_by_query():
    with SseEventServer() as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        q = quote('service = "api"')
        s.sendall(
            f"GET /index?query={q} HTTP/1.1\r\n"
            f"Host: 127.0.0.1\r\nAccept: text/event-stream\r\n\r\n".encode()
        )
        rf = s.makefile("rb")
        status = rf.readline()
        assert b"200" in status
        while rf.readline() not in (b"\r\n", b"\n", b""):
            pass
        srv.wait_subscribers()
        srv.publish([
            {"host": "a", "service": "api", "metric": 1.0},
            {"host": "b", "service": "db", "metric": 2.0},  # filtered
            {"host": "c", "service": "api", "metric": 3.0},
        ])
        line = rf.readline()
        assert line.startswith(b"data: ")
        assert json.loads(line[6:])["host"] == "a"
        assert rf.readline() == b"\n"
        line = rf.readline()
        assert json.loads(line[6:])["host"] == "c"
        s.close()
