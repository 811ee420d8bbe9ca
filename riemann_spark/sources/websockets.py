"""WebSocket server — loopback parity for the reference's ws-server.

Routes (/root/reference/src/riemann/transport/websockets.clj:143-162):

- ``PUT/POST /events``   — HTTP ingest: one JSON event per line
  (put-events-handler, websockets.clj:94-133).
- ``GET /index?query=Q[&subscribe=true]`` — WS upgrade: stream the
  current index search results for Q, then (if subscribing) live
  events published to the "index" channel (ws-index-handler,
  websockets.clj:66-92).
- ``GET /pubsub/<channel>?query=Q`` — WS upgrade: live events from an
  arbitrary pubsub channel (ws-pubsub-handler, websockets.clj:36-64).

The container has no websocket library, so RFC 6455 itself (the public
spec: Sec-WebSocket-Accept SHA1 handshake, frame header + client
masking) is implemented here directly — same approach as the protobuf
wire codec. Subscription predicates compile through the query
language's python backend (``query.compiler.to_predicate``), the same
grammar the Column/SQL backends use.

Serving is driver-side by design: subscribers receive alert-volume
streams (an index channel), not the raw firehose — the raw stream
rides Kafka/parquet sinks.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import socketserver
import struct
import threading
from collections.abc import Callable
from urllib.parse import parse_qs, unquote, urlsplit

from riemann_spark.query import parse as parse_query
from riemann_spark.query.compiler import to_predicate

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# index search callable: query string -> event dicts
IndexSearch = Callable[[str], list[dict]]


def _accept_key(key: str) -> str:
    return base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()


def encode_frame(payload: bytes, opcode: int = 1, mask: bool = False) -> bytes:
    out = bytearray([0x80 | opcode])
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        out.append(mbit | n)
    elif n < 1 << 16:
        out.append(mbit | 126)
        out += struct.pack(">H", n)
    else:
        out.append(mbit | 127)
        out += struct.pack(">Q", n)
    if mask:
        mk = os.urandom(4)
        out += mk + bytes(b ^ mk[i % 4] for i, b in enumerate(payload))
    else:
        out += payload
    return bytes(out)


def read_frame(rf) -> tuple[int, bytes] | None:
    """Read one frame; None on clean EOF. Unmasks client payloads."""
    head = rf.read(2)
    if len(head) < 2:
        return None
    opcode = head[0] & 0x0F
    masked = head[1] & 0x80
    n = head[1] & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", rf.read(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", rf.read(8))
    mk = rf.read(4) if masked else None
    payload = rf.read(n)
    if mk:
        payload = bytes(b ^ mk[i % 4] for i, b in enumerate(payload))
    return opcode, payload


def _read_http_head(rf) -> tuple[str, str, dict[str, str]] | None:
    line = rf.readline()
    if not line:
        return None
    try:
        method, target, _ = line.decode("latin-1").split(" ", 2)
    except ValueError:
        return None
    headers: dict[str, str] = {}
    while True:
        h = rf.readline()
        if h in (b"\r\n", b"\n", b""):
            break
        k, _, v = h.decode("latin-1").partition(":")
        headers[k.strip().lower()] = v.strip()
    return method, target, headers


class _Sub:
    def __init__(self, sock: socket.socket, pred):
        self.sock = sock
        self.pred = pred
        self.lock = threading.Lock()


class WsEventServer:
    """Threaded loopback ws-server. ``ingested`` collects /events
    rows; ``publish(channel, events)`` pushes to live subscribers."""

    def __init__(self, index_search: IndexSearch | None = None):
        self.ingested: list[dict] = []
        self._subs: dict[str, list[_Sub]] = {}
        self._lock = threading.Lock()
        self._index_search = index_search
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                rf = self.request.makefile("rb")
                head = _read_http_head(rf)
                if head is None:
                    return
                method, target, headers = head
                url = urlsplit(target)
                params = {k: v[0] for k, v in parse_qs(url.query).items()}
                if headers.get("upgrade", "").lower() == "websocket":
                    outer._handle_ws(self.request, rf, url.path, params, headers)
                elif url.path.rstrip("/") == "/events" and method in ("PUT", "POST"):
                    n = int(headers.get("content-length", "0"))
                    body = rf.read(n).decode("utf-8")
                    rows = [json.loads(ln) for ln in body.splitlines() if ln.strip()]
                    with outer._lock:
                        outer.ingested.extend(rows)
                    resp = json.dumps([{"ok": True} for _ in rows]).encode()
                    self.request.sendall(
                        b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
                        + f"Content-Length: {len(resp)}\r\n\r\n".encode()
                        + resp
                    )
                else:
                    self.request.sendall(
                        b"HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n"
                    )

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.port: int = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    # ------------------------------------------------------------ ws

    def _handle_ws(self, sock, rf, path: str, params: dict, headers: dict) -> None:
        sock.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            b"Connection: Upgrade\r\nSec-WebSocket-Accept: "
            + _accept_key(headers["sec-websocket-key"]).encode()
            + b"\r\n\r\n"
        )
        q = params.get("query", "true")
        pred = to_predicate(parse_query(q))
        parts = [p for p in path.split("/") if p]
        sub: _Sub | None = None
        if parts and parts[0] == "index":
            if self._index_search is not None:
                for e in self._index_search(q):
                    sock.sendall(encode_frame(json.dumps(e).encode()))
            if params.get("subscribe") == "true":
                sub = self._register("index", _Sub(sock, pred))
        elif len(parts) == 2 and parts[0] == "pubsub":
            sub = self._register(unquote(parts[1]), _Sub(sock, pred))
        if sub is None:
            # snapshot-only connection: server closes after the send,
            # like ws-index-handler without subscribe=true
            try:
                sock.sendall(encode_frame(b"", opcode=8))
            except OSError:
                pass
            return
        # read loop: answer pings, stop on close/EOF (unsubscribe)
        try:
            while True:
                fr = read_frame(rf)
                if fr is None or fr[0] == 8:
                    break
                if fr[0] == 9:
                    with sub.lock:
                        sock.sendall(encode_frame(fr[1], opcode=10))
        finally:
            self._unregister(sub)

    def _register(self, channel: str, sub: _Sub) -> _Sub:
        with self._lock:
            self._subs.setdefault(channel, []).append(sub)
        return sub

    def _unregister(self, sub: _Sub) -> None:
        with self._lock:
            for subs in self._subs.values():
                if sub in subs:
                    subs.remove(sub)

    # ------------------------------------------------------- control

    def publish(self, channel: str, events: list[dict]) -> None:
        """Push events to every live subscriber whose predicate
        matches — pubsub/publish! fan-out (pubsub.clj:70-77)."""
        with self._lock:
            subs = list(self._subs.get(channel, ()))
        for sub in subs:
            try:
                for e in events:
                    if sub.pred(e):
                        with sub.lock:
                            sub.sock.sendall(encode_frame(json.dumps(e).encode()))
            except OSError:
                self._unregister(sub)

    def wait_subscribers(self, channel: str, n: int = 1, timeout: float = 5.0) -> None:
        """Block until ``n`` live subscribers exist on ``channel`` —
        registration happens on the handler thread after the
        handshake, so publishers (and tests) sync on it."""
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                if len(self._subs.get(channel, ())) >= n:
                    return
            time.sleep(0.02)
        raise TimeoutError(f"no {n} subscribers on {channel!r} within {timeout}s")

    def __enter__(self) -> "WsEventServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()


class WsClient:
    """Minimal RFC 6455 client for loopback tests (masked frames, as
    the spec requires of clients)."""

    def __init__(self, port: int, path: str, host: str = "127.0.0.1"):
        self._sock = socket.create_connection((host, port), timeout=10)
        key = base64.b64encode(os.urandom(16)).decode()
        self._sock.sendall(
            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            f"Sec-WebSocket-Version: 13\r\n\r\n".encode()
        )
        self._rf = self._sock.makefile("rb")
        status = self._rf.readline()
        if b"101" not in status:
            raise ConnectionError(f"handshake rejected: {status!r}")
        accept = None
        while True:
            h = self._rf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("latin-1").partition(":")
            if k.strip().lower() == "sec-websocket-accept":
                accept = v.strip()
        if accept != _accept_key(key):
            raise ConnectionError("bad Sec-WebSocket-Accept")

    def recv_text(self) -> str | None:
        """Next text payload; None when the server closes."""
        while True:
            fr = read_frame(self._rf)
            if fr is None or fr[0] == 8:
                return None
            if fr[0] == 1:
                return fr[1].decode("utf-8")

    def send_text(self, s: str) -> None:
        self._sock.sendall(encode_frame(s.encode(), mask=True))

    def close(self) -> None:
        try:
            self._sock.sendall(encode_frame(b"", opcode=8, mask=True))
        except OSError:
            pass
        self._sock.close()
