"""Server-Sent Events egress — loopback parity for the reference's
sse-server (/root/reference/src/riemann/transport/sse.clj:47-78):
``GET /index?query=Q`` holds the connection open as
``text/event-stream`` and pushes every published event matching Q as
a ``data: <json>`` record (sse-out, sse.clj:37-45).

Same serving posture as the ws-server: driver-side push of
alert-volume channels, predicates compiled by the query language's
python backend. Pure stdlib — SSE is just line-framed HTTP.
"""

from __future__ import annotations

import json
import socketserver
import threading
from urllib.parse import parse_qs, urlsplit

from riemann_spark.query import parse as parse_query
from riemann_spark.query.compiler import to_predicate
from riemann_spark.sources.websockets import _read_http_head


class _Sub:
    def __init__(self, sock, pred):
        self.sock = sock
        self.pred = pred
        self.lock = threading.Lock()


class SseEventServer:
    def __init__(self) -> None:
        self._subs: list[_Sub] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                rf = self.request.makefile("rb")
                head = _read_http_head(rf)
                if head is None:
                    return
                _, target, _headers = head
                url = urlsplit(target)
                params = {k: v[0] for k, v in parse_qs(url.query).items()}
                pred = to_predicate(parse_query(params.get("query", "true")))
                self.request.sendall(
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/event-stream\r\n"
                    b"Cache-Control: no-cache\r\nConnection: close\r\n\r\n"
                )
                sub = _Sub(self.request, pred)
                with outer._lock:
                    outer._subs.append(sub)
                # hold the connection until the client disconnects
                try:
                    while rf.read(1):
                        pass
                except OSError:
                    pass
                finally:
                    with outer._lock:
                        if sub in outer._subs:
                            outer._subs.remove(sub)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.port: int = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def publish(self, events: list[dict]) -> None:
        with self._lock:
            subs = list(self._subs)
        for sub in subs:
            try:
                for e in events:
                    if sub.pred(e):
                        with sub.lock:
                            sub.sock.sendall(
                                b"data: " + json.dumps(e).encode() + b"\n\n"
                            )
            except OSError:
                with self._lock:
                    if sub in self._subs:
                        self._subs.remove(sub)

    def wait_subscribers(self, n: int = 1, timeout: float = 5.0) -> None:
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                if len(self._subs) >= n:
                    return
            time.sleep(0.02)
        raise TimeoutError(f"no {n} subscribers within {timeout}s")

    def __enter__(self) -> "SseEventServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
