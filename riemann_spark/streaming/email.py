"""Email (SMTP) sink: the reference's mailer
(/root/reference/src/riemann/email.clj:1-90) with its default
subject/body formatters (common.clj:246-295).

The reference wraps postal; here the wire half is stdlib ``smtplib``
(plus optional STARTTLS/SSL and AUTH) and the formatting half is a
faithful port of the ``human-uniq`` / ``subject`` / ``body`` trio so a
migrated config produces byte-identical mail text. ``mailer`` keeps
the reference's curried shape — ``mailer(opts)`` returns a function of
recipients returning a stream function over events — and the
registered ``"email"`` sink adapts it to micro-batches (one message
per batch over the collected events, exactly ``email-event``'s
sequence behavior).

Scale note: email is an alert-volume egress (a human inbox), not a
data path — the sink collects at most ``batch_limit`` driver-side rows
per micro-batch like the http/pagerduty-shaped sinks. Raw-volume
egress belongs on kafka/parquet sinks.
"""

from __future__ import annotations

import smtplib
from datetime import datetime, timezone
from email.message import EmailMessage
from typing import Any, Callable, Iterable, Sequence

#: Fields the reference treats as core Event attributes; everything
#: else is a "custom attribute" (common.clj:270-274).
EVENT_KEYS = frozenset(
    {"host", "service", "state", "description", "metric", "tags", "time", "ttl"}
)

#: SMTP-transport option keys split out of a single opts map
#: (email.clj:70-74 smtp-keys).
SMTP_KEYS = frozenset({"host", "port", "user", "password", "ssl", "tls", "sender"})


def count_string_bytes(s: str) -> int:
    """UTF-8 byte length (common.clj count-string-bytes)."""
    return len(s.encode("utf-8"))


def truncate(s: str, n: int) -> str:
    """First n CHARACTERS, "" for n <= 0 (common.clj truncate)."""
    if n <= 0:
        return ""
    return s[:n] if len(s) > n else s


def truncate_bytes(s: str, n: int) -> str:
    """Longest character prefix whose UTF-8 encoding fits n bytes
    (common.clj truncate-bytes) — never splits a multi-byte
    character. The payload cap the byte-limited egress sinks
    (logentries/logstash-shaped) apply before the wire."""
    total = i = 0
    for ch in s:
        b = count_string_bytes(ch)
        if total + b > n:
            break
        total += b
        i += 1
    return truncate(s, i)


def human_uniq(things: Iterable[Any], type_name: str) -> str | None:
    """common.clj:246-260 — 'api1, api2, api4' up to 4 distinct
    items, '23 services' beyond."""
    seen: list[Any] = []
    for t in things:
        if t not in seen:
            seen.append(t)
    n = len(seen)
    if n == 0:
        return None
    if n == 1:
        # (human-uniq [nil] t) is nil in the reference — (keep
        # identity ...) then drops it from the subject line
        return None if seen[0] is None else str(seen[0])
    if n == 2:
        return f"{seen[0]} and {seen[1]}"
    if n <= 4:
        return ", ".join(str(t) for t in seen)
    return f"{n} {type_name}"


def subject(events: Sequence[dict]) -> str:
    """common.clj:262-268 — hosts, services, states summary line."""
    parts = [
        human_uniq([e.get("host") for e in events], "hosts"),
        human_uniq([e.get("service") for e in events], "services"),
        human_uniq([e.get("state") for e in events], "states"),
    ]
    return " ".join(p for p in parts if p is not None)


def _time_at(unix_time: float | None) -> str:
    """common.clj:65-68 renders java.util.Date's toString; a stable
    UTC ISO form keeps the oracle deterministic across locales."""
    if unix_time is None:
        return "unknown time"
    dt = datetime.fromtimestamp(float(unix_time), tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S +0000")


def custom_attributes(event: dict) -> dict:
    """common.clj:270-274."""
    return {k: v for k, v in event.items() if k not in EVENT_KEYS}


def body(events: Sequence[dict]) -> str:
    """common.clj:276-295 — one stanza per event, joined by blank
    lines."""
    stanzas = []
    for e in events:
        tags = e.get("tags") or []
        stanzas.append(
            f"At {_time_at(e.get('time'))}\n"
            f"{e.get('host')} {e.get('service')} {e.get('state')} "
            f"({e.get('metric')})\n"
            f"Tags: [{', '.join(str(t) for t in tags)}]\n"
            f"Custom Attributes: {custom_attributes(e)}\n\n"
            f"{e.get('description') or ''}"
        )
    return "\n\n\n".join(stanzas)


def send_message(smtp_opts: dict, msg: dict) -> None:
    """postal's send-message for the option subset the reference
    documents (:host :port :user :pass :ssl :tls + message map with
    :from :to :subject :body)."""
    m = EmailMessage()
    m["From"] = msg.get("from", "riemann")
    to = msg["to"]
    m["To"] = ", ".join(to) if isinstance(to, (list, tuple)) else to
    m["Subject"] = msg.get("subject", "")
    m.set_content(msg.get("body", ""))

    host = smtp_opts.get("host", "localhost")
    port = int(smtp_opts.get("port", 0) or 0)
    cls = smtplib.SMTP_SSL if smtp_opts.get("ssl") else smtplib.SMTP
    with cls(host, port, timeout=10) as conn:
        if smtp_opts.get("tls"):
            conn.starttls()
        if smtp_opts.get("user"):
            conn.login(smtp_opts["user"], smtp_opts.get("password", ""))
        conn.send_message(m)


def email_event(smtp_opts: dict, msg_opts: dict, events: dict | Sequence[dict]) -> None:
    """email.clj:9-18 — send one message about an event or sequence of
    events, with overridable :subject / :body formatter functions."""
    evs = [events] if isinstance(events, dict) else list(events)
    subj = msg_opts.get("subject", subject)
    bod = msg_opts.get("body", body)
    msg = dict(msg_opts)
    msg.pop("subject", None)
    msg.pop("body", None)
    msg["subject"] = subj(evs) if callable(subj) else subj
    msg["body"] = bod(evs) if callable(bod) else bod
    send_message(smtp_opts, msg)


def mailer(
    opts: dict | None = None, msg_opts: dict | None = None
) -> Callable[..., Callable[[dict | Sequence[dict]], None]]:
    """email.clj:20-90 — ``mailer(opts)`` splits SMTP keys from
    message keys when given a single map; the result is called with
    recipient address(es) and returns a stream function that emails
    each event (or event sequence) it receives."""
    if msg_opts is None:
        opts = opts or {}
        smtp_opts = {k: v for k, v in opts.items() if k in SMTP_KEYS}
        msg_opts = {k: v for k, v in opts.items() if k not in SMTP_KEYS}
    else:
        smtp_opts = dict(opts or {})
        msg_opts = dict(msg_opts)
    msg_opts.setdefault("from", "riemann")

    def make_stream(*args: Any) -> Callable[[dict | Sequence[dict]], None]:
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            recipients = list(args[0])
        else:
            recipients = list(args)
        bad = [r for r in recipients if not isinstance(r, str)]
        if bad:
            raise TypeError(
                f"email was passed a recipient that wasn't a string: {bad!r}"
            )

        def stream(event: dict | Sequence[dict]) -> None:
            mo = dict(msg_opts)
            if recipients:
                mo["to"] = recipients
            email_event(smtp_opts, mo, event)

        return stream

    return make_stream


class LoopbackSmtpServer:
    """Minimal in-process SMTP server (RFC 5321 happy path): EHLO,
    MAIL FROM, RCPT TO, DATA, QUIT. Captures every accepted message in
    ``messages`` as (mail_from, rcpt_tos, data) — the loopback half of
    the round-trip test, like LoopbackAmqpBroker for the rabbitmq
    sink. No TLS/AUTH (the client only negotiates them when asked)."""

    def __init__(self):
        import socketserver
        import threading

        self.messages: list[tuple[str, list[str], str]] = []
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                def send(line: str) -> None:
                    self.wfile.write((line + "\r\n").encode())

                send("220 loopback-smtp ready")
                mail_from, rcpts = "", []
                while True:
                    raw = self.rfile.readline()
                    if not raw:
                        return
                    line = raw.decode(errors="replace").rstrip("\r\n")
                    verb = line.split(" ", 1)[0].upper()
                    if verb in ("EHLO", "HELO"):
                        send("250 loopback-smtp")
                    elif verb == "MAIL":
                        mail_from = line.split(":", 1)[1].strip().strip("<>")
                        send("250 OK")
                    elif verb == "RCPT":
                        rcpts.append(line.split(":", 1)[1].strip().strip("<>"))
                        send("250 OK")
                    elif verb == "DATA":
                        send("354 End data with <CR><LF>.<CR><LF>")
                        chunks = []
                        while True:
                            dl = self.rfile.readline().decode(errors="replace")
                            if dl in (".\r\n", ".\n"):
                                break
                            # undo SMTP dot-stuffing
                            chunks.append(dl[1:] if dl.startswith("..") else dl)
                        outer.messages.append((mail_from, rcpts, "".join(chunks)))
                        mail_from, rcpts = "", []
                        send("250 OK queued")
                    elif verb == "RSET":
                        mail_from, rcpts = "", []
                        send("250 OK")
                    elif verb == "NOOP":
                        send("250 OK")
                    elif verb == "QUIT":
                        send("221 bye")
                        return
                    else:
                        send("502 command not implemented")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def start(self) -> "LoopbackSmtpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
