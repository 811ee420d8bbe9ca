"""SMTP mailer parity (reference email.clj:1-90, common.clj:246-295):
formatter vectors, the curried mailer shape, a full loopback SMTP
round trip, and the registered "email" sink end-to-end."""

from __future__ import annotations

import pytest

from riemann_spark.streaming.email import (
    LoopbackSmtpServer,
    body,
    custom_attributes,
    email_event,
    human_uniq,
    mailer,
    subject,
)


def test_human_uniq_vectors():
    # common.clj:246-260 docstring cases + count thresholds
    assert human_uniq([], "hosts") is None
    assert human_uniq(["importer"], "hosts") == "importer"
    assert human_uniq(["a", "b"], "hosts") == "a and b"
    assert human_uniq(["a", "b", "c"], "hosts") == "a, b, c"
    assert human_uniq(["a", "b", "c", "d"], "hosts") == "a, b, c, d"
    assert human_uniq(list("abcde"), "hosts") == "5 hosts"
    assert human_uniq(["api1", "api1", "api2"], "hosts") == "api1 and api2"
    assert human_uniq(range(23), "services") == "23 services"


def test_subject_line():
    evs = [
        {"host": "api1", "service": "cpu", "state": "critical"},
        {"host": "api2", "service": "cpu", "state": "critical"},
    ]
    assert subject(evs) == "api1 and api2 cpu critical"
    assert subject([{"host": "h", "service": None, "state": "ok"}]) == "h ok"


def test_body_stanza():
    ev = {
        "host": "api1", "service": "cpu", "state": "critical",
        "metric": 0.97, "time": 0.0, "tags": ["prod", "alert"],
        "description": "cpu on fire", "region": "us-east",
    }
    text = body([ev])
    assert text.startswith("At 1970-01-01 00:00:00 +0000\n")
    assert "api1 cpu critical (0.97)\n" in text
    assert "Tags: [prod, alert]\n" in text
    assert "Custom Attributes: {'region': 'us-east'}" in text
    assert text.endswith("cpu on fire")
    assert custom_attributes(ev) == {"region": "us-east"}
    # multiple events join with the reference's triple newline
    assert body([ev, ev]).count("At 1970-01-01") == 2


def test_mailer_rejects_non_string_recipients():
    email = mailer()
    with pytest.raises(TypeError):
        email({"host": "not-an-address"})


def test_mailer_loopback_roundtrip():
    """The curried reference shape — (def email (mailer opts)) then
    (email \"addr\") as a stream — delivered over a real SMTP
    conversation against the loopback server."""
    with LoopbackSmtpServer() as srv:
        email = mailer({
            "host": "127.0.0.1", "port": srv.port,
            "from": "riemann@example.com",
        })
        stream = email("shodan@tau.ceti.five", "xerxes@trioptimum.org")
        stream({"host": "api1", "service": "cpu", "state": "critical",
                "metric": 0.97, "time": 0.0})
        assert len(srv.messages) == 1
        mail_from, rcpts, data = srv.messages[0]
        assert mail_from == "riemann@example.com"
        assert rcpts == ["shodan@tau.ceti.five", "xerxes@trioptimum.org"]
        assert "Subject: api1 cpu critical" in data
        assert "api1 cpu critical (0.97)" in data

        # custom formatters (email.clj:62-66): override :subject/:body
        email2 = mailer(
            {"host": "127.0.0.1", "port": srv.port},
            {"from": "r@x", "subject": lambda evs: f"{len(evs)} events!",
             "body": lambda evs: "short"},
        )
        email2(["ops@example.com"])([
            {"host": "a"}, {"host": "b"},
        ])
        _f, _r, data2 = srv.messages[1]
        assert "Subject: 2 events!" in data2
        assert "short" in data2


def test_email_event_single_and_sequence():
    with LoopbackSmtpServer() as srv:
        smtp = {"host": "127.0.0.1", "port": srv.port}
        email_event(smtp, {"to": "a@b.c"}, {"host": "h1", "service": "s"})
        email_event(smtp, {"to": ["a@b.c"]},
                    [{"host": "h1"}, {"host": "h2"}])
        assert len(srv.messages) == 2
        assert "Subject: h1 s" in srv.messages[0][2]
        assert "Subject: h1 and h2" in srv.messages[1][2]


def test_email_sink_end_to_end(spark):
    """Registered sink: one message per micro-batch, nil fields
    dropped, reference default formatters."""
    from riemann_spark.streaming.sinks import make_sink

    with LoopbackSmtpServer() as srv:
        df = spark.createDataFrame(
            [("api1", "cpu", "critical", 0.97), ("api2", "cpu", "critical", 0.99)],
            "host string, service string, state string, metric double",
        )
        sink = make_sink(
            "email", to="oncall@example.com",
            host="127.0.0.1", port=srv.port, from_addr="riemann@prod",
        )
        sink(df.orderBy("host"), 0)
        assert len(srv.messages) == 1
        mail_from, rcpts, data = srv.messages[0]
        assert (mail_from, rcpts) == ("riemann@prod", ["oncall@example.com"])
        assert "Subject: api1 and api2 cpu critical" in data
        # empty batch sends nothing
        sink(df.filter("metric > 100"), 1)
        assert len(srv.messages) == 1


def test_byte_truncation_reference_vectors():
    """Ports common_test.clj count-string-bytes-test / truncate-test /
    truncate-bytes-test: UTF-8 byte counting across 1-4 byte
    characters, character truncation, and byte truncation that never
    splits a character."""
    from riemann_spark.streaming.email import (
        count_string_bytes,
        truncate,
        truncate_bytes,
    )

    assert [count_string_bytes(s) for s in ["", "a", "é", "あ", "𠜎", "あいう"]] \
        == [0, 1, 2, 3, 4, 9]
    assert [truncate("あいう", n) for n in (-1, 0, 1, 3, 4)] == \
        ["", "", "あ", "あいう", "あいう"]
    assert truncate_bytes("あいう", -1) == ""
    assert truncate_bytes("あいう", 0) == ""
    assert truncate_bytes("あいう", 1) == ""
    assert truncate_bytes("あいう", 2) == ""      # first char needs 3 bytes
    assert truncate_bytes("あいう", 3) == "あ"
    assert truncate_bytes("あいう", 4) == "あ"
    assert truncate_bytes("あいう", 5) == "あ"
    assert truncate_bytes("あいう", 6) == "あい"
    assert truncate_bytes("あいう", 9) == "あいう"
    assert truncate_bytes("あいう", 10) == "あいう"
    assert truncate_bytes("あいう", 100) == "あいう"
