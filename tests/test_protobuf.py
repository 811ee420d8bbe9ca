"""Protobuf Msg wire-codec golden cases (transport.clj:107-132,
common.clj:91-112 decode-msg semantics)."""

from __future__ import annotations

import pytest

import struct

from riemann_spark.sources.protobuf import (
    decode_event,
    decode_msg,
    encode_event,
    encode_msg,
)


def rt(e: dict) -> dict:
    return decode_msg(encode_msg([e]))["events"][0]


def test_string_fields_and_tags():
    e = rt(
        {
            "host": "h",
            "service": "svc",
            "state": "ok",
            "description": "d",
            "tags": ["a", "b", "ünïcode"],
            "time": 7.0,
        }
    )
    assert (e["host"], e["service"], e["state"], e["description"]) == ("h", "svc", "ok", "d")
    assert e["tags"] == ["a", "b", "ünïcode"]


def test_metric_sint64_zigzag_negative():
    # integral metrics ride metric_sint64 (zigzag); negatives stay exact
    for m in (0, 1, -1, 42, -(2**62), 2**62):
        assert rt({"metric": m, "time": 0.0})["metric"] == m


def test_metric_double_precedence_over_float():
    # non-integral → metric_d; decode must prefer d over the f32 echo
    e = rt({"metric": 3.141592653589793, "time": 0.0})
    assert e["metric"] == 3.141592653589793  # f32 would give 3.1415927


def test_time_micros_preferred_and_exact():
    e = rt({"time_us": 1700000000123456})
    assert e["time_us"] == 1700000000123456
    assert e["time"] == 1700000000123456 / 1e6


def test_time_seconds_only_fallback():
    # a frame carrying only whole-second time (field 1), no micros
    raw = b"\x08\x2a"  # field 1 varint = 42
    e = decode_event(raw)
    assert e["time"] == 42.0 and e["time_us"] == 42_000_000


def test_ttl_crosses_float32():
    e = rt({"ttl": 60.0, "time": 0.0})
    assert e["ttl"] == struct.unpack("<f", struct.pack("<f", 60.0))[0]


def test_attributes_roundtrip():
    e = rt({"attributes": {"k1": "v1", "k2": None}, "time": 0.0})
    assert e["attributes"] == {"k1": "v1", "k2": None}


def test_msg_envelope_ok_error_query():
    m = decode_msg(encode_msg(ok=True, error="nope", query='state = "ok"'))
    assert m["ok"] is True and m["error"] == "nope" and m["query"] == 'state = "ok"'
    assert m["events"] == []


def test_multi_event_msg_fans_out():
    evs = [{"service": f"s{i}", "time": float(i)} for i in range(5)]
    m = decode_msg(encode_msg(evs))
    assert [e["service"] for e in m["events"]] == ["s0", "s1", "s2", "s3", "s4"]


def test_nil_metric_absent():
    e = rt({"service": "s", "time": 0.0})
    assert e["metric"] is None


def test_spark_roundtrip_mapinpandas(spark):
    from riemann_spark.sources import events_to_msg_binary, msg_binary_to_events
    from tests.conftest import events

    df = events(
        spark,
        {"metric": 1.5, "time": 1.0, "host": "a", "service": "x"},
        {"metric": -7.0, "time": 2.0, "host": "b", "service": "y"},
        {"metric": None, "time": 3.0, "host": "c", "service": "z"},
    )
    back = msg_binary_to_events(events_to_msg_binary(df))
    rows = {r.host: (r.metric, r.time) for r in back.collect()}
    assert rows == {"a": (1.5, 1.0), "b": (-7.0, 2.0), "c": (None, 3.0)}


# ---------------------------------------------------------------- #
# property: encode→decode is the identity on the event model

@pytest.mark.slow
def test_wire_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    txt = st.text(min_size=0, max_size=40)
    metric = st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    )
    ev = st.fixed_dictionaries(
        {},
        optional={
            "host": txt,
            "service": txt,
            "state": txt,
            "description": txt,
            "metric": metric,
            "tags": st.lists(txt, max_size=4),
            "time_us": st.integers(min_value=0, max_value=2**53),
            "ttl": st.floats(min_value=0, max_value=1e6, allow_nan=False),
            "attributes": st.dictionaries(
                st.text(min_size=1, max_size=10), txt, max_size=3
            ),
        },
    )

    @settings(max_examples=300, deadline=None)
    @given(e=ev)
    def run(e):
        got = decode_msg(encode_msg([e]))["events"][0]
        for k in ("host", "service", "state", "description"):
            assert got.get(k) == e.get(k, None)
        assert got["tags"] == e.get("tags", [])
        assert got["attributes"] == e.get("attributes", {})
        if "time_us" in e:
            assert got["time_us"] == e["time_us"]
        m = e.get("metric")
        if m is None:
            assert got["metric"] is None
        elif isinstance(m, int) or (isinstance(m, float) and m.is_integer() and abs(m) < 2**63):
            assert got["metric"] == int(m)  # sint64 precedence
        else:
            assert got["metric"] == m  # double field, exact
        if "ttl" in e:
            assert got["ttl"] == struct.unpack("<f", struct.pack("<f", e["ttl"]))[0]

    run()


def test_decode_dead_letter_split(spark):
    from riemann_spark.sources.protobuf import (
        encode_msg,
        msg_binary_to_events_with_errors,
    )

    good = encode_msg([{"host": "h1", "service": "s", "metric": 1.5, "time": 10.0}])
    # wire type 7 is invalid; varint field id 1 → decode raises
    bad = bytes([0x0F, 0xFF, 0xFF])
    df = spark.createDataFrame([(good,), (bad,), (good,)], "msg binary")
    ok, dead = msg_binary_to_events_with_errors(df)
    assert ok.count() == 2
    assert {r.host for r in ok.collect()} == {"h1"}
    dl = dead.collect()
    assert len(dl) == 1
    assert bytes(dl[0].msg) == bad and "ValueError" in dl[0].error
