"""Sources (line parsers, JSON codec), sinks registry, config DSL,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riemann_spark.functions import multimodal
from riemann_spark.plans.topology import Stream
from riemann_spark.sources import (
    events_from_json,
    events_to_graphite_lines,
    events_to_json,
    graphite_lines_to_events,
    opentsdb_lines_to_events,
)
from riemann_spark.streaming.sinks import fan_out, make_sink
from tests.conftest import events


def lines(spark, *ls):
    return spark.createDataFrame([(l,) for l in ls], "line string")


def test_graphite_parse(spark):
    df = lines(
        spark,
        "web.api.latency 12.5 1704067200",
        "db.reads;dc=us;rack=r1 3 1704067201",
        "bad.metric notanumber 1704067202",
    )
    out = graphite_lines_to_events(df).collect()
    assert (out[0].service, out[0].metric, out[0].time) == ("web.api.latency", 12.5, 1704067200.0)
    assert (out[1].service, out[1].tags) == ("db.reads", ["dc=us", "rack=r1"])
    assert out[2].metric is None  # unparseable value → null, filterable


def test_graphite_roundtrip(spark):
    ev = events(spark, {"host": "h", "service": "svc", "metric": 42.25, "time": 100.0})
    enc = events_to_graphite_lines(ev)
    assert enc.collect()[0].line == "h.svc 42.25 100"
    dec = graphite_lines_to_events(enc).collect()[0]
    assert (dec.service, dec.metric, dec.time) == ("h.svc", 42.25, 100.0)


def test_opentsdb_parse(spark):
    df = lines(spark, "put sys.cpu.user 1704067200 42.5 host=web01 cpu=0")
    row = opentsdb_lines_to_events(df).collect()[0]
    assert (row.host, row.service, row.metric, row.time) == (
        "web01", "sys.cpu.user", 42.5, 1704067200.0,
    )
    assert row.attributes == {"host": "web01", "cpu": "0"}


def test_json_roundtrip_with_open_attributes(spark):
    ev = events(
        spark,
        {"host": "a", "service": "s", "metric": 1.5, "time": 9.0, "tags": ["t1"]},
    ).drop("event_id")
    js = events_to_json(ev)
    back = events_from_json(js).collect()[0]
    assert (back.host, back.service, back.metric, back.time, back.tags) == (
        "a", "s", 1.5, 9.0, ["t1"],
    )
    # unknown keys fold into attributes (open schema, common.clj:270-274)
    raw = spark.createDataFrame(
        [('{"host":"a","service":"s","time":1.0,"region":"eu","team":"core"}',)],
        "value string",
    )
    row = events_from_json(raw, keep_extra=True).collect()[0]
    assert row.attributes == {"region": "eu", "team": "core"}


def test_sink_registry_and_fan_out(spark):
    ev = events(spark, {"metric": 1.0}, {"metric": 2.0})
    store_a, store_b = [], []
    fob = fan_out([make_sink("collect", store=store_a), make_sink("collect", store=store_b)])
    fob(ev, 0)
    assert len(store_a) == 2 and len(store_b) == 2


def test_parquet_sink(spark, tmp_path):
    ev = events(spark, {"metric": 1.0, "service": "s"})
    sink = make_sink("parquet", path=str(tmp_path / "out"), partition_by=("service",))
    sink(ev, 0)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 1 and "service" in back.columns


def test_topology_dsl(spark):
    ev = events(
        spark,
        {"host": "a", "service": "x", "metric": 2048.0, "time": 1.0, "state": "critical"},
        {"host": "a", "service": "x", "metric": 1024.0, "time": 2.0, "state": "ok"},
        {"host": "b", "service": "y", "metric": 10.0, "time": 1.0, "state": "ok"},
    )
    top = Stream.of(ev).where("metric > 100").scale(1 / 1024.0).tag("scaled")
    hot, rest = top.split('state = "critical"')
    assert hot.to_df().count() == 1 and rest.to_df().count() == 1
    snap = top.index().to_df().collect()
    assert len(snap) == 1 and snap[0].metric == 1.0  # latest for a/x, scaled
    q = top.index().search('metric >= 1').to_df()
    assert q.count() == 1


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")],
        "media_id long, payload binary",
    )
    media = multimodal.make_media_frame(docs, "payload", "video", "media_id")
    feats = multimodal.decode_features(media).orderBy("media_id").collect()
    assert [r.media_id for r in feats] == [1, 2]
    assert feats[0].n_bytes == 11 and len(feats[0].f0.split(",")) == 4
    # deterministic fake: same payload → same features
    feats2 = multimodal.decode_features(media).orderBy("media_id").collect()
    assert feats[0].f0 == feats2[0].f0

    resized = multimodal.resize_images(media, 64, 64).collect()
    assert all((r.width, r.height) == (64, 64) for r in resized)

    frames = multimodal.sample_frames(media, every_ms=50).collect()
    per_id = {r.media_id for r in frames}
    assert per_id == {1, 2}
    assert len(frames) == (11 * 10 // 50) + (18 * 10 // 50)


def test_parquet_exactly_once_sink_replay_safe(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch_id must land
    exactly once; a torn write (no _COMMIT marker) must be repaired by
    the replay, not duplicated."""
    import os

    from riemann_spark.streaming.sinks import make_sink

    path = str(tmp_path / "lake")
    sink = make_sink("parquet_exactly_once", path=path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "event_id long, host string")

    sink(df, 0)
    sink(df, 0)  # crash-replay of the same batch
    sink(df, 1)
    got = spark.read.parquet(f"{path}/batch_id=*").count()
    assert got == 4  # 2 rows x 2 batches, no duplicates from the replay

    # torn write: batch dir exists but no marker -> replay overwrites
    os.remove(f"{path}/batch_id=1/_COMMIT")
    sink(spark.createDataFrame([(9, "z")], "event_id long, host string"), 1)
    rows = {r.event_id for r in spark.read.parquet(f"{path}/batch_id=1").collect()}
    assert rows == {9}
