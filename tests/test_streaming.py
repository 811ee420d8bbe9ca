"""Structured Streaming tests: file source → memory sink, deterministic
event times (batch mode is the semantics oracle — SURVEY §5)."""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from riemann_spark.schema import EVENT_SCHEMA
from riemann_spark.streaming import streaming_index, streaming_rate

pytestmark = pytest.mark.slow  # wall-clock streaming lane; fast loop: -m 'not slow'

FULL_SCHEMA = "event_id long, " + ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in EVENT_SCHEMA.fields
)


def _write_batch(spark, path, rows, batch_id):
    df = spark.createDataFrame(rows, FULL_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b{batch_id}")


def _mk(i, host, service, state="ok", metric=1.0, t=0.0, ttl=None):
    return (i, host, service, state, None, metric, None, t, ttl, None)


@pytest.fixture()
def tmpdirs(tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    yield src, ckpt


def _run_stream(spark, src, ckpt, build, sink_name, batches, spark_rows_schema=FULL_SCHEMA):
    """Write file batches one at a time, processing all available data
    between writes so watermarks advance deterministically."""
    first = spark.createDataFrame(batches[0], spark_rows_schema)
    first.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    sdf = spark.readStream.schema(first.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    q = (
        build(sdf)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        for i, rows in enumerate(batches[1:], start=1):
            df = spark.createDataFrame(rows, spark_rows_schema)
            df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
            q.processAllAvailable()
        return spark.sql(f"select * from {sink_name}").collect()
    finally:
        q.stop()


def test_streaming_index_latest_and_expiry(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"idx_{uuid.uuid4().hex[:8]}"
    batches = [
        # batch 0: two keys at t=100
        [
            _mk(0, "a", "x", metric=1.0, t=100.0, ttl=50.0),
            _mk(1, "b", "x", metric=2.0, t=100.0, ttl=5000.0),
        ],
        # batch 1: update a/x (t=200); watermark moves to 200
        [_mk(2, "a", "x", metric=10.0, t=200.0, ttl=50.0)],
        # batch 2: far-future event pushes watermark past a/x's
        # expiry (200+50) → reaper emits synthetic expired row
        [_mk(3, "c", "y", metric=3.0, t=10000.0, ttl=50000.0)],
        # batch 3: one more to let pending timers fire post-watermark
        [_mk(4, "c", "z", metric=4.0, t=20000.0, ttl=50000.0)],
    ]
    rows = _run_stream(spark, src, ckpt, streaming_index, name, batches)
    got = [(r.host, r.service, r.state, r.metric) for r in rows]
    # every upsert emitted
    assert ("a", "x", "ok", 1.0) in got
    assert ("a", "x", "ok", 10.0) in got
    assert ("b", "x", "ok", 2.0) in got
    # the reaper fired for a/x after its ttl lapsed
    expired = [(r.host, r.service) for r in rows if r.state == "expired"]
    assert ("a", "x") in expired


def test_streaming_index_reaper_keep_keys(spark, tmpdirs):
    """reaper :keep-keys (core.clj:284-301; core_test.clj
    reaper-keep-keys / reaper-keep-keys-all): the synthetic expired
    row carries the requested fields of the indexed event — none
    beyond the key by default, metric+ttl with keep_keys="all" —
    while state and time are always overwritten."""
    import functools

    src, ckpt = tmpdirs
    batches = [
        [_mk(0, "a", "x", metric=7.5, t=100.0, ttl=50.0)],
        # far-future event pushes the watermark past a/x's expiry
        [_mk(1, "c", "y", metric=3.0, t=10000.0, ttl=50000.0)],
        [_mk(2, "c", "z", metric=4.0, t=20000.0, ttl=50000.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt,
        functools.partial(streaming_index, keep_keys="all"),
        f"idxkk_{uuid.uuid4().hex[:8]}", batches,
    )
    exp = [r for r in rows if r.state == "expired" and r.host == "a"]
    assert len(exp) == 1
    assert exp[0].metric == 7.5 and exp[0].ttl == 50.0
    assert exp[0].time > 100.0  # time is the reaper clock, not the event's

    # default: only the key survives (the reference's [:host :service])
    src2, ckpt2 = str(src) + "_d", str(ckpt) + "_d"
    rows_d = _run_stream(
        spark, src2, ckpt2, streaming_index,
        f"idxkd_{uuid.uuid4().hex[:8]}", batches,
    )
    exp_d = [r for r in rows_d if r.state == "expired" and r.host == "a"]
    assert len(exp_d) == 1
    assert exp_d[0].metric is None and exp_d[0].ttl is None


def test_streaming_index_tombstone(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"idx_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=100.0, ttl=9000.0)],
        # tombstone deletes the key: no further emission for a/x
        [_mk(1, "a", "x", state="expired", metric=None, t=200.0, ttl=9000.0)],
        [_mk(2, "z", "z", metric=5.0, t=300.0, ttl=9000.0)],
    ]
    rows = _run_stream(spark, src, ckpt, streaming_index, name, batches)
    ax = [r for r in rows if r.host == "a" and r.state != "expired"]
    assert [(r.metric) for r in ax] == [1.0]  # only the initial upsert


def test_streaming_index_cohort_delete(spark, tmpdirs):
    """delete-from-index by field match (core.clj:256-273), streaming:
    cohort commands fan out into per-key tombstones via
    delete_tombstones; the keyed state machine consumes them as
    deletions and later events recreate the key."""
    from riemann_spark.streaming.index_stream import delete_tombstones

    src, ckpt = tmpdirs
    name = f"idxdel_{uuid.uuid4().hex[:8]}"
    b0 = [
        _mk(0, "a", "x", metric=1.0, t=100.0, ttl=9000.0),
        _mk(1, "a", "y", metric=2.0, t=100.0, ttl=9000.0),
        _mk(2, "b", "x", metric=3.0, t=100.0, ttl=9000.0),
    ]
    snap = spark.createDataFrame(b0, FULL_SCHEMA)
    cmds = snap.filter(F.col("host") == "a")
    tombs = delete_tombstones(snap, cmds, fields=("host",), now=200.0)
    tomb_keys = sorted((r.host, r.service) for r in tombs.collect())
    assert tomb_keys == [("a", "x"), ("a", "y")]  # the whole host-a cohort
    tomb_rows = [
        _mk(1 << 62, h, s, state="expired", metric=None, t=200.0)
        for h, s in tomb_keys
    ]
    batches = [b0, tomb_rows, [_mk(3, "a", "x", metric=9.0, t=300.0, ttl=9000.0)]]
    rows = _run_stream(spark, src, ckpt, streaming_index, name, batches)
    live = [(r.host, r.service, r.metric) for r in rows if r.state != "expired"]
    assert ("a", "x", 1.0) in live and ("a", "y", 2.0) in live
    # deletion emitted nothing; the key was recreated by the later event
    assert not [r for r in rows if r.state == "expired"]
    assert ("a", "x", 9.0) in live


def test_streaming_rate_matches_batch(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"rate_{uuid.uuid4().hex[:8]}"
    batches = [
        [
            _mk(0, "a", "x", metric=3.0, t=5.0),
            _mk(1, "a", "x", metric=6.0, t=8.0),
        ],
        # event far ahead closes the [0,10) window under the watermark
        [_mk(2, "a", "x", metric=9.0, t=500.0)],
        [_mk(3, "a", "x", metric=1.0, t=900.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_rate(s, 10.0, watermark="1 seconds"), name, batches
    )
    win0 = [r for r in rows if r.window_start == 0.0]
    assert len(win0) == 1 and win0[0].rate == pytest.approx(0.9)

    # batch oracle agreement on the same closed window
    from riemann_spark.operators import analytics

    bdf = spark.createDataFrame(batches[0], FULL_SCHEMA)
    brate = analytics.rate(bdf, 10.0).collect()[0].rate
    assert win0[0].rate == brate


def test_streaming_dedup_exact_drops_replays(spark, tmpdirs):
    from riemann_spark.streaming.ops import streaming_dedup_exact

    src, ckpt = tmpdirs
    name = f"dd_{uuid.uuid4().hex[:8]}"
    mk = lambda i, desc, t: (i, "h", "s", "ok", desc, 1.0, None, t, None, None)
    batches = [
        [mk(0, "alpha", 0.0), mk(1, "alpha", 1.0), mk(2, "beta", 2.0)],
        [mk(3, "alpha", 3.0), mk(4, "gamma", 4.0)],  # replay dropped across batches
    ]
    rows = _run_stream(spark, src, ckpt, streaming_dedup_exact, name, batches)
    got = sorted(r.event_id for r in rows)
    # one alpha representative from batch 1 (intra-batch pick is
    # arbitrary), beta, gamma; the batch-2 alpha replay must drop
    assert got in ([0, 2, 4], [1, 2, 4])
    assert 3 not in got


def test_streaming_sessions_fractional_gap(spark, tmpdirs):
    """A 0.5 s gap must build a 500 ms session window (int() truncation
    would make it '0 seconds'), and sub-millisecond gaps are rejected
    rather than silently rounded."""
    from riemann_spark.streaming.ops import streaming_sessions

    src, ckpt = tmpdirs
    batches = [
        [_mk(1, "h", "s", t=0.0), _mk(2, "h", "s", t=0.4), _mk(3, "h", "s", t=2.0)],
        [_mk(4, "h", "s", t=100.0)],  # watermark push closes both sessions
    ]
    rows = _run_stream(
        spark, src, ckpt,
        lambda sdf: streaming_sessions(sdf, 0.5, watermark="0 seconds"),
        f"sess_{uuid.uuid4().hex[:8]}", batches,
    )
    spans = sorted((r.session_start, r.n_events) for r in rows if r.session_start < 50)
    # events at 0.0 and 0.4 merge (gap < 0.5); 2.0 is its own session
    assert spans == [(0.0, 2), (2.0, 1)]

    with pytest.raises(ValueError):
        streaming_sessions(spark.createDataFrame([], FULL_SCHEMA), 0.0004)


def test_reinject_feedback_loop(spark, tmpdirs):
    """config.clj:280-288 reinject across the acyclic-DAG boundary:
    a critical event is fed back through the file queue, re-enters the
    SAME running query as a tagged event, and is not fed back again
    (at-most-once guard) — the loop closes and terminates."""
    from riemann_spark.streaming.reinject import (
        REINJECT_TAG,
        reinject_sink,
        with_reinjection,
    )
    from riemann_spark.streaming.sinks import fan_out, make_sink

    src, ckpt = tmpdirs
    queue = f"{src}_queue"
    rows = [
        _mk(1, "h1", "api", state="ok", t=0.0),
        _mk(2, "h2", "api", state="critical", t=1.0),
    ]
    first = spark.createDataFrame(rows, FULL_SCHEMA)
    first.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    sdf = spark.readStream.schema(first.schema).parquet(f"{src}/*")

    store: list = []
    sinks = fan_out(
        [
            make_sink("collect", store=store),
            make_sink(
                "reinject", queue_dir=queue, predicate=F.col("state") == "critical"
            ),
        ]
    )
    q = (
        with_reinjection(sdf, queue)
        .writeStream.foreachBatch(sinks)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # the feedback file lands during the previous batch's commit;
        # one more drain picks it up deterministically
        q.processAllAvailable()
    finally:
        q.stop()

    by_id = {}
    for r in store:
        by_id.setdefault(r.event_id, []).append(r)
    assert len(by_id[1]) == 1                      # ok event: once, no feedback
    crit = sorted(by_id[2], key=lambda r: len(r.tags or []))
    assert len(crit) == 2                          # original + exactly one re-entry
    assert REINJECT_TAG not in (crit[0].tags or [])
    assert REINJECT_TAG in crit[1].tags            # the fed-back copy is marked


def test_pubsub_sweep_stops_temporary_keeps_persistent(spark, tmpdirs):
    """Ports pubsub_test.clj sweep-test: a persistent subscriber sees
    events published before AND after the sweep; a temporary one
    (a transport-bound ws connection) only sees the pre-sweep batch."""
    from riemann_spark.streaming.pubsub import PubSub

    src, ckpt = tmpdirs
    pers, temp = [], []

    def mk_sink(acc):
        def sink(df, batch_id):
            acc.extend(r.metric for r in df.collect())
        return sink

    _write_batch(spark, src, [_mk(0, "a", "x", metric=1.0)], 0)
    stream = spark.readStream.schema(FULL_SCHEMA).parquet(f"{src}/*")
    ps = PubSub()
    ps.publish("index", stream)
    q1 = ps.start("index", None, [mk_sink(pers)], f"{ckpt}/p",
                  name=f"ps_p_{uuid.uuid4().hex[:8]}", persistent=True)
    q2 = ps.start("index", None, [mk_sink(temp)], f"{ckpt}/t",
                  name=f"ps_t_{uuid.uuid4().hex[:8]}")
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        ps.sweep()  # q2 (temporary) stops; q1 keeps flowing
        _write_batch(spark, src, [_mk(1, "a", "x", metric=2.0)], 1)
        q1.processAllAvailable()
        assert sorted(pers) == [1.0, 2.0]
        assert temp == [1.0]
        assert not q2.isActive and q1.isActive
    finally:
        ps.stop_all()


def test_streaming_retrain_trigger_state_across_batches(spark, tmpdirs):
    """The retrain trigger's four-scalar state must carry across
    micro-batches: an hourly window whose events SPAN a batch boundary
    accumulates into one (sum_q, n), and the consecutive-drift counter
    survives the restartable state store — one trigger fires at the
    2nd consecutive drifted closed window, counting rows from BOTH
    batches, and a calm window resets the counter (no later trigger)."""
    from riemann_spark.streaming.stateful_ops import streaming_retrain_trigger

    RT = ("event_id long, host string, service string, time double, "
          "time_us long, metric double, mu double, sd double")

    def ev(i, t_s, metric):
        return (i, "h", "s", float(t_s), int(t_s) * 1_000_000, metric, 0.0, 1.0)

    src, ckpt = tmpdirs
    name = f"srt_{uuid.uuid4().hex[:8]}"
    batches = [
        # hour 0 (2 events, mean 10 => drifted when closed) + the
        # FIRST event of hour 1 (closes hour 0, opens hour 1)
        [ev(0, 0, 10.0), ev(1, 60, 10.0), ev(2, 3600, 10.0)],
        # hour 1 continues ACROSS the batch boundary, then hour 2
        # opens (closes hour 1: 2nd consecutive drift -> TRIGGER with
        # n = 3 rows, 1 from batch 1 + 2 from batch 2)
        [ev(3, 3660, 10.0), ev(4, 3720, 10.0), ev(5, 7200, 0.0)],
        # hour 3 opens (closes hour 2: mean 0, calm -> counter resets)
        [ev(6, 10800, 10.0)],
        # hour 4 opens (closes hour 3: drifted again, but consec == 1
        # after the reset -> no second trigger)
        [ev(7, 14400, 0.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, streaming_retrain_trigger, name, batches,
        spark_rows_schema=RT,
    )
    got = [(r.host, r.service, r.window_id, r.n, r.sum_q) for r in rows]
    assert got == [("h", "s", 1, 3, 30_000_000)]


def test_streaming_retrain_trigger_pre_epoch_truncates_toward_zero(
    spark, tmpdirs
):
    """Window ids for pre-epoch events truncate toward ZERO (DuckDB
    '//' / Spark DIV — the repo's bucketing convention), not Python
    floor: time_us in [-3600s, 0) is window 0, the same window as
    [0, 3600s). Python's // would put the pre-epoch rows in window -1,
    splitting one oracle window into two stream windows."""
    from riemann_spark.streaming.stateful_ops import streaming_retrain_trigger

    RT = ("event_id long, host string, service string, time double, "
          "time_us long, metric double, mu double, sd double")

    def ev(i, t_s, metric):
        return (i, "h", "s", float(t_s), int(t_s) * 1_000_000, metric, 0.0, 1.0)

    src, ckpt = tmpdirs
    name = f"srtz_{uuid.uuid4().hex[:8]}"
    batches = [
        # window 0 spans [-3600s, 3600s) under toward-zero truncation:
        # a pre-epoch and a post-epoch event must share it (4 rows,
        # mean 10 => drift #1 when hour 1 opens)
        [ev(0, -1800, 10.0), ev(1, -60, 10.0), ev(2, 0, 10.0),
         ev(3, 60, 10.0), ev(4, 3600, 10.0)],
        # hour 2 opens -> closes hour 1 (drift #2) -> ONE trigger for
        # window 1; n=1 proves window 0 really held all 4 earlier rows
        [ev(5, 7200, 0.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, streaming_retrain_trigger, name, batches,
        spark_rows_schema=RT,
    )
    got = [(r.host, r.service, r.window_id, r.n, r.sum_q) for r in rows]
    assert got == [("h", "s", 1, 1, 10_000_000)]
