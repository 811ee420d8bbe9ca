"""Stateful streaming operators: half-life EWMA, count windows, top-k
with demotion — cross-batch state continuity checks."""

from __future__ import annotations

import math
import os
import uuid

import pytest

from riemann_spark.streaming.stateful_ops import (
    streaming_ewma,
    streaming_moving_event_window,
    streaming_top,
)
from tests.test_streaming import FULL_SCHEMA, _mk, _run_stream

pytestmark = pytest.mark.slow  # wall-clock streaming lane; fast loop: -m 'not slow'


@pytest.fixture()
def tmpdirs(tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    yield src, ckpt


def test_streaming_ewma_halflife(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"ew_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=10.0, t=0.0)],
        [_mk(1, "a", "x", metric=10.0, t=5.0)],   # state survives batches
        [_mk(2, "a", "x", metric=10.0, t=5.0)],   # dt=0 branch
    ]
    rows = _run_stream(spark, src, ckpt, lambda s: streaming_ewma(s, 5.0), name, batches)
    got = {r.event_id: r.metric for r in rows}
    r = math.exp(math.log(0.5) / 5.0)
    c = 1 - r
    m0 = c * 10.0
    m1 = c * 10.0 + m0 * (r ** 5)
    m2 = m1 + c * 10.0
    assert got[0] == pytest.approx(m0)
    assert got[1] == pytest.approx(m1)
    assert got[2] == pytest.approx(m2)


def test_streaming_moving_event_window(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"mw_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=0.0), _mk(1, "a", "x", metric=2.0, t=1.0)],
        [_mk(2, "a", "x", metric=3.0, t=2.0), _mk(3, "a", "x", metric=4.0, t=3.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_moving_event_window(s, 3), name, batches
    )
    got = {r.event_id: (r.window_sum, r.window_n) for r in rows}
    assert got == {0: (1.0, 1), 1: (3.0, 2), 2: (6.0, 3), 3: (9.0, 3)}


def test_streaming_moving_time_window_exact(spark, tmpdirs):
    """streams.clj:322-353 semantics across batches: horizon buffer
    re-emitted per event, ratcheted cutoff, late-event drop."""
    from riemann_spark.streaming.stateful_ops import streaming_moving_time_window

    src, ckpt = tmpdirs
    name = f"mtw_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=100.0), _mk(1, "a", "x", metric=2.0, t=105.0)],
        # t=120 pushes cutoff to 110 -> event 0 (t=100) ages out of the buffer
        [_mk(2, "a", "x", metric=3.0, t=120.0)],
        # LATE event at t=108 <= cutoff 110: dropped, no emission at all
        [_mk(3, "a", "x", metric=9.0, t=108.0)],
        # late-but-inside at t=115 > cutoff: emits {2, 3(no: dropped), 115}
        [_mk(4, "a", "x", metric=4.0, t=115.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_moving_time_window(s, 10.0), name, batches
    )
    emitted = {}
    for r in rows:
        emitted.setdefault(r.trigger_event_id, set()).add(r.event_id)
    assert emitted[0] == {0}
    assert emitted[1] == {0, 1}  # both inside 10s of t=105
    assert emitted[2] == {2}  # cutoff 110 evicted 0 and 1
    assert 3 not in emitted  # late event silently dropped
    assert emitted[4] == {2, 4}  # in-window late event joins the buffer


def test_streaming_top_demotion(spark, tmpdirs):
    src, ckpt = tmpdirs
    name = f"tp_{uuid.uuid4().hex[:8]}"
    batches = [
        [
            _mk(0, "a", "x", metric=10.0, t=0.0),
            _mk(1, "b", "x", metric=20.0, t=1.0),
        ],
        # c enters top-2 with 30 → bumps a (10): demotion pair expected
        [_mk(2, "c", "x", metric=30.0, t=2.0)],
        # d (5) below the top set → bottom
        [_mk(3, "d", "x", metric=5.0, t=3.0)],
    ]
    rows = _run_stream(spark, src, ckpt, lambda s: streaming_top(s, 2), name, batches)
    tops = [(r.host, r.state) for r in rows if r.stream == "top"]
    bottoms = [(r.host, r.state) for r in rows if r.stream == "bottom"]
    # a and b entered the top
    assert ("a", "ok") in tops and ("b", "ok") in tops and ("c", "ok") in tops
    # demotion: a expired on the top stream AND real on the bottom stream
    assert ("a", "expired") in tops
    assert ("a", "ok") in bottoms
    # d never entered the top: bottom ok + expired mirror on top
    assert ("d", "ok") in bottoms and ("d", "expired") in tops


def test_streaming_fixed_event_window(spark, tmpdirs):
    from riemann_spark.streaming.stateful_ops import streaming_fixed_event_window

    src, ckpt = tmpdirs
    name = f"fw_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=0.0), _mk(1, "a", "x", metric=2.0, t=1.0)],
        # partial window buffered across batches; fills at event 2
        [_mk(2, "a", "x", metric=3.0, t=2.0), _mk(3, "a", "x", metric=4.0, t=3.0)],
        [_mk(4, "a", "x", metric=5.0, t=4.0), _mk(5, "a", "x", metric=6.0, t=5.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_fixed_event_window(s, 3), name, batches
    )
    got = sorted((r.window_id, r.sum_metric, r.t_first, r.t_last) for r in rows)
    assert got == [(0, 6.0, 0.0, 2.0), (1, 15.0, 3.0, 5.0)]


def test_hot_reload_transition(spark, tmpdirs):
    """core/transition! semantics: unchanged defs keep running,
    changed defs restart, removed defs stop."""
    from pyspark.sql import functions as F

    from riemann_spark.streaming.lifecycle import Core, StreamDef

    src, ckpt = tmpdirs
    spark.createDataFrame(
        [(0, "a", 1.0)], "event_id long, host string, metric double"
    ).coalesce(1).write.parquet(f"{src}/b0")
    schema = spark.read.parquet(f"{src}/b0").schema
    sdf = spark.readStream.schema(schema).parquet(f"{src}/*")

    u = uuid.uuid4().hex[:6]
    def mk(filter_v):
        return StreamDef(
            build=lambda: sdf.filter(F.col("metric") > filter_v),
            checkpoint=f"{ckpt}/q1_{u}_{filter_v}",
        )

    core = Core(spark)
    try:
        a1 = core.apply({f"q1{u}": mk(0.0), f"q2{u}": mk(5.0)})
        assert a1 == {f"q1{u}": "started", f"q2{u}": "started"}
        id_q1 = core.query(f"q1{u}").id

        # same config → both kept, same query object
        a2 = core.apply({f"q1{u}": mk(0.0), f"q2{u}": mk(5.0)})
        assert a2 == {f"q1{u}": "kept", f"q2{u}": "kept"}
        assert core.query(f"q1{u}").id == id_q1

        # change q2's predicate, drop q1
        a3 = core.apply({f"q2{u}": mk(7.0)})
        assert a3 == {f"q1{u}": "stopped", f"q2{u}": "restarted"}
    finally:
        core.stop_all()


def test_streaming_fill_in_last(spark, tmpdirs):
    """fill-in-last (streams.clj:712-751): fillers carry the last
    event's fields merged with the update; an expired event cancels
    them. Cadence is wall-clock → poll with a bound."""
    import time as _time

    from riemann_spark.streaming.stateful_ops import streaming_fill_in_last

    src, ckpt = tmpdirs
    name = f"fi_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [_mk(0, "a", "x", metric=5.0, t=100.0)], FULL_SCHEMA
    ).coalesce(1).write.parquet(f"{src}/b0")
    sdf = spark.readStream.schema(
        spark.read.parquet(f"{src}/b0").schema
    ).parquet(f"{src}/*")
    q = (
        streaming_fill_in_last(sdf, 1.0, {"metric": 0.0})
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        fills = []
        while _time.time() < deadline:
            rows = spark.sql(f"select * from {name}").collect()
            fills = [r for r in rows if r.filled == "fill"]
            if len(fills) >= 2:
                break
            _time.sleep(0.5)
        # pass-through forwarded verbatim
        passed = [r for r in rows if r.filled is None]
        assert [(r.host, r.metric, r.time) for r in passed] == [("a", 5.0, 100.0)]
        # fillers: last event's fields merged with {"metric": 0.0}
        assert len(fills) >= 2
        assert all((r.host, r.state, r.metric) == ("a", "ok", 0.0) for r in fills)
        # expired event cancels the filler
        spark.createDataFrame(
            [_mk(1, "a", "x", state="expired", metric=None, t=200.0)], FULL_SCHEMA
        ).coalesce(1).write.parquet(f"{src}/b1")
        _time.sleep(2.0)
        n_then = len([r for r in spark.sql(f"select * from {name}").collect() if r.filled == "fill"])
        _time.sleep(2.5)
        n_now = len([r for r in spark.sql(f"select * from {name}").collect() if r.filled == "fill"])
        assert n_now == n_then  # no new fillers after cancellation
    finally:
        q.stop()


def test_streaming_batch_n_or_dt(spark, tmpdirs):
    """batch (streams.clj:1158-1185): count flush fires immediately at
    n; a partial buffer flushes once dt wall-clock passes. Both
    triggers observed in one run."""
    import time as _time

    from riemann_spark.streaming.stateful_ops import streaming_batch

    src, ckpt = tmpdirs
    name = f"ba_{uuid.uuid4().hex[:8]}"
    # key a/x gets 3 events (n=3 → immediate count flush);
    # key b/y gets 1 event (partial → time flush after dt=1s)
    spark.createDataFrame(
        [
            _mk(0, "a", "x", metric=1.0, t=100.0),
            _mk(1, "a", "x", metric=2.0, t=101.0),
            _mk(2, "a", "x", metric=3.0, t=102.0),
            _mk(3, "b", "y", metric=9.0, t=100.0),
        ],
        FULL_SCHEMA,
    ).coalesce(1).write.parquet(f"{src}/b0")
    sdf = spark.readStream.schema(
        spark.read.parquet(f"{src}/b0").schema
    ).parquet(f"{src}/*")
    q = (
        streaming_batch(sdf, 3, 1.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        rows = []
        while _time.time() < deadline:
            rows = spark.sql(f"select * from {name}").collect()
            if len(rows) >= 2:
                break
            _time.sleep(0.5)
        got = {(r.host, r.reason): (r.n, r.sum_metric, r.t_first, r.t_last) for r in rows}
        assert got[("a", "count")] == (3, 6.0, 100.0, 102.0)
        assert got[("b", "time")] == (1, 9.0, 100.0, 100.0)
    finally:
        q.stop()


def test_streaming_coalesce_periodic_snapshot(spark, tmpdirs):
    """Processing-time snapshots: after dt wall-clock, every remembered
    key re-emits. Timing is nondeterministic → poll with a bound."""
    import time as _time

    from riemann_spark.streaming.stateful_ops import streaming_coalesce

    src, ckpt = tmpdirs
    name = f"co_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [_mk(0, "a", "x", metric=1.0, t=100.0), _mk(1, "b", "y", metric=2.0, t=100.0)],
        FULL_SCHEMA,
    ).coalesce(1).write.parquet(f"{src}/b0")
    sdf = spark.readStream.schema(
        spark.read.parquet(f"{src}/b0").schema
    ).parquet(f"{src}/*")
    q = (
        streaming_coalesce(sdf, 1.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        rows = []
        while _time.time() < deadline:
            rows = spark.sql(f"select * from {name}").collect()
            if len(rows) >= 4:  # both keys snapshotted at least twice
                break
            _time.sleep(0.5)
        got = {(r.host, r.service, r.metric) for r in rows}
        assert ("a", "x", 1.0) in got and ("b", "y", 2.0) in got
        assert len(rows) >= 4
    finally:
        q.stop()


def test_streaming_throttle_budget_per_window(spark, tmpdirs):
    from riemann_spark.streaming.stateful_ops import streaming_throttle

    src, ckpt = tmpdirs
    name = f"th_{uuid.uuid4().hex[:8]}"
    batches = [
        # window [0,10): budget 2 — events 0,1 pass, 2 dropped
        [_mk(0, "a", "x", metric=1.0, t=0.0), _mk(1, "a", "x", metric=2.0, t=3.0),
         _mk(2, "a", "x", metric=3.0, t=9.0)],
        # budget survives the batch boundary: still window [0,10)
        [_mk(3, "a", "x", metric=4.0, t=9.5),      # dropped (budget spent)
         _mk(4, "a", "x", metric=5.0, t=12.0),     # new window — passes
         _mk(5, "b", "x", metric=6.0, t=9.0)],     # other key: own budget
        # late event for a closed window is dropped
        [_mk(6, "a", "x", metric=7.0, t=8.0)],
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_throttle(s, 2, 10.0), name, batches
    )
    assert sorted(r.event_id for r in rows) == [0, 1, 4, 5]


def test_streaming_changed_edge_detection(spark, tmpdirs):
    from riemann_spark.streaming.stateful_ops import streaming_changed

    src, ckpt = tmpdirs
    name = f"ch_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=0.0, state="ok"),
         _mk(1, "a", "x", metric=2.0, t=1.0, state="ok")],      # suppressed
        [_mk(2, "a", "x", metric=3.0, t=2.0, state="critical"),  # edge
         _mk(3, "a", "x", metric=4.0, t=3.0, state="critical")], # suppressed
        [_mk(4, "a", "x", metric=5.0, t=4.0, state="ok")],       # edge back
    ]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_changed(s, "state", init="ok"), name, batches
    )
    # init="ok" suppresses the initial ok rows (reference :init)
    assert [(r.event_id, r.state) for r in sorted(rows, key=lambda r: r.event_id)] == [
        (2, "critical"), (4, "ok"),
    ]


def test_streaming_top_reference_vectors(spark, tmpdirs):
    """top-test (streams_test.clj:1291-1352): repeated services always
    pass; nil-metric events displace and mirror to both streams;
    expiring a nonexistent key forwards harmlessly."""
    src, ckpt = tmpdirs
    name = f"tv_{uuid.uuid4().hex[:8]}"
    # "Repeating the same service": a 1, a 2, a 1, a 3 with k=1 all pass
    batches = [
        [
            _mk(0, "a", "x", metric=1.0, t=0.0),
            _mk(1, "a", "x", metric=2.0, t=1.0),
            _mk(2, "a", "x", metric=1.0, t=2.0),
            _mk(3, "a", "x", metric=3.0, t=3.0),
        ],
    ]
    rows = _run_stream(spark, src, ckpt, lambda s: streaming_top(s, 1), name, batches)
    tops = [(r.metric, r.state) for r in rows if r.stream == "top"]
    assert tops == [(1.0, "ok"), (2.0, "ok"), (1.0, "ok"), (3.0, "ok")]


def test_streaming_top_nil_metric_and_expire(spark, tmpdirs):
    """top-test: '(b 2) (b nil) (a 1)' — a nil-metric event removes its
    key and mirrors to both streams; a later event then enters freely.
    Expiring a key never seen passes through both streams."""
    src, ckpt = tmpdirs
    name = f"tn_{uuid.uuid4().hex[:8]}"
    batches = [
        [
            _mk(0, "b", "x", metric=2.0, t=0.0),
            _mk(1, "b", "x", metric=None, t=1.0),
            _mk(2, "a", "x", metric=1.0, t=2.0),
        ],
        # expire a key that was never in the set
        [_mk(3, "z", "x", metric=9.0, t=3.0, state="expired")],
    ]
    rows = _run_stream(spark, src, ckpt, lambda s: streaming_top(s, 1), name, batches)
    tops = [(r.host, r.metric, r.state) for r in rows if r.stream == "top"]
    bottoms = [(r.host, r.metric, r.state) for r in rows if r.stream == "bottom"]
    assert tops == [
        ("b", 2.0, "ok"),
        ("b", None, "expired"),
        ("a", 1.0, "ok"),
        ("z", 9.0, "expired"),
    ]
    # dual view: the nil-metric removal stays REAL on bottom (state
    # unchanged); the already-expired inbound forwards as-is
    assert ("b", None, "ok") in bottoms
    assert ("z", 9.0, "expired") in bottoms


def test_streaming_project_slots_and_stale_ooo_match(spark, tmpdirs):
    """project (streams.clj:2032-2101): every matching event emits the
    current latest-per-slot vector; a cross-batch OUT-OF-ORDER match
    older than the slot's current holder must NOT overwrite it."""
    import uuid as _uuid

    from riemann_spark.streaming.stateful_ops import streaming_project

    src, ckpt = tmpdirs
    name = f"proj_{_uuid.uuid4().hex[:8]}"
    batches = [
        [
            _mk(0, "a", "error", metric=10.0, t=100.0),
            _mk(1, "a", "purchase", metric=5.0, t=110.0),
        ],
        [
            _mk(2, "a", "error", metric=20.0, t=200.0),
            # older than event 0's slot entry: matches slot0 and emits,
            # but must not displace the newer metric
            _mk(3, "a", "error", metric=99.0, t=50.0),
        ],
    ]
    rows = _run_stream(
        spark,
        src,
        ckpt,
        lambda s: streaming_project(s, ['service = "error"', 'service = "purchase"']),
        name,
        batches,
    )
    got = {r.event_id: (r.slot0, r.slot1) for r in rows}
    assert got[0] == (10.0, None)     # slot1 not yet seen
    assert got[1] == (10.0, 5.0)
    assert got[3] == (10.0, 5.0)      # batch 2 processes t=50 first: stale, no overwrite
    assert got[2] == (20.0, 5.0)      # then t=200 updates slot0
    assert len(got) == 4              # non-matching events emit nothing


def test_streaming_moving_time_window_survives_restart(spark, tmpdirs):
    """Checkpoint recovery: kill the query mid-stream, start a new one
    on the same checkpoint — the horizon buffer and ratcheted cutoff
    must carry over (event 0 still in the buffer after restart; the
    pre-restart cutoff still drops a late event)."""
    from pyspark.sql import functions as F

    from riemann_spark.streaming.stateful_ops import streaming_moving_time_window

    src, ckpt = tmpdirs
    got: list = []

    def start():
        # memory sink can't recover from a checkpoint; foreachBatch can
        first = spark.read.parquet(f"{src}/b0")
        stream = spark.readStream.schema(first.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/*")
        return (
            streaming_moving_time_window(stream, 50.0)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    df0 = spark.createDataFrame(
        [_mk(0, "a", "x", metric=1.0, t=100.0), _mk(1, "a", "x", metric=2.0, t=130.0)],
        FULL_SCHEMA,
    )
    df0.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # crash point: state checkpointed, stream gone
    got.clear()  # keep only post-restart emissions

    # two batches arrive while "down" (separate files = separate
    # micro-batches under maxFilesPerTrigger=1, preserving order):
    # event 2 (t=160) keeps 1 (t=130 > cutoff 110), evicts 0 (t=100);
    # then event 3 (t=105 <= cutoff 110) must be DROPPED by the
    # RECOVERED-and-advanced cutoff
    spark.createDataFrame(
        [_mk(2, "a", "x", metric=3.0, t=160.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    spark.createDataFrame(
        [_mk(3, "a", "x", metric=9.0, t=105.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    emitted = {}
    for r in got:
        emitted.setdefault(r.trigger_event_id, set()).add(r.event_id)
    assert emitted[2] == {1, 2}  # buffer (event 1) survived the restart
    assert 3 not in emitted  # recovered cutoff still drops the late event


def test_streaming_dedup_minhash_keep_first_across_batches(spark, tmpdirs):
    """Band-bucket keep-first: an identical doc in a LATER batch is
    claimed by the batch-0 keeper (state carries the bucket minimum
    across micro-batches); intra-batch duplicates resolve to the
    smallest doc id; sub-k-token docs bypass dedup entirely."""
    from riemann_spark.streaming.stateful_ops import streaming_dedup_minhash

    src, ckpt = tmpdirs
    name = f"sdm_{uuid.uuid4().hex[:8]}"
    doc_schema = "doc_id long, text string"
    a = "the quick brown fox jumps over the lazy dog tonight"
    b = "pack my box with five dozen liquor jugs right now"
    c = "sphinx of black quartz judge my vow immediately please friend"
    batches = [
        [(1, a), (2, b), (6, "hi")],          # 6: 1 token < k=3 -> no shingles
        [(3, a), (4, c), (5, c)],             # 3 dups batch-0's 1; 5 dups 4
    ]
    rows = _run_stream(
        spark, src, ckpt,
        lambda sdf: streaming_dedup_minhash(sdf),
        name, batches, spark_rows_schema=doc_schema,
    )
    import collections

    claim = collections.defaultdict(list)
    for r in rows:
        claim[r.doc_id].append(r.claimant)
    canonical = {d: min(cs) for d, cs in claim.items()}
    assert 6 not in canonical  # shingle-less doc never enters
    assert canonical[1] == 1 and canonical[2] == 2 and canonical[4] == 4
    assert canonical[3] == 1  # cross-batch keep-first
    assert canonical[5] == 4  # intra-batch keep-first
    # every band row of a duplicate doc is claimed by the keeper
    assert all(cl == 1 for cl in claim[3])


def test_streaming_ewma_out_of_order_reference_vector(spark, tmpdirs):
    """streams_test.clj:1283-1290 — (ewma 1) over metrics 1 at times
    [0, 2, 1]: [0.5, 0.625, 0.875], and the out-of-order event emits
    the RATCHETED time 2, not its own time 1 (merge event m-new keeps
    the state's time-old in the negative-Δt branch)."""
    src, ckpt = tmpdirs
    name = f"ewoo_{uuid.uuid4().hex[:8]}"
    batches = [
        [_mk(0, "a", "x", metric=1.0, t=0.0)],
        [_mk(1, "a", "x", metric=1.0, t=2.0)],
        [_mk(2, "a", "x", metric=1.0, t=1.0)],  # straggler
    ]
    rows = _run_stream(spark, src, ckpt, lambda s: streaming_ewma(s, 1.0), name, batches)
    got = {r.event_id: (r.metric, r.time) for r in rows}
    import pytest as _pytest

    assert got[0][0] == _pytest.approx(0.5)
    assert got[1][0] == _pytest.approx(0.625)
    assert got[2][0] == _pytest.approx(0.875)
    assert got[0][1] == 0.0 and got[1][1] == 2.0
    assert got[2][1] == 2.0  # ratcheted, not 1.0


def test_streaming_throttle_reference_vector(spark, tmpdirs):
    """streams_test.clj:1354-1373 throttle-test — (throttle 3 2) over
    states 1..5 + four expireds at times [0,0,0,1,2,3,3,3,5]:
    [1,2,3,5,expired,expired,expired]. Expired events consume budget
    like any event; the 4th in-window event drops. (The vector's
    windows start at t=0, so the reference's first-event-anchored
    window and this op's epoch buckets agree on it.)"""
    from riemann_spark.streaming.stateful_ops import streaming_throttle

    src, ckpt = tmpdirs
    name = f"thr_{uuid.uuid4().hex[:8]}"
    seq = [("1", 0.0), ("2", 0.0), ("3", 0.0), ("4", 1.0), ("5", 2.0),
           ("expired", 3.0), ("expired", 3.0), ("expired", 3.0), ("expired", 5.0)]
    batches = [[_mk(i, "a", "x", state=st, t=t) for i, (st, t) in enumerate(seq)]]
    rows = _run_stream(
        spark, src, ckpt, lambda s: streaming_throttle(s, 3, 2.0), name, batches
    )
    got = sorted(r.event_id for r in rows)
    # emitted: 1,2,3 (ids 0-2), 5 (id 4), expired ids 5,6 (7 dropped), 8
    assert got == [0, 1, 2, 4, 5, 6, 8]


@pytest.mark.slow
def test_wallclock_rollup_rate_interpolate_real_stream(spark, tmpdirs):
    """The three wall-clock cadence ops (rollup / rate-interval /
    interpolate-constant) through a REAL stream: schema wiring and
    timer plumbing under applyInPandasWithState (their exact emission
    vectors are pinned by the virtual-clock ports in
    test_reference_parity.py — here timing is nondeterministic, so
    poll for content with a bound)."""
    import time as _time

    from riemann_spark.streaming.stateful_ops import (
        streaming_interpolate_constant,
        streaming_rate_interval,
        streaming_rollup,
    )

    src, ckpt = tmpdirs
    spark.createDataFrame(
        [_mk(i, "a", "x", metric=float(i + 1), t=100.0 + i, state="ok")
         for i in range(4)],
        FULL_SCHEMA,
    ).coalesce(1).write.parquet(f"{src}/b0")
    schema = spark.read.parquet(f"{src}/b0").schema

    cases = {
        "rollup": (
            lambda s: streaming_rollup(s, 1, 1.0),
            # first event passes through; the rolled tail digests on a tick
            lambda rows: any(r.n_rolled is None and r.metric == 1.0 for r in rows)
            and any(r.n_rolled == 3 and r.sum_metric == 9.0 for r in rows),
        ),
        "rate": (
            lambda s: streaming_rate_interval(s, 1.0),
            # one tick sums all four metrics /1s; later ticks emit 0
            lambda rows: any(r.metric == 10.0 for r in rows)
            and any(r.metric == 0.0 for r in rows),
        ),
        "interp": (
            lambda s: streaming_interpolate_constant(s, 1.0),
            # first-tick forward plus at least one constant resample
            lambda rows: sum(1 for r in rows if r.metric == 4.0) >= 2,
        ),
    }
    for tag, (build, ok) in cases.items():
        name = f"wc_{tag}_{uuid.uuid4().hex[:8]}"
        sdf = spark.readStream.schema(schema).parquet(f"{src}/*")
        q = (
            build(sdf)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{ckpt}_{tag}")
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = _time.time() + 60
            rows = []
            while _time.time() < deadline:
                rows = spark.sql(f"select * from {name}").collect()
                if ok(rows):
                    break
                _time.sleep(0.5)
            assert ok(rows), (tag, rows[:10])
        finally:
            q.stop()


def test_streaming_bottomk_multi_batch_merges(spark, tmp_path):
    """Bottom-k state survives across micro-batches: the union of the
    final shard snapshots equals the batch bottom-k over ALL rows,
    and later versions supersede earlier ones."""
    import pandas as pd

    from riemann_spark.streaming.stateful_ops import streaming_bottomk

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    pd.DataFrame({"doc_id": list(range(0, 40))}).to_parquet(src / "a.parquet")
    sdf = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = streaming_bottomk(sdf, k=5, n_shards=2)
    q = (
        out.writeStream.format("memory")
        .queryName("sbk_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    pd.DataFrame({"doc_id": list(range(40, 80))}).to_parquet(src / "b.parquet")
    q.processAllAvailable()
    q.stop()
    snap = spark.table("sbk_test").toPandas()
    assert snap.version.max() == 2  # second batch re-emitted
    latest = snap.loc[
        snap.groupby("shard").version.transform("max") == snap.version
    ]
    # ≤ k rows per shard, version-latest only
    assert (latest.groupby("shard").size() <= 5).all()
    got = set(
        latest.sort_values(["priority", "doc_id"]).head(5).doc_id
    )
    # batch truth: same salt, all 80 ids
    import hashlib

    def pri(i):
        h = hashlib.md5(f"{i}|bk".encode()).hexdigest()[:13]
        return int(h, 16) / float(1 << 52)

    want = set(sorted(range(80), key=lambda i: (pri(i), i))[:5])
    assert got == want


def test_streaming_scd2_survives_restart(spark, tmpdirs):
    """Checkpoint recovery for streaming_scd2: the open run (prev
    state, version, valid_from, n_events) must carry across a stop +
    restart — the interval closed AFTER the restart still starts at
    the pre-restart valid_from and counts the pre-restart events."""
    from pyspark.sql import functions as F

    from riemann_spark.streaming.stateful_ops import streaming_scd2

    src, ckpt = tmpdirs
    got: list = []

    def start():
        first = spark.read.parquet(f"{src}/b0")
        stream = spark.readStream.schema(first.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/*")
        stream = stream.withColumn(
            "time_us", (F.col("time") * 1000000.0).cast("long")
        )
        return (
            streaming_scd2(stream)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame(
        [_mk(0, "a", "x", state="ok", t=100.0),
         _mk(1, "a", "x", state="ok", t=130.0)],
        FULL_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # crash point: the ok-run is open, nothing emitted yet
    assert got == []

    spark.createDataFrame(
        [_mk(2, "a", "x", state="critical", t=160.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    spark.createDataFrame(
        [_mk(3, "a", "x", state="ok", t=200.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    rows = sorted(
        (r.version, r.state, r.valid_from_us, r.valid_to_us, r.n_events)
        for r in got
    )
    assert rows == [
        (1, "ok", 100_000_000, 160_000_000, 2),  # pre-restart run intact
        (2, "critical", 160_000_000, 200_000_000, 1),
    ]


def test_streaming_funnel_survives_restart(spark, tmpdirs):
    """Checkpoint recovery for streaming_funnel: the reached stage and
    its anchor time survive a restart — a post-restart click converts
    against the pre-restart view's anchor, and a purchase outside the
    recovered click-window does not."""
    from riemann_spark.streaming.stateful_ops import streaming_funnel

    src, ckpt = tmpdirs
    got: list = []

    def start():
        first = spark.read.parquet(f"{src}/b0")
        stream = spark.readStream.schema(first.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/*")
        return (
            streaming_funnel(stream, window_s=50.0)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame(
        [_mk(0, "u1", "view", t=100.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert [(r.stage, r.stage_time) for r in got] == [(1, 100.0)]
    got.clear()

    # click lands inside view+50 against the RECOVERED anchor;
    # purchase at t=220 is outside click+50 -> must not emit
    spark.createDataFrame(
        [_mk(1, "u1", "click", t=140.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    spark.createDataFrame(
        [_mk(2, "u1", "purchase", t=220.0)], FULL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert [(r.stage, r.stage_time) for r in got] == [(2, 140.0)]
