"""Analytics operator golden cases (streams_test.clj / folds_test.clj
ports with deterministic event times replacing the virtual clock)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators import analytics, index
from tests.conftest import events, metrics


def _seq(spark, vals, dt=1.0, **common):
    return events(
        spark, *({"metric": float(v), "time": float(i) * dt, **common} for i, v in enumerate(vals))
    )


@pytest.mark.slow
def test_counter_running_sum(spark):
    # streams_test.clj:144-166
    df = _seq(spark, [1, 2, 3])
    assert metrics(analytics.counter(df), "counter") == [1.0, 3.0, 6.0]


def test_counter_reset_tag(spark):
    df = events(
        spark,
        {"metric": 1.0, "time": 0.0},
        {"metric": 2.0, "time": 1.0},
        {"metric": 5.0, "time": 2.0, "tags": ["reset"]},
        {"metric": 1.0, "time": 3.0},
    )
    assert metrics(analytics.counter(df), "counter") == [1.0, 3.0, 5.0, 6.0]


def test_ewma_timeless_recursion(spark):
    # reference: streams.clj:961-977 (r·x + (1-r)·prev, seeded 0)
    vals = [10.0, 20.0, 30.0, 5.0]
    df = _seq(spark, vals)
    got = metrics(analytics.ewma_timeless(df, 0.5), "ewma")
    acc, expected = 0.0, []
    for v in vals:
        acc = 0.5 * v + 0.5 * acc
        expected.append(acc)
    assert got == pytest.approx(expected, abs=1e-12)
    # the exact r=1/2 power-of-two variant must agree bit-for-bit
    got2 = metrics(analytics.ewma_timeless_half(df), "ewma")
    assert got2 == expected


def test_ewma_timeless_small_r_window_scales(spark):
    # advisor fix: at r=0.05 a fixed 64-term frame drops (0.95)^64 ≈
    # 3.7% of the state; the auto-scaled window must track the true
    # recursion to ~1e-12 relative instead
    vals = [float(100 + (i * 37) % 50) for i in range(200)]
    df = _seq(spark, vals)
    acc, expected = 0.0, []
    for v in vals:
        acc = 0.05 * v + 0.95 * acc
        expected.append(acc)
    auto = metrics(analytics.ewma_timeless(df, 0.05), "ewma")
    assert auto == pytest.approx(expected, rel=1e-9)
    stale = metrics(analytics.ewma_timeless(df, 0.05, halflife_window=64), "ewma")
    assert abs(stale[-1] - expected[-1]) / expected[-1] > 1e-4  # the old bug
    # the generic exact-fold variant is bit-identical to the recursion
    exact = metrics(analytics.ewma_timeless_exact(df, 0.05), "ewma")
    assert exact == expected


def test_ddt_events(spark):
    df = events(
        spark,
        {"metric": 0.0, "time": 0.0},
        {"metric": 10.0, "time": 5.0},
        {"metric": 5.0, "time": 10.0},
    )
    assert metrics(analytics.ddt_events(df), "ddt") == [2.0, -1.0]


def test_changed_and_init(spark):
    df = events(
        spark,
        {"state": "ok", "time": 0.0, "metric": 1.0},
        {"state": "ok", "time": 1.0, "metric": 2.0},
        {"state": "bad", "time": 2.0, "metric": 3.0},
        {"state": "bad", "time": 3.0, "metric": 4.0},
        {"state": "ok", "time": 4.0, "metric": 5.0},
    )
    # without init: first event always passes (streams.clj:1614-1653)
    assert metrics(analytics.changed(df)) == [1.0, 3.0, 5.0]
    # with init "ok": first event equal to init is suppressed
    assert metrics(analytics.changed(df, init="ok")) == [3.0, 5.0]


def test_runs(spark):
    # streams.clj:1918-1934: last of n-in-a-row equal states
    states = ["a", "a", "a", "b", "b", "b", "b", "a"]
    df = events(
        spark,
        *({"state": s, "time": float(i), "metric": float(i)} for i, s in enumerate(states)),
    )
    assert metrics(analytics.runs(df, 3)) == [2.0, 5.0, 6.0]


def test_stable(spark):
    # value must persist >= dt (streams.clj:1936-2030)
    df = events(
        spark,
        {"state": "ok", "time": 0.0, "metric": 0.0},
        {"state": "ok", "time": 10.0, "metric": 1.0},
        {"state": "flap", "time": 11.0, "metric": 2.0},
        {"state": "ok", "time": 12.0, "metric": 3.0},
        {"state": "ok", "time": 25.0, "metric": 4.0},
    )
    assert metrics(analytics.stable(df, 5.0)) == [0.0, 1.0, 3.0, 4.0]


def test_top_snapshot(spark):
    df = events(
        spark,
        {"host": "a", "metric": 1.0, "time": 0.0},
        {"host": "a", "metric": 50.0, "time": 1.0},  # latest for a
        {"host": "b", "metric": 10.0, "time": 0.0},
        {"host": "c", "metric": 30.0, "time": 0.0},
    )
    got = [(r.host, r.rank) for r in analytics.top(df, 2).orderBy("rank").collect()]
    assert got == [("a", 1), ("c", 2)]


def test_throttle(spark):
    df = _seq(spark, range(10), dt=1.0)  # all within one 100s window
    assert metrics(analytics.throttle(df, 3, 100.0)) == [0.0, 1.0, 2.0]


def test_rollup(spark):
    df = _seq(spark, range(5), dt=1.0)
    out = analytics.rollup(df, 3, 100.0).orderBy("event_id").collect()
    # first 3 pass through (streams.clj:1145-1151 fires while sent <= n);
    # the tail (2 events) becomes one aggregated row
    assert [r.metric for r in out] == [0.0, 1.0, 2.0, 4.0]
    assert [r.rolled for r in out] == [None, None, None, 2]


def test_apdex(spark):
    df = events(
        spark,
        {"service": "s", "metric": 10.0, "time": 0.0},   # satisfied
        {"service": "s", "metric": 10.0, "time": 1.0},   # satisfied
        {"service": "s", "metric": 120.0, "time": 2.0},  # tolerated
        {"service": "s", "metric": 500.0, "time": 3.0},  # neither
    )
    out = analytics.apdex(df, "metric < 100", "metric < 200", 3600.0)
    assert out.collect()[0].apdex == pytest.approx((2 + 0.5) / 4)


def test_clock_skew(spark):
    df = events(
        spark,
        {"host": "a", "time": 100.0},
        {"host": "b", "time": 104.0},
        {"host": "c", "time": 110.0},
    )
    got = {r.host: r.skew for r in analytics.clock_skew(df).collect()}
    assert got == {"a": -4.0, "b": 0.0, "c": 6.0}


def test_predict_linear(spark):
    # y = 2x + 1 → prediction at t+10 is exact
    df = events(
        spark,
        *({"metric": 2.0 * t + 1.0, "time": float(t), "time_us": None} for t in range(5)),
    ).withColumn("time_us", (F.col("time") * 1e6).cast("long"))
    out = analytics.predict_linear(df, 5, 10.0).orderBy("event_id").collect()
    assert out[-1].predicted == pytest.approx(2.0 * 14 + 1.0)
    out2 = analytics.predict_linear_exact(df, 5, 10.0, anchor_us=0).orderBy("event_id").collect()
    assert out2[-1].predicted == pytest.approx(2.0 * 14 + 1.0)


def test_project(spark):
    df = events(
        spark,
        {"state": "critical", "metric": 7.0, "time": 0.0},
        {"state": "ok", "metric": 9.0, "time": 1.0},
        {"state": "critical", "metric": 3.0, "time": 2.0},
    )
    row = analytics.project(df, ['state = "critical"', 'state = "ok"']).collect()[0]
    assert (row.slot0, row.slot1) == (3.0, 9.0)  # latest match per slot


def test_fill_in(spark):
    df = events(
        spark,
        {"metric": 1.0, "time": 0.0},
        {"metric": 2.0, "time": 35.0},
    )
    out = analytics.fill_in(df, 10.0).orderBy("time").collect()
    assert [(r.time, r.metric, r.filled) for r in out] == [
        (0.0, 1.0, False),
        (10.0, 1.0, True),
        (20.0, 1.0, True),
        (30.0, 1.0, True),
        (35.0, 2.0, False),
    ]


def test_rate(spark):
    df = _seq(spark, [3.0, 6.0, 9.0], dt=2.0)  # all in [0,10) bucket
    out = analytics.rate(df, 10.0).collect()
    assert out[0].rate == pytest.approx(1.8)


def test_index_tombstone_and_ttl(spark):
    df = events(
        spark,
        {"host": "a", "service": "x", "state": "ok", "time": 1.0, "metric": 1.0},
        {"host": "a", "service": "x", "state": "expired", "time": 2.0, "metric": 2.0},
        {"host": "b", "service": "x", "state": "ok", "time": 1.0, "ttl": 5.0, "metric": 3.0},
    )
    # expired winner deletes the key (index.clj:98-101)
    idx = index.build_index(df)
    assert metrics(idx) == [3.0]
    # ttl sweep at now=10: b/x is past 1+5
    live, exp = index.expire(index.build_index(df), 10.0)
    assert live.count() == 0
    got = exp.collect()
    assert [(r.host, r.state, r.time) for r in got] == [("b", "expired", 10.0)]


def test_delete_from_index_field_match(spark):
    df = events(
        spark,
        {"host": "a", "service": "x", "state": "ok", "time": 1.0, "metric": 1.0},
        {"host": "a", "service": "y", "state": "critical", "time": 1.0, "metric": 2.0},
        {"host": "b", "service": "x", "state": "ok", "time": 1.0, "metric": 3.0},
    )
    idx = index.build_index(df)
    # default fields [host, service]: deletes exactly one key (core.clj:256-273)
    out = index.delete_from_index(idx, {"host": "a", "service": "x"})
    assert sorted((r.host, r.service) for r in out.collect()) == [("a", "y"), ("b", "x")]
    # field list [host]: deletes the whole host-a cohort
    out = index.delete_from_index(idx, {"host": "a"}, fields=("host",))
    assert [(r.host, r.service) for r in out.collect()] == [("b", "x")]
    # DataFrame command form: anti-join on the match fields
    cmds = idx.filter(F.col("state") == "critical")
    out = index.delete_from_index(idx, cmds, fields=("host",))
    assert [(r.host, r.service) for r in out.collect()] == [("b", "x")]


def test_asof_enrich_edges(spark):
    """Tie at equal time (right visible), no-prior-match (nulls),
    duplicate right timestamps (max event_id wins)."""
    from riemann_spark.operators.asof import asof_enrich
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(10, "a", 100, 1.0), (11, "a", 200, 2.0), (12, "b", 50, 3.0)],
        "event_id long, host string, time_us long, metric double",
    )
    right = spark.createDataFrame(
        [
            (1, "a", 100, 7.0),   # same instant as left 10 → visible
            (2, "a", 150, 8.0),
            (3, "a", 150, 9.0),   # duplicate ts: event_id 3 wins
            (4, "b", 60, 5.0),    # after left 12 → no match
        ],
        "event_id long, host string, time_us long, metric double",
    )
    rows = {
        r["event_id"]: (r["asof_metric"], r["asof_time_us"])
        for r in asof_enrich(left, right, keys=("host",)).collect()
    }
    assert rows[10] == (7.0, 100)
    assert rows[11] == (9.0, 150)
    assert rows[12] == (None, None)


def test_holt_forecast_matches_reference_recursion(spark):
    from riemann_spark.operators import analytics

    xs = [3.1, 7.2, 31.1, 0.23, 19.04]
    rows = [(i, "h", "s", float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "event_id long, host string, service string, time double, metric double"
    )
    (out,) = analytics.holt_forecast(df, 10, 0.5, 0.25, 100).collect()

    l = b = 0.0
    for k, x in enumerate(xs):
        if k == 0:
            l, b = x, 0.0
        elif k == 1:
            l, b = 0.5 * x + 0.5 * l, x - l
        else:
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (l_new - l) + 0.75 * b
            l = l_new
    assert out.level == l and out.trend == b          # bit-exact fold
    assert out.forecast == l + b * 10.0
    assert out.n_obs == 5

    # last_n tail: only the newest 3 observations feed the recursion
    (t3,) = analytics.holt_forecast(df, 10, 0.5, 0.25, 3).collect()
    assert t3.n_obs == 3 and t3.level != out.level
