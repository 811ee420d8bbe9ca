"""Ports of the reference's own test vectors (test/riemann/
streams_test.clj, folds_test.clj) through the batch operators — the
``test-stream`` cases whose semantics are event-time-expressible.
Interval/virtual-clock cases live in test_stateful_streaming.py; each
test cites the deftest it mirrors.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators import analytics, folds, stateless, windows
from tests.conftest import assert_stream, events, metrics


# ---------------------------------------------------------------- §smap

def test_smap_increment(spark):
    """streams_test.clj:37-39 — (smap inc) [6 3 -1] -> [7 4 0]."""
    assert_stream(
        spark,
        lambda df: stateless.smap(df, "event_id", (F.col("metric") + 1).alias("metric")),
        [6, 3, -1],
        [7, 4, 0],
    )


def test_smapcat_doubles(spark):
    """streams_test.clj:46-49 — (smapcat #(vector % %)) duplicates."""
    ev = events(spark, *({"metric": float(m)} for m in [0, 1, 2, 3]))
    out = stateless.smapcat(
        ev,
        F.array(
            F.struct(F.col("event_id"), F.col("metric")),
            F.struct(F.col("event_id"), F.col("metric")),
        ),
        alias="e",
    ).select("e.event_id", "e.metric")
    got = [r["metric"] for r in out.orderBy("event_id", "metric").collect()]
    assert got == [0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0]


def test_sflatten(spark):
    """streams_test.clj:51-53 — vectors of events flatten in order."""
    rows = [([(0, 0.0), (1, 1.0), (2, 2.0), (3, 3.0)],), ([(4, 4.0), (5, 5.0)],)]
    df = spark.createDataFrame(
        rows, "events array<struct<event_id: long, metric: double>>"
    )
    out = stateless.sflatten(df)
    assert [r["metric"] for r in out.orderBy("event_id").collect()] == [
        0.0, 1.0, 2.0, 3.0, 4.0, 5.0,
    ]


# -------------------------------------------------------------- §counter

def test_counter_counts_and_passes_nil(spark):
    """streams_test.clj:144-157 — running sum; nil-metric events pass
    through unchanged (their metric stays nil; the running count holds)."""
    ev = events(spark, {"metric": 2.0}, {"metric": None}, {"metric": 3.0})
    out = analytics.counter(ev).orderBy("event_id").collect()
    assert [r["metric"] for r in out] == [2.0, None, 3.0]
    assert [r["counter"] for r in out] == [2.0, 2.0, 5.0]

    out100 = analytics.counter(ev, init=100.0).orderBy("event_id").collect()
    assert [r["counter"] for r in out100] == [102.0, 102.0, 105.0]


def test_counter_resets(spark):
    """streams_test.clj:158-166 — a "reset"-tagged event restarts the
    count at its own metric; init seeds only the first epoch."""
    ev = events(
        spark,
        {"metric": 1.0},
        {"metric": 200.0, "tags": ["reset"]},
        {"metric": 5.0},
    )
    out = analytics.counter(ev, init=100.0).orderBy("event_id").collect()
    assert [r["counter"] for r in out] == [101.0, 200.0, 205.0]


# ---------------------------------------------------------------- §match

def test_match_string_set_regex_nil(spark):
    """streams_test.clj:168-208 — strings, sets, regexen, nils."""
    ev = events(
        spark,
        {"service": None},
        {"service": "bar"},
        {"service": "foo"},
    )
    assert [r["service"] for r in stateless.match(ev, "service", "foo").collect()] == [
        "foo"
    ]

    ev = events(spark, {"metric": None}, {"metric": 1.0}, {"metric": 2.0})
    got = stateless.match(ev, "metric", {0.0, 2.0}).collect()
    assert [r["metric"] for r in got] == [2.0]

    ev = events(
        spark,
        {"state": None},
        {"state": "migas"},
        {"state": "other breakfast foods"},
    )
    got = stateless.match(ev, "state", "re:^mi").collect()
    assert [r["state"] for r in got] == ["migas"]

    ev = events(spark, {"host": None}, {"host": None}, {"host": "foo"})
    got = stateless.match(ev, "host", None).collect()
    assert len(got) == 2 and all(r["host"] is None for r in got)


# ------------------------------------------------------------ §tag/untag

def test_tag_order(spark):
    """streams_test.clj:233-250 — new tags first, distinct-preserving."""
    ev = events(
        spark,
        {"tags": None},
        {"service": "a", "tags": ["foo"]},
        {"service": "b", "tags": ["bar", "baz"]},
    )
    got = [r["tags"] for r in stateless.tag(ev, "foo").orderBy("event_id").collect()]
    assert got == [["foo"], ["foo"], ["foo", "bar", "baz"]]

    ev = events(
        spark,
        {"tags": None},
        {"service": "a", "tags": ["foo"]},
        {"service": "b", "tags": ["foo", "baz"]},
    )
    got = [
        r["tags"]
        for r in stateless.tag(ev, ["foo", "bar"]).orderBy("event_id").collect()
    ]
    assert got == [["foo", "bar"], ["foo", "bar"], ["foo", "bar", "baz"]]


def test_untag_nil_to_empty(spark):
    """streams_test.clj:210-230 — untag on nil tags yields []."""
    ev = events(
        spark,
        {"tags": None},
        {"service": "a", "tags": []},
        {"service": "a", "tags": ["foo"]},
        {"service": "b", "tags": ["foo", "bar", "baz"]},
    )
    got = [r["tags"] for r in stateless.untag(ev, "foo").orderBy("event_id").collect()]
    assert got == [[], [], [], ["bar", "baz"]]
    got = [
        r["tags"]
        for r in stateless.untag(ev, ["foo", "bar"]).orderBy("event_id").collect()
    ]
    assert got == [[], [], [], ["baz"]]


def test_tagged_all_any(spark):
    """streams_test.clj:252-301."""
    ev = events(
        spark,
        {"tags": ["kitten", "cat"]},
        {"tags": ["kitten", "cat", "meow"]},
        {"tags": ["dog", "cat"]},
        {"tags": ["cat"]},
        {"tags": []},
        {"tags": None},
    )
    got = stateless.tagged_all(ev, ["kitten", "cat"]).orderBy("event_id").collect()
    assert [r["tags"] for r in got] == [["kitten", "cat"], ["kitten", "cat", "meow"]]

    got = stateless.tagged_any(ev, ["kitten", "cat"]).orderBy("event_id").collect()
    assert [sorted(r["tags"]) for r in got] == [
        ["cat", "kitten"],
        ["cat", "kitten", "meow"],
        ["cat", "dog"],
        ["cat"],
    ]


# ---------------------------------------------------------------- §split

def test_split_state_routing(spark):
    """streams_test.clj:340-371 — metric>10 crit, >5 warn, else ok."""
    ev = events(spark, {"metric": 15.0}, {"metric": 8.0}, {"metric": 2.0})
    crit, warn, ok = stateless.split_streams(ev, ["metric > 10", "metric > 5"])
    assert [r["metric"] for r in crit.collect()] == [15.0]
    assert [r["metric"] for r in warn.collect()] == [8.0]
    assert [r["metric"] for r in ok.collect()] == [2.0]


# ---------------------------------------------------------------- §where

def test_where_star_expired(spark):
    """streams_test.clj:411-418 — (where* expired?) at now=0."""
    ev = events(spark, {"time": -1.0, "ttl": 0.5}, {"time": 0.0, "ttl": 1.0})
    got = stateless.expired(ev, 0.0).collect()
    assert [r["time"] for r in got] == [-1.0]


def test_where_compound_with_else(spark):
    """streams_test.clj:429-447 — service="good" or metric>2, else branch."""
    ev = events(
        spark,
        {"service": "good", "metric": 0.0},
        {"service": "bad", "metric": 0.0},
        {"service": None, "metric": 1.0},
        {"service": "bad", "metric": 1.0},
        {"service": "bad", "metric": 3.0},
    )
    good, bad = stateless.where_else(ev, 'service = "good" or metric > 2')
    assert [r["event_id"] for r in good.orderBy("event_id").collect()] == [0, 4]
    assert [r["event_id"] for r in bad.orderBy("event_id").collect()] == [1, 2, 3]


# ------------------------------------------------------------ §over/under

def test_over_under(spark):
    """streams_test.clj:1204-1224."""
    ms = [0.5, 1.0, 1.5, 2.0, 2.5]
    ev = events(spark, *({"metric": m} for m in ms))
    assert metrics(stateless.over(ev, 1.5)) == [2.0, 2.5]
    assert metrics(stateless.under(ev, 1.5)) == [0.5, 1.0]


# ------------------------------------------------------------------ §ewma

def test_ewma_timeless_vectors(spark):
    """streams_test.clj:1226-1235 — r=0 zeros, r=1 identity, r=1/2."""
    ev = events(spark, *({"metric": float(m)} for m in [1, 10, 20, -100, 4]))
    got = [r["ewma"] for r in analytics.ewma_timeless(ev, 0.0).orderBy("event_id").collect()]
    assert got == [0.0] * 5

    ev = events(spark, *({"metric": float(m)} for m in [5, 13, 1, -10, 3]))
    got = [r["ewma"] for r in analytics.ewma_timeless(ev, 1.0).orderBy("event_id").collect()]
    assert got == [5.0, 13.0, 1.0, -10.0, 3.0]

    ev = events(spark, *({"metric": 1.0} for _ in range(5)))
    want = [0.5, 0.75, 0.875, 0.9375, 0.96875]
    got = [r["ewma"] for r in analytics.ewma_timeless(ev, 0.5).orderBy("event_id").collect()]
    assert got == pytest.approx(want, abs=1e-12)
    got = [
        r["ewma"]
        for r in analytics.ewma_timeless_half(ev).orderBy("event_id").collect()
    ]
    assert got == want  # po2 closed form is bit-exact


# ------------------------------------------------------------------- §ddt

def test_ddt_immediate(spark):
    """streams_test.clj:984-999 — pairwise derivative; first event and
    metric-less events emit nothing."""
    assert analytics.ddt_events(events(spark)).count() == 0
    ev = events(spark, *({"metric": None, "time": float(i)} for i in range(4)))
    assert analytics.ddt_events(ev).count() == 0
    ev = events(spark, {"metric": 1.0, "time": 0.0})
    assert analytics.ddt_events(ev).count() == 0

    ev = events(
        spark,
        {"metric": 0.0, "time": 0.0},
        {"metric": 0.0, "time": 1.0},
        {"metric": 2.0, "time": 2.0},
        {"metric": -4.0, "time": 4.0},
    )
    out = analytics.ddt_events(ev).orderBy("time").collect()
    assert [(r["ddt"], r["time"]) for r in out] == [
        (0.0, 1.0),
        (2.0, 2.0),
        (-3.0, 4.0),
    ]


# --------------------------------------------------------------- §changed

def test_changed_vectors(spark):
    """streams_test.clj:1141-1156 — edge detection, with and without
    :init."""
    states = ["ok", "bad", "bad", "ok", "ok", "ok", "evil", "bad"]
    ev = events(spark, *({"state": s} for s in states))
    got = [r["state"] for r in analytics.changed(ev).orderBy("event_id").collect()]
    assert got == ["ok", "bad", "ok", "evil", "bad"]

    states = ["ok", "bad", "bad", "ok", "ok", "evil", "bad"]
    ev = events(spark, *({"state": s} for s in states))
    got = [
        r["state"]
        for r in analytics.changed(ev, init="ok").orderBy("event_id").collect()
    ]
    assert got == ["bad", "ok", "evil", "bad"]


# ------------------------------------------------------------- §windows

def test_moving_event_window_vector(spark):
    """streams_test.clj:1594-1600 — n=2 on [1 2 3]."""
    ev = events(spark, *({"metric": float(m), "time": float(m)} for m in [1, 2, 3]))
    w = windows.moving_event_window(2)
    out = ev.withColumn("w", F.collect_list("metric").over(w))
    got = [r["w"] for r in out.orderBy("event_id").collect()]
    assert got == [[1.0], [1.0, 2.0], [2.0, 3.0]]


def test_fixed_event_window_vector(spark):
    """streams_test.clj:1602-1610 — n=2 on [1..5]: incomplete tail
    window never flushes."""
    ev = events(spark, *({"metric": float(m), "time": float(m)} for m in [1, 2, 3, 4, 5]))
    tagged = windows.fixed_event_window(ev, 2)
    full = (
        tagged.groupBy("window_id")
        .agg(F.sort_array(F.collect_list("metric")).alias("w"), F.count("*").alias("n"))
        .filter(F.col("n") == 2)
    )
    got = [r["w"] for r in full.orderBy("window_id").collect()]
    assert got == [[1.0, 2.0], [3.0, 4.0]]

    ev1 = events(spark, {"metric": 1.0})
    got = (
        windows.fixed_event_window(ev1, 2)
        .groupBy("window_id").count().filter(F.col("count") == 2).count()
    )
    assert got == 0


def test_fixed_time_window_vectors(spark):
    """streams_test.clj:1666-1697 — anchored tumbling windows flush
    (with empties) only when a later window is entered; n=0 throws."""
    with pytest.raises(ValueError):
        windows.fixed_time_window(events(spark), 0)

    def flushed(ev_rows):
        ev = events(spark, *ev_rows)
        tagged = windows.fixed_time_window(ev, 2.0)
        rows = tagged.select("window_start", "time").collect()
        anchor = min(r["window_start"] for r in rows)
        last = max(r["window_start"] for r in rows)
        buckets: dict[float, list[float]] = {}
        w = anchor
        while w < last:
            buckets[w] = []
            w += 2.0
        for r in rows:
            if r["window_start"] < last:
                buckets[r["window_start"]].append(r["time"])
        return [sorted(v) for _, v in sorted(buckets.items())]

    got = flushed([{"time": float(t)} for t in [1, 2, 3, 4, 5]])
    assert got == [[1.0, 2.0], [3.0, 4.0]]

    got = flushed([{"time": 1.0}, {"time": 7.0}])
    assert got == [[1.0], [], []]


def test_fixed_offset_time_window_vector(spark):
    """streams_test.clj:1699-1731 — epoch-aligned buckets; n=0 throws."""
    with pytest.raises(ValueError):
        windows.fixed_offset_time_window(events(spark, {"time": 1.0}), 0).collect()

    ev = events(spark, *({"time": float(t)} for t in [1, 2, 3, 4, 5, 6]))
    tagged = windows.fixed_offset_time_window(ev, 2.0)
    rows = tagged.select("window_start", "time").collect()
    last = max(r["window_start"] for r in rows)
    buckets: dict[float, list[float]] = {}
    for r in rows:
        if r["window_start"] < last:
            buckets.setdefault(r["window_start"], []).append(r["time"])
    got = [sorted(v) for _, v in sorted(buckets.items())]
    assert got == [[1.0], [2.0, 3.0], [4.0, 5.0]]


# ------------------------------------------------------------------ §runs

def test_runs_vector(spark):
    """streams_test.clj:1612-1631 — only the n-th consecutive equal
    state passes."""
    ev = events(spark, {"state": "1"}, {"state": "2"}, {"state": "2"})
    assert analytics.runs(ev, 3, keys=()).count() == 0

    seq = [
        ("1", None), ("1", None), ("2", 0.5), ("2", 0.6),
        ("3", None), ("4", 5.0), ("4", 5.1), ("4", 5.2),
    ]
    ev = events(spark, *({"state": s, "metric": m} for s, m in seq))
    out = analytics.runs(ev, 3, keys=()).collect()
    assert [(r["state"], r["metric"]) for r in out] == [("4", 5.2)]


# -------------------------------------------------------- §predict-linear

def test_predict_linear_vectors(spark):
    """streams_test.clj:1832-1863 — OLS forecast; single-event windows
    emit nothing."""
    ev = events(spark, {"metric": 1.0, "time": 1.0})
    out = analytics.predict_linear(ev, 10, 600).filter(F.col("predicted").isNotNull())
    assert out.count() == 0

    ev = events(spark, *({"metric": float(i), "time": float(i)} for i in range(1, 6)))
    out = (
        analytics.predict_linear(ev, 5, 60)
        .filter(F.col("predicted").isNotNull())
        .orderBy("time")
        .collect()
    )
    assert [(round(r["predicted"], 9), r["time"]) for r in out] == [
        (62.0, 2.0), (63.0, 3.0), (64.0, 4.0), (65.0, 5.0),
    ]

    ev = events(
        spark, {"metric": 100.0, "time": 0.0}, {"metric": 50.0, "time": 43200.0}
    )
    out = (
        analytics.predict_linear(ev, 2, 86400)
        .filter(F.col("predicted").isNotNull())
        .collect()
    )
    assert [(r["predicted"], r["time"]) for r in out] == [(-50.0, 43200.0)]

    ev = events(spark, {"metric": 100.0, "time": 0.0}, {"metric": 100.0, "time": 1.0})
    out = (
        analytics.predict_linear(ev, 2, 60)
        .filter(F.col("predicted").isNotNull())
        .collect()
    )
    assert [(r["predicted"], r["time"]) for r in out] == [(100.0, 1.0)]


# ------------------------------------------------- §expired / not-expired

def test_expired_state_and_ttl(spark):
    """streams_test.clj:1790-1830 — state="expired" or now past
    time+ttl (strict); now=10 vectors."""
    ev = events(
        spark,
        {"state": "expired"}, {"state": "ok"}, {"state": "warning"}, {"state": "expired"},
    )
    assert stateless.expired(ev, 0.0).count() == 2
    got = stateless.not_expired(ev, 0.0).orderBy("event_id").collect()
    assert [r["state"] for r in got] == ["ok", "warning"]

    ev = events(
        spark,
        {"time": 0.0, "ttl": 10.0},
        {"time": 1.0, "ttl": 5.0},
        {"time": 6.0, "ttl": 2.0},
        {"time": 10.0, "ttl": 2.0},
    )
    live = stateless.not_expired(ev, 10.0).orderBy("event_id").collect()
    assert [r["time"] for r in live] == [0.0, 10.0]
    dead = stateless.expired(ev, 10.0).orderBy("event_id").collect()
    assert [r["time"] for r in dead] == [1.0, 6.0]


# -------------------------------------------------------- §with / default

def test_with_and_default(spark):
    """streams_test.clj:656-716 — with overwrites always; default only
    fills nil fields."""
    ev = events(spark, {"service": None}, {"service": "foo"}, {"service": "bar"})
    got = [
        r["service"]
        for r in stateless.with_fields(ev, {"service": "foo"})
        .orderBy("event_id").collect()
    ]
    assert got == ["foo", "foo", "foo"]

    got = [
        r["service"]
        for r in stateless.default(ev, {"service": "foo"}).orderBy("event_id").collect()
    ]
    assert got == ["foo", "foo", "bar"]


def test_adjust(spark):
    """streams_test.clj:1574-1592 — field-function update."""
    ev = events(spark, {"state": None}, {"state": "hey", "service": "bar"})
    out = stateless.adjust(
        ev, "state", lambda c: F.concat(F.coalesce(c, F.lit("")), F.lit(" 2"))
    )
    got = [r["state"] for r in out.orderBy("event_id").collect()]
    assert got == [" 2", "hey 2"]

    ev = events(spark, {"tags": []}, {"tags": ["foo", "bar"]})
    out = stateless.smap(
        ev, "event_id", F.size(F.coalesce(F.col("tags"), F.array())).cast("double").alias("metric")
    )
    assert metrics(out) == [0.0, 2.0]


# ----------------------------------------------------------------- §folds

def _agg1(df, col):
    return df.agg(col.alias("v")).collect()[0]["v"]


def test_fold_sum_product_vectors(spark):
    """folds_test.clj sum/product via test-fold: nil metrics are
    skipped (keep :metric es)."""
    ev = events(spark, {"metric": 1.0}, {"metric": 2.0}, {"metric": 7.0}, {"metric": 7.0})
    assert _agg1(ev, folds.dsum()) == 17.0
    assert _agg1(ev, folds.fproduct()) == pytest.approx(98.0, rel=1e-12)

    ev = events(spark, {"metric": 2.0}, {"metric": None}, {"metric": 7.0})
    assert _agg1(ev, folds.dsum()) == 9.0


def test_fold_difference_quotient_vectors(spark):
    """folds_test.clj difference/quotient: first op rest, ordered."""
    ev = events(spark, {"metric": 1.0}, {"metric": 2.0}, {"metric": 7.0})
    assert _agg1(ev, folds.fdifference()) == -8.0  # 1-2-7

    ev = events(spark, {"metric": 1.0}, {"metric": 2.0}, {"metric": 4.0})
    assert _agg1(ev, folds.fquotient()) == pytest.approx(0.125, rel=1e-12)

    # divide-by-zero -> nil metric (the reference emits an error event)
    ev = events(spark, {"metric": 1.0}, {"metric": 2.0}, {"metric": 0.0})
    assert _agg1(ev, folds.fquotient()) is None


def test_fold_mean_stddev_vectors(spark):
    """folds_test.clj mean/std-dev: nil metrics skipped; floor(std)=147."""
    ev = events(spark, {"metric": 2.0}, {"metric": 4.0}, {"metric": None}, {"metric": 6.0})
    assert _agg1(ev, folds.dmean()) == 4.0

    ms = [600.0, None, 470.0, 170.0, 430.0, 300.0]
    ev = events(spark, *({"metric": m} for m in ms))
    # reference std-dev divides by n (folds.clj:212-221)
    got = _agg1(ev, folds.dstddev_pop())
    assert math.floor(got) == 147.0


def test_fold_min_max_mode_vectors(spark):
    """folds_test.clj minimum/maximum/mode."""
    ev = events(spark, *({"metric": m} for m in [2.0, 5.0, -4.0, 0.0]))
    assert _agg1(ev, folds.fmin()) == -4.0
    assert _agg1(ev, folds.fmax()) == 5.0

    ev = events(spark, *({"metric": m} for m in [1.0, 2.0, 3.0, 4.0, 2.0]))
    assert _agg1(ev, folds.fmode()) == 2.0
    # two modes {2,3}: the documented deterministic tie-break picks the
    # smallest (reference returns an arbitrary member of the set)
    ev = events(spark, *({"metric": m} for m in [1.0, 2.0, 3.0, 3.0, 4.0, 2.0]))
    assert _agg1(ev, folds.fmode()) in (2.0, 3.0)


# ----------------------------------------------------------------- §index

def _index_set(df):
    return {
        (r["host"], r["service"], r["description"])
        for r in df.select("host", "service", "description").collect()
    }


def test_index_update_latest_wins(spark):
    """index_test.clj nbhm-update — same-key inserts overwrite; the
    batch tie-break at equal time is arrival order (event_id)."""
    from riemann_spark.operators.index import build_index

    ev = events(
        spark,
        {"host": "1", "service": None, "time": 0.0},
        {"host": "2", "service": None, "time": 0.0},
        {"host": "1", "service": "3", "state": "ok", "time": 0.0},
        {"host": "1", "service": "3", "description": "new", "time": 0.0},
    )
    got = _index_set(build_index(ev))
    assert got == {("1", None, None), ("2", None, None), ("1", "3", "new")}


def test_index_delete_by_field_match(spark):
    """index_test.clj nhbm-delete — the delete event's [host service]
    must both match (nil service matches nil)."""
    from riemann_spark.operators.index import build_index, delete_from_index

    ev = events(
        spark,
        {"host": "1", "service": None, "time": 0.0},
        {"host": "2", "service": None, "time": 0.0},
    )
    idx = build_index(ev)
    idx = delete_from_index(idx, {"host": "1", "service": "1"})
    idx = delete_from_index(idx, {"host": "2", "service": None})
    assert _index_set(idx) == {("1", None, None)}


def test_index_search_query(spark):
    """index_test.clj nhbm-search — compound query with a negated
    wildcard-regex (ported onto the numeric metric field: ordered
    comparisons are number-guarded in both engines, query.clj:184-189)."""
    from riemann_spark.operators.index import build_index, search

    ev = events(
        spark,
        {"host": "1", "service": None, "metric": 1.0, "time": 0.0},
        {"host": "2", "service": "meow", "metric": 2.0, "time": 0.0},
        {"host": "3", "service": "mrrrow", "metric": 3.0, "time": 0.0},
    )
    got = search(build_index(ev), 'metric >= 2 and not service =~ "%r%"').collect()
    assert [(r["host"], r["service"]) for r in got] == [("2", "meow")]


def test_index_expire_default_ttl(spark):
    """index_test.clj nhbm-expire — ttl 0 expired, live within ttl,
    past-ttl expired; nil ttl falls back to default-ttl (60)."""
    from riemann_spark.operators.index import build_index, expire

    now = 1000.0
    ev = events(
        spark,
        {"host": "1", "ttl": 0.0, "time": now - 1},
        {"host": "2", "ttl": 10.0, "time": now},
        {"host": "3", "ttl": 20.0, "time": now - 21},
        {"host": "4", "ttl": None, "time": now},
        {"host": "5", "ttl": None, "time": now - 61},
    )
    live, dead = expire(build_index(ev), now)
    assert {r["host"] for r in dead.collect()} == {"1", "3", "5"}
    assert {r["host"] for r in live.collect()} == {"2", "4"}
    assert all(
        r["state"] == "expired" and r["time"] == now for r in dead.collect()
    )


def test_index_point_lookup(spark):
    """index_test.clj nbhm-read-index — lookup by [host service]."""
    from riemann_spark.operators.index import build_index, search

    ev = events(
        spark,
        {"host": "1", "service": "1", "metric": 5.0, "time": 0.0},
        {"host": "1", "service": "2", "metric": 7.0, "time": 0.0},
    )
    idx = build_index(ev)
    got = search(idx, 'host = "1" and service = "1"').collect()
    assert [r["metric"] for r in got] == [5.0]
    got = search(idx, 'host = "1" and service = "2"').collect()
    assert [r["metric"] for r in got] == [7.0]


# ------------------------------------------------------ §query predicates

@pytest.mark.slow
def test_query_predicate_vectors(spark):
    """query_test.clj:189-263 — the reference's good/evil event vectors
    per query, through the Column backend. state!=1 is ported onto
    metric (states are strings in this schema; the reference vector
    relies on an int-valued state)."""
    from riemann_spark.query import compile_query

    def f(query, good, evil):
        rows = [dict(r, metric=r.get("metric")) for r in good + evil]
        ev = events(spark, *rows)
        got = {r["event_id"] for r in ev.filter(compile_query(query)).collect()}
        assert got == set(range(len(good))), f"{query}: {sorted(got)}"

    f("true", [{"state": "foo"}, {}], [])
    f("false", [], [{"state": "foo"}, {}])
    f("null", [], [{"state": "foo"}, {}])

    f('state = "foo"', [{"state": "foo"}], [{"state": "bar"}, {"state": None}])

    f("metric != 1", [{"metric": 0.5}, {"metric": None}], [{"metric": 1.0}])

    f(
        'host =~ "%s."',
        [{"host": "s."}, {"host": "foos."}],
        [{"host": "a."}, {"host": "s.murf"}, {"host": None}],
    )

    f(
        'host ~= "foo?[1-9]+"',
        [{"host": "foo19"}, {"host": "foo1"}, {"host": "fo42"}],
        [{"host": "abc"}, {"host": "foo"}, {"host": "fooo42"}, {"host": None}],
    )

    f("metric > 10000000000", [{"metric": 1e11}], [{"metric": 1e10}, {}])
    f("metric >= -1", [{"metric": 0.0}, {"metric": -1.0}], [{"metric": -2.0}, {}])
    f("metric < 120", [{"metric": 15.0}], [{"metric": 120.0}, {}])
    f("metric <= 1", [{"metric": 1.0}, {"metric": -20.0}], [{"metric": 2.0}, {}])

    f(
        'tagged "cat"',
        [{"tags": ["cat", "dog"]}, {"tags": ["cat"]}],
        [{"tags": ["dog"]}, {"tags": None}],
    )

    f(
        "ttl = null and description != nil",
        [{"ttl": None, "description": "x"}, {"description": "hey"}],
        [{"ttl": 2.0, "description": "x"}, {"description": None}],
    )

    f(
        'not ((host = "1" or host = "2") and service = "3")',
        [{"host": "1", "service": None}, {"host": None, "service": "3"}, {}],
        [{"host": "2", "service": "3"}],
    )

    f(
        'paws = 4 and tagged "catz"',
        [{"attributes": {"paws": "4"}, "tags": ["fuzzy", "catz"]}],
        [
            {"attributes": {"paws": "4"}, "tags": ["fuzzy"]},
            {"attributes": {"paws": "4"}, "tags": []},
            {"attributes": {"paws": "4"}},
            {"attributes": {"paws": "3"}, "tags": ["fuzzy", "catz"]},
            {"attributes": {}, "tags": ["fuzzy", "catz"]},
            {"tags": ["fuzzy", "catz"]},
        ],
    )


# --------------------------------------------- §folds (round-5 widening)

def test_fold_quotient_negative_and_zero_vectors(spark):
    """folds_test.clj quotient-test/quotient-sloppy-test, the full
    table: negative metrics divide with rational-arithmetic signs
    ((2,−3) → −2/3); a zero divisor is the reference's
    ArithmeticException → nil metric; quotient-sloppy short-circuits
    ANY zero to 0 (folds.clj:147-154 "considers 0/0 = 0")."""

    def q(vals, fold=folds.fquotient):
        ev = events(spark, *({"metric": m} for m in vals))
        return ev.agg(fold().alias("v")).collect()[0]["v"]

    # quotient [1 2 0] -> "Can't divide by zero" -> nil
    assert q([1.0, 2.0, 0.0]) is None
    # (/ 2 -3) = -2/3 exactly in IEEE via sign*exp(ln) within 1 ulp
    assert q([2.0, -3.0]) == pytest.approx(-2.0 / 3.0, rel=1e-12)
    # sign parity: 1 / (-2 * -2) = 0.25
    assert q([1.0, -2.0, -2.0]) == pytest.approx(0.25, rel=1e-12)
    # zero FIRST over nonzero rest is plain 0
    assert q([0.0, 2.0]) == 0.0
    # quotient-sloppy-test vectors
    assert q([2.0, -3.0], folds.fquotient_sloppy) == pytest.approx(-2.0 / 3.0, rel=1e-12)
    assert q([0.0, 0.0], folds.fquotient_sloppy) == 0.0
    assert q([1.0, 0.0], folds.fquotient_sloppy) == 0.0


def _sorted_sample_exact(spark, vals, points):
    """The reference's sorted-sample-extract selection (folds.clj:16-49):
    element at floor(p·n) clamped to n−1 in metric order — the same
    expressions as the sorted_sample catalog builder, single group."""
    from pyspark.sql import Window

    ev = events(spark, *({"metric": m} for m in vals)).filter(
        F.col("metric").isNotNull()
    )
    if ev.count() == 0:
        return []
    w = Window.orderBy(F.col("metric"), F.col("event_id"))
    r = ev.select(
        "metric",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    out = []
    for p in points:
        idx = F.least(F.floor(F.lit(p) * F.col("n")), F.col("n") - 1) + 1
        out.append(
            r.agg(F.max(F.when(F.col("rn") == idx, F.col("metric"))).alias("v"))
            .collect()[0]["v"]
        )
    return out


def test_fold_sorted_sample_extract_vectors(spark):
    """folds_test.clj sorted-sample-extract-test — the full are-table
    at points [0 0.5 1]: empty and all-nil inputs sample to nothing;
    otherwise the floor-index element (NOT interpolation) at each
    point, duplicates preserved."""
    pts = [0.0, 0.5, 1.0]
    assert _sorted_sample_exact(spark, [], pts) == []
    assert _sorted_sample_exact(spark, [None], pts) == []
    assert _sorted_sample_exact(spark, [1.0], pts) == [1.0, 1.0, 1.0]
    assert _sorted_sample_exact(spark, [2.0, 1.0], pts) == [1.0, 2.0, 2.0]
    assert _sorted_sample_exact(spark, [3.0, 1.0, 2.0], pts) == [1.0, 2.0, 3.0]
    assert _sorted_sample_exact(spark, [6.0, 1.0, 2.0, 1.0, 1.0], pts) == [
        1.0, 1.0, 6.0,
    ]


def test_fold_count_vectors(spark):
    """folds_test.clj count-test: count tallies EVENTS (expired and
    nil-metric rows included), merged into the first event's fields —
    c2 [{2} {3}] → 2; c3 [{2} {3 expired} {4}] → 3."""
    ev = events(spark, {"metric": 2.0}, {"metric": 3.0})
    assert ev.agg(folds.fcount().alias("n")).collect()[0]["n"] == 2
    ev = events(
        spark,
        {"metric": 2.0},
        {"metric": 3.0, "state": "expired"},
        {"metric": 4.0, "ttl": 1.0, "time": -3.0},
    )
    assert ev.agg(folds.fcount().alias("n")).collect()[0]["n"] == 3
    # nil metrics still count as events (metric-keyed folds skip them,
    # count does not)
    ev = events(spark, {"metric": None}, {"metric": 5.0})
    assert ev.agg(folds.fcount().alias("n")).collect()[0]["n"] == 2


def test_fold_modes_full_table(spark):
    """folds_test.clj modes-test: the multi-mode SET {2,3}, the single
    mode [2], and empty → empty."""
    ev = events(spark, *({"metric": m} for m in [1.0, 2.0, 3.0, 4.0, 2.0]))
    assert ev.agg(folds.fmodes().alias("m")).collect()[0]["m"] == [2.0]
    ev = events(spark, *({"metric": m} for m in [1.0, 2.0, 3.0, 3.0, 4.0, 2.0]))
    assert sorted(ev.agg(folds.fmodes().alias("m")).collect()[0]["m"]) == [2.0, 3.0]


# ----------------------------------------- §smap nil semantics (:30-44)

def test_smap_star_passes_null_results_smap_drops(spark):
    """streams_test.clj:30-43 — (smap* identity) passes nil values
    through; (smap identity) drops them. Columnar analogue: the
    all-null projection row survives smap* and is filtered by smap's
    trailing where (the documented contract in stateless.smap)."""
    ev = events(spark, {"metric": 1.0}, {"metric": None}, {"metric": 3.0})
    mapped = stateless.smap(ev, F.col("event_id"), F.col("metric"))
    # smap* semantics: nothing dropped
    assert mapped.count() == 3
    # smap semantics: nil results filtered by the trailing where
    kept = mapped.filter(F.col("metric").isNotNull())
    assert [r["metric"] for r in kept.orderBy("event_id").collect()] == [1.0, 3.0]


# -------------------------------- §where edge cases (streams_test.clj:462-655)

def _svc_set(df):
    return [r["service"] for r in df.orderBy("event_id").collect()]


def test_where_field_or_vectors(spark):
    """streams_test.clj:463-476 "field" — (or (state "ok" "good")
    (= "weird" state)): set-membership OR equality on a field."""
    ev = events(
        spark, {"state": "ok"}, {"state": "good"}, {"state": "weird"}, {"state": "error"}
    )
    got = stateless.where(
        ev, F.col("state").isin("ok", "good") | (F.col("state") == "weird")
    )
    assert [r["state"] for r in got.orderBy("event_id").collect()] == [
        "ok", "good", "weird",
    ]


def test_where_regex_vectors(spark):
    """streams_test.clj:484-490 "regex" — (service #"^foo"): a nil
    service does not match (rlike on null is null → dropped)."""
    ev = events(spark, {"service": None}, {"service": "foo"}, {"service": "food"})
    got = stateless.where(ev, F.col("service").rlike("^foo"))
    assert _svc_set(got) == ["foo", "food"]


def test_where_function_predicate_vectors(spark):
    """streams_test.clj:492-505 "functions" — (and metric (even?
    metric)): the nil-metric event is dropped by the conjunction."""
    ev = events(spark, {"metric": None}, {"metric": 1.0}, {"metric": 2.0})
    got = stateless.where(
        ev, F.col("metric").isNotNull() & (F.col("metric") % 2 == 0)
    )
    assert [r["metric"] for r in got.collect()] == [2.0]


def test_where_set_predicate_vectors(spark):
    """streams_test.clj:507-513 "using sets as predicates"."""
    ev = events(
        spark,
        {"service": "service1"},
        {"service": "service2"},
        {"service": "service-doesnt-match"},
    )
    got = stateless.match(ev, "service", {"service1", "service2"})
    assert sorted(_svc_set(got)) == ["service1", "service2"]


def test_where_tagged_vectors_single_and_multi(spark):
    """streams_test.clj:527-600 — the tagged / tagged-all / tagged-any
    tables: nil-tags and empty-tags events never match; multi-tag
    tagged-all needs every tag, tagged-any any one."""
    rows = [
        {"tags": None},
        {"tags": []},
        {"tags": ["blah"]},
        {"tags": ["foo"]},
        {"tags": ["foo", "bar"]},
        {"tags": ["baz", "bar"]},
    ]
    ev = events(spark, *rows)

    def tags_of(df):
        return [tuple(r["tags"]) for r in df.orderBy("event_id").collect()]

    assert tags_of(stateless.tagged_all(ev, ["foo"])) == [("foo",), ("foo", "bar")]
    assert tags_of(stateless.tagged_any(ev, ["foo"])) == [("foo",), ("foo", "bar")]
    assert tags_of(stateless.tagged_all(ev, ["foo", "bar"])) == [("foo", "bar")]
    assert tags_of(stateless.tagged_any(ev, ["foo", "bar"])) == [
        ("foo",), ("foo", "bar"), ("baz", "bar"),
    ]


def test_where_else_vectors(spark):
    """streams_test.clj:602-616 "else" — (where (service #"a") ...
    (else ...)): match ["cat" "badger"], else ["dog" nil] — the
    nil-service event goes to the ELSE branch (two-valued closure:
    null predicate results are not matches)."""
    ev = events(
        spark,
        {"service": "cat"},
        {"service": "dog"},
        {"service": None},
        {"service": "badger"},
    )
    hit, miss = stateless.where_else(ev, F.col("service").rlike("a"))
    assert _svc_set(hit) == ["cat", "badger"]
    assert _svc_set(miss) == ["dog", None]


def test_splitp_three_branch_vectors(spark):
    """streams_test.clj:372-389 splitp "basics" — (splitp <= metric
    10 crit 5 warn ok): first matching threshold wins, default
    catches the rest. Also :331-338 split* without a default: the
    unmatched event is DROPPED."""
    ev = events(spark, {"metric": 15.0}, {"metric": 8.0}, {"metric": 2.0})
    routed = stateless.split_by(
        ev,
        [(F.col("metric") >= 10, "crit"), (F.col("metric") >= 5, "warn")],
        default_value="ok",
        alias="state",
    )
    got = {r["metric"]: r["state"] for r in routed.collect()}
    assert got == {15.0: "crit", 8.0: "warn", 2.0: "ok"}

    # without a default: unmatched rows drop (split*-test :326-338)
    routed = stateless.split_by(
        ev,
        [(F.col("metric") >= 10, "crit"), (F.col("metric") >= 5, "warn")],
        alias="state",
    )
    got = {
        r["metric"]: r["state"] for r in routed.filter(F.col("state").isNotNull()).collect()
    }
    assert got == {15.0: "crit", 8.0: "warn"}


# ------------------------------------- §run-stream-intervals (test.clj:218-236)
# Wall-clock emission vectors driven through the REAL stateful update
# closures under the virtual clock (riemann_spark.streaming.testkit —
# controlled time + deterministic timer firing, the r5 throttle port's
# pattern generalized).

def _intervals(build, seq, **kw):
    from riemann_spark.streaming.testkit import run_stream_intervals

    return run_stream_intervals(build, seq, **kw)


def _m(metric=None, **kw):
    e = {"host": "h", "service": "s"}
    if metric is not None:
        e["metric"] = float(metric)
    e.update(kw)
    return e


def test_batch_interval_vectors(spark):
    """streams_test.clj:1401-1414 batch-test — (batch 2 3):
    nothing → nothing; incomplete batches [:a 3 :b 1 :c 2 :d 3] →
    [[a] [b c] [d]]; overflowing [:a 1 ... :f 1] →
    [[a b] [c] [d e] [f]]. Flush groupings asserted via (n, sum)."""
    from riemann_spark.streaming.stateful_ops import streaming_batch

    build = lambda s: streaming_batch(s, 2, 3.0)
    assert _intervals(build, []) == []

    out = _intervals(build, [_m(1), 3, _m(2), 1, _m(4), 2, _m(8), 3])
    assert [(r["n"], r["sum_metric"]) for r in out] == [
        (1, 1.0), (2, 6.0), (1, 8.0)
    ]
    assert [r["reason"] for r in out] == ["time", "count", "time"]

    out = _intervals(
        build,
        [_m(1), 1, _m(2), 1, _m(4), 1, _m(8), 1, _m(16), 1, _m(32), 1],
    )
    assert [(r["n"], r["sum_metric"]) for r in out] == [
        (2, 3.0), (1, 4.0), (2, 24.0), (1, 32.0)
    ]
    assert [r["reason"] for r in out] == ["count", "time", "count", "time"]


def test_rollup_interval_vectors(spark):
    """streams_test.clj:1375-1399 rollup-test — all four testings.
    Pass-throughs carry n_rolled null; digests carry the rolled
    count. The 'basic rollups' vector pins the budget-consumption
    subtlety: a non-empty flush debits the NEXT window's send budget."""
    from riemann_spark.streaming.stateful_ops import streaming_rollup

    def shape(rows):
        return [
            (r["metric"], None) if r["n_rolled"] is None
            else (r["sum_metric"], r["n_rolled"])
            for r in rows
        ]

    # single output event per interval: (rollup 1 2)
    out = _intervals(
        lambda s: streaming_rollup(s, 1, 2.0),
        [_m(1), 0, _m(2), 0, _m(4), 2, _m(8), 0, _m(16), 0, _m(32), 2],
    )
    #               [a]        [b c]       [d e f]
    assert shape(out) == [(1.0, None), (6.0, 2), (56.0, 3)]

    # basic rollups: (rollup 2 1)
    out = _intervals(
        lambda s: streaming_rollup(s, 2, 1.0),
        [_m(1), 0, _m(2), 0, _m(4), 1,
         _m(8), 0, _m(16), 0, _m(32), 0, _m(64), 1,
         _m(128), 10],
    )
    # [1] [2] | [4] | [8] | [16 32 64] | [128]
    assert shape(out) == [
        (1.0, None), (2.0, None), (4.0, 1), (8.0, None),
        (112.0, 3), (128.0, None),
    ]

    # expired events roll like any other: (rollup 2 3)
    out = _intervals(
        lambda s: streaming_rollup(s, 2, 3.0),
        [_m(1), 0, _m(2, state="expired"), 0,
         _m(4), 1, _m(8), 1, _m(16), 1],
    )
    assert shape(out) == [(1.0, None), (2.0, None), (28.0, 3)]
    assert out[1]["state"] == "expired"

    # (rollup 2 2) over four expireds
    out = _intervals(
        lambda s: streaming_rollup(s, 2, 2.0),
        [_m(1, state="expired"), 0, _m(2, state="expired"), 0,
         _m(4, state="expired"), 1, _m(8, state="expired"), 1],
    )
    assert shape(out) == [(1.0, None), (2.0, None), (12.0, 2)]
    assert all(r["state"] == "expired" for r in out)


def test_rate_without_input_vector(spark):
    """streams_test.clj:1099-1110 rate-without-input — (rate 1):
    emission continues with metric 0 through empty intervals, the
    template is the most recent event, ttls decay by interval, and a
    trailing expired event stops the poller."""
    from riemann_spark.streaming.stateful_ops import streaming_rate_interval

    out = _intervals(
        lambda s: streaming_rate_interval(s, 1.0),
        [{"metric": 1.0, "service": "foo"}, 0.5,
         {"metric": 1.0, "service": "bar"}, 0.5,
         {"metric": 1.0, "service": "baz", "ttl": 3.0}, 3,
         {"state": "expired"}, None],
        row_fields=("event_id", "time", "metric", "state", "host",
                    "service", "ttl"),
        key_fields=(),  # the reference rate is a global stream op
    )
    got = [(r["time"], r["metric"], r["service"], r["ttl"]) for r in out]
    assert got == [
        (1.0, 2.0, "bar", None),
        (2.0, 1.0, "baz", 3.0),
        (3.0, 0.0, "baz", 2.0),
        (4.0, 0.0, "baz", 1.0),
    ]


def test_rate_expiration_vector(spark):
    """streams_test.clj:1111-1118 rate-expiration — (rate 1) over one
    event with ttl 3 at time 0, then 5 s of silence: three ticks (the
    last at t=3 with ttl 1), then the poller self-cancels because the
    most recent event expired."""
    from riemann_spark.streaming.stateful_ops import streaming_rate_interval

    out = _intervals(
        lambda s: streaming_rate_interval(s, 1.0),
        [{"time": 0.0, "metric": 1.0, "ttl": 3.0}, 5],
        row_fields=("event_id", "time", "metric", "state", "host",
                    "service", "ttl"),
        key_fields=(),
    )
    got = [(r["time"], r["metric"], r["ttl"]) for r in out]
    assert got == [(1.0, 1.0, 3.0), (2.0, 0.0, 2.0), (3.0, 0.0, 1.0)]


def test_fill_in_last_interval_vectors(spark):
    """streams_test.clj:905-930 fill-in-last-test (single-key form —
    this op keys on host/service where the reference is global):
    quick succession passes [1 2 3] untouched; with a 0.06 s gap at
    interval 0.05 a filler (update {:metric 0}) appears, an expired
    event cancels the filler and passes through, the next live event
    resumes: metrics [1 0 2 3 0 4 5].

    This also ports fill-in-test (streams_test.clj:882-903): its
    vectors are metric-for-metric identical — fill-in emits the
    static default event where fill-in-last merges the default into
    the last event, and the default here IS {:metric 0}, so both
    deftests assert the same [1 2 3] / [1 0 2 3 0 4 5] sequences."""
    from riemann_spark.streaming.stateful_ops import streaming_fill_in_last

    build = lambda s: streaming_fill_in_last(s, 0.01, {"metric": 0.0})
    out = _intervals(build, [_m(1), None, _m(2), None, _m(3), None])
    assert [r["metric"] for r in out] == [1.0, 2.0, 3.0]

    build = lambda s: streaming_fill_in_last(s, 0.05, {"metric": 0.0})
    out = _intervals(
        build,
        [_m(1), 0.06, _m(2), None, _m(3), 0.08,
         _m(4, state="expired"), 0.06, _m(5), None],
    )
    assert [r["metric"] for r in out] == [1.0, 0.0, 2.0, 3.0, 0.0, 4.0, 5.0]
    assert [r["filled"] for r in out] == [
        None, "fill", None, None, "fill", None, None
    ]


def test_interpolate_constant_interval_vectors(spark):
    """streams_test.clj:932-980 interpolate-constant-test — all five
    vectors: empty → empty; a single state forwards once (the delay-0
    first tick); immediate successors within an interval are ignored;
    regular fill at 0.1 over 0.22 gaps → [1 1 1 2 2 3 3]; a final
    expired event forwards immediately; and no fill during expired
    times → [1 2 2 2 3]."""
    from riemann_spark.streaming.stateful_ops import (
        streaming_interpolate_constant,
    )

    row_fields = ("event_id", "time", "metric", "state", "ttl")

    def run(interval, seq):
        return [
            r["metric"]
            for r in _intervals(
                lambda s: streaming_interpolate_constant(s, interval),
                seq, row_fields=row_fields,
            )
        ]

    assert run(0.01, []) == []
    assert run(0.1, [_m(1), 0.05]) == [1.0]
    assert run(0.1, [_m(1), 0.05, _m(2), None, _m(3), None]) == [1.0]

    gaps = [x for m in (1, 2, 3, 4) for x in (_m(m), 0.22)][:-1]
    assert run(0.1, gaps) == [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0]

    gaps_exp = [_m(1), 0.22, _m(2), 0.22, _m(3), 0.22,
                _m(4, state="expired"), None]
    assert run(0.1, gaps_exp) == [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0]

    no_fill = [_m(1, state="expired"), 0.12, _m(2), 0.12,
               _m(3, state="expired"), 0.12]
    assert run(0.05, no_fill) == [1.0, 2.0, 2.0, 2.0, 3.0]


def test_coalesce_interval_vector(spark):
    """streams_test.clj:1417-1449 coalesce-test — per-dt snapshots of
    the latest event per key: new keys join the snapshot, a newer
    event replaces its key, an expired event is emitted ONCE and then
    forgotten. (The reference's ttl-lapse leg is the index reaper's
    job in this engine — streaming_index feeds coalesce the synthetic
    expired event, so the vector injects it explicitly at a2's
    time+ttl.) Content asserted as the last emission per key after
    each advance, since our per-key timers emit key-wise what the
    reference emits as one table vector."""
    from riemann_spark.streaming.stateful_ops import streaming_coalesce
    from riemann_spark.streaming.testkit import IntervalHarness, run_stream_intervals

    # drive manually for mid-sequence assertions
    import riemann_spark.streaming.state_api as sa

    captured = {}
    prev = sa._capture_hook
    sa._capture_hook = lambda *a: captured.update(update=a[1], keys=tuple(a[0]))
    try:
        streaming_coalesce(None, 1.0)
    finally:
        sa._capture_hook = prev
    h = IntervalHarness(captured["update"], captured["keys"])
    fields = ("event_id", "time", "metric", "state")

    def latest_per_key():
        last = {}
        for r in h.out:
            last[(r["host"], r["service"])] = (r["state"], r["time"])
        return {(k[1], v[0]) for k, v in last.items()}

    a1 = {"host": "h", "service": "a", "state": "one", "time": 0.0}
    b1 = {"host": "h", "service": "b", "state": "one", "time": 0.0}
    a2 = {"host": "h", "service": "a", "state": "two", "time": 3.0, "ttl": 2.0}
    c1 = {"host": "h", "service": "c", "state": "one", "time": 0.0}
    b2 = {"host": "h", "service": "b", "state": "two", "time": 0.0}

    h.send(a1, fields); h.advance(1.1)
    assert latest_per_key() == {("a", "one")}
    h.send(b1, fields); h.advance(1.1)
    assert latest_per_key() == {("a", "one"), ("b", "one")}
    h.send(a2, fields); h.advance(1.1)
    assert latest_per_key() == {("a", "two"), ("b", "one")}
    # a2 expires at time+ttl=5: the reaper's synthetic expired event
    h.send({"host": "h", "service": "a", "state": "expired", "time": 5.0},
           fields)
    h.send(c1, fields); h.advance(2.0)
    assert latest_per_key() == {("a", "expired"), ("b", "one"), ("c", "one")}
    # expired-a was emitted once and forgotten: further advances only
    # re-emit b and c
    n_a = sum(1 for r in h.out if r["service"] == "a" and r["state"] == "expired")
    assert n_a == 1
    h.out.clear()
    h.send(b2, fields); h.advance(1.1)
    assert latest_per_key() == {("b", "two"), ("c", "one")}
    assert not any(r["service"] == "a" for r in h.out)


def test_ddt_interval_vectors(spark):
    """streams_test.clj:1009-1038 ddt-interval-test — all three
    testings: a quick burst inside one interval emits nothing; one
    event per interval differentiates pairwise; multiple events per
    interval sample only the latest (nil metrics ignored); empty
    intervals emit zeroes by re-sampling."""
    from riemann_spark.streaming.stateful_ops import streaming_ddt_interval

    row_fields = ("event_id", "time", "metric", "state", "ttl")

    def run(n, seq):
        return [
            (r["time"], r["metric"])
            for r in _intervals(
                lambda s: streaming_ddt_interval(s, n),
                seq, row_fields=row_fields,
            )
        ]

    # quick burst without crossing interval
    assert run(0.1, [_m(1), None, _m(2), None, _m(3), None]) == []

    # 1 event per interval (the swap occurs just prior to events at t1)
    out = run(1.0, [_m(-1, time=0.0), 0.99, _m(0, time=1.0), 1,
                    _m(-5, time=2.0), 1])
    # tick times land exactly at the armed deadlines — the
    # reference's {:time 1} / {:time 2}
    assert out == [(1.0, 1.0), (2.0, -5.0)]

    # n events per interval: latest sampled, nil ignored
    nil = {"host": "h", "service": "s", "time": 1.5}
    out = run(1.0, [_m(-1, time=0.0), 0.01, _m(100, time=0.5), 0.5,
                    _m(1, time=1.0), 0.5, nil, 0.5, _m(-3, time=2.0), 0.5])
    assert [m for _t, m in out] == [2.0, -4.0]

    # emits zeroes when no events arrive in an interval
    out = run(2.0, [_m(0, time=0.0), 1, _m(1, time=1.0), 2,
                    _m(2, time=3.0), 3])
    assert [m for _t, m in out] == [1.0, 0.5, 0.0]
    assert [t for t, _m2 in out] == [2.0, 4.0, 6.0]


def test_fold_interval_vectors(spark):
    """streams_test.clj:1119-1139 fold-interval-test +
    fold-interval-metric-test — (fold-interval 1 :metric +): events
    bin by time (part-time-fn's quot(t, interval), epoch-anchored;
    the vector's timeless events take the controlled clock's arrival
    times), each closed bin emits the fold: [12, 200]. Event-time
    binning is exactly this engine's time_bucket groupBy — the same
    plan streaming_window_folds closes by watermark."""
    from riemann_spark.operators.analytics import time_bucket

    arrivals = [0.0, 0.1, 0.3, 0.6, 1.6, 1.7]
    metrics = [2.0, 4.0, 2.0, 4.0, 100.0, 100.0]
    df = spark.createDataFrame(
        [(i, "h", "s", m, t) for i, (m, t) in enumerate(zip(metrics, arrivals))],
        "event_id long, host string, service string, metric double, time double",
    )
    out = (
        df.groupBy(time_bucket(1.0, "time").alias("bin"))
        .agg(F.sum("metric").alias("m"))
        .orderBy("bin")
        .collect()
    )
    assert [r.m for r in out] == [12.0, 200.0]


def test_part_time_simple_vector(spark):
    """streams_test.clj:1733-1759 part-time-simple-test — the
    wall-clock window primitive under rollup/batch: dt=5 windows
    anchored at the first event, ticking THROUGH silence (empty
    windows call nothing but the cadence holds), each flush carrying
    exactly the events that fell in [start, end). Driven through
    streaming_batch with the count bound out of reach, so every flush
    is the time flush: window contents match the reference's
    [[1 t1 t2 t4 t5 6] [6 t6 t8 t9 11] [96 t99 t100 101]
    [101 t101 t102 106]]."""
    from riemann_spark.streaming.stateful_ops import streaming_batch

    times = [1, 2, 4, 5, 6, 8, 9, 99, 100, 101, 102]
    import riemann_spark.streaming.state_api as sa
    from riemann_spark.streaming.testkit import IntervalHarness

    captured = {}
    hook_prev = sa._capture_hook
    sa._capture_hook = lambda *a: captured.update(update=a[1], keys=tuple(a[0]))
    try:
        streaming_batch(None, 100, 5.0)
    finally:
        sa._capture_hook = hook_prev
    h = IntervalHarness(captured["update"], captured["keys"])
    fields = ("event_id", "time", "metric")
    h.advance(1.0)
    for i, t in enumerate(times):
        h.send({"host": "h", "service": "s", "metric": 1.0,
                "time": float(t)}, fields)
        nxt = times[i + 1] if i + 1 < len(times) else t + 99
        h.advance(float(nxt - t))
    got = [(r["n"], r["t_first"], r["t_last"], r["reason"]) for r in h.out]
    assert got == [
        (4, 1.0, 5.0, "time"),
        (3, 6.0, 9.0, "time"),
        (2, 99.0, 100.0, "time"),
        (2, 101.0, 102.0, "time"),
    ]


def test_apdex_vector(spark):
    """streams_test.clj:1761-1770 apdex-test — 5 ok + 7 warning +
    3 expired + 1 fail + 1 final in one window: expired events count
    toward NOTHING (total = 14, not 17), satisfied 5, tolerated 7 →
    apdex = (5 + 7/2) / 14."""
    from riemann_spark.operators import analytics

    states = (["ok"] * 5 + ["warning"] * 7 + ["expired"] * 3
              + ["fail"] + ["final"])
    df = spark.createDataFrame(
        [(i, "h", "s", st, 0.0) for i, st in enumerate(states)],
        "event_id long, host string, service string, state string, time double",
    )
    out = analytics.apdex(
        df, F.col("state") == "ok", F.col("state") == "warning",
        3.0, keys=("service",),
    ).collect()
    assert len(out) == 1
    assert out[0].apdex == (5 + 7 / 2) / 14


def test_stable_interval_vectors(spark):
    """streams_test.clj:1493-1508 stable-test, the two wall-clock
    blocks: (stable 10 :x) triggers after dt seconds of stability
    even WITHOUT new events (the once! confirmation timer), and
    flushes the whole buffered run when stability is proven either by
    the clock or by event-time span. (The event-driven stable blocks
    at 1461-1491 are covered by the batch operator's tests.)"""
    from riemann_spark.streaming.stateful_ops import streaming_stable

    row_fields = ("event_id", "time", "metric", "state", "sval",
                  "host", "service")

    def run(seq):
        return [
            (r["metric"], r["time"])
            for r in _intervals(
                lambda s: streaming_stable(s, 10.0, field="metric"),
                seq, row_fields=row_fields,
            )
        ]

    # Triggers after dt seconds of stability, even without new events.
    got = run(
        [{"metric": 0.0, "time": 0.0, "sval": "0.0"}, 1,
         {"metric": 1.0, "time": 1.0, "sval": "1.0"}, 10,
         {"metric": 2.0, "time": 11.0, "sval": "2.0"}, 1]
    )
    assert got == [(1.0, 1.0)]

    # Triggers after dt seconds with new events.
    got = run(
        [{"metric": 0.0, "time": 0.0, "sval": "0.0"}, 1,
         {"metric": 0.0, "time": 1.0, "sval": "0.0"}, 4,
         {"metric": 0.0, "time": 5.0, "sval": "0.0"}, 6,
         {"metric": 1.0, "time": 11.0, "sval": "1.0"}, 1]
    )
    assert got == [(0.0, 0.0), (0.0, 1.0), (0.0, 5.0)]


def test_clock_skew_interval_vector(spark):
    """streams_test.clj:1773-1789 clock-skew-test — per-host clocks
    projected forward from arrival stamps, each event compared to the
    upper-median clock: metrics [0 0 5 -4 89] (the last: foo claims
    t=100 at wall 4+2 while the median host clock reads 11)."""
    from riemann_spark.streaming.stateful_ops import streaming_clock_skew

    out = _intervals(
        lambda s: streaming_clock_skew(s),
        [{"time": 1.0, "host": "foo"}, 1,
         {"time": 3.0, "host": "bar"}, 1,
         {"time": 9.0, "host": "baz"}, 1,
         {"time": 1.0, "host": "foo"}, 1,
         {"time": 100.0, "host": "foo"}, None],
        row_fields=("host", "event_id", "time", "metric", "state"),
        key_fields=("__g",),
    )
    got = [(r["host"], r["time"], r["metric"]) for r in out]
    assert got == [
        ("foo", 1.0, 0.0),
        ("bar", 3.0, 0.0),
        ("baz", 9.0, 5.0),
        ("foo", 1.0, -4.0),
        ("foo", 100.0, 89.0),
    ]


def test_project_expiration_interval_vector(spark):
    """streams_test.clj:1562-1572 project-test "Expiration test" —
    a slot whose event's ttl has lapsed by the next matching arrival
    is emitted ONCE in expired form ({:service kept, :state
    "expired", :time now}, metric dropped) and cleared: emissions
    [[foo nil] [expired-foo bar] [nil bar-ok2]]."""
    from pyspark.sql import functions as F

    from riemann_spark.streaming.stateful_ops import streaming_project

    out = _intervals(
        lambda s: streaming_project(
            s,
            [F.col("service") == "foo", F.col("service") == "bar"],
            with_expiry=True,
        ),
        [{"service": "foo", "state": "ok", "time": 0.0, "ttl": 1.0,
          "pm0": True, "pm1": False}, 2,
         {"service": "bar", "state": "ok", "pm0": False, "pm1": True}, 1,
         {"service": "bar", "state": "ok2", "pm0": False, "pm1": True}, None],
        row_fields=("event_id", "time", "metric", "service", "state",
                    "ttl", "pm0", "pm1"),
        key_fields=("__g",),
    )
    got = [
        [
            (r[f"slot{i}_service"], r[f"slot{i}_state"], r[f"slot{i}_time"])
            for i in (0, 1)
        ]
        for r in out
    ]
    assert got == [
        [("foo", "ok", 0.0), (None, None, None)],
        [("foo", "expired", 2.0), ("bar", "ok", 2.0)],
        [(None, None, None), ("bar", "ok2", 3.0)],
    ]


def test_rate_slow_even_vector(spark):
    """streams_test.clj:1040-1076 rate-slow-even — (rate 1) fed 10
    events/s for 5 s through the virtual clock: the summed tick
    metrics conserve every input event, all middle intervals measure
    exactly the generation rate, and the first+last pair is
    complementary (a boundary event may slide one interval, never
    vanish). rate-threaded (1078-1097) is n/a by design: the STM
    thread race it exercises is replaced by partition-parallel
    partial aggregation in Spark."""
    from riemann_spark.streaming.stateful_ops import streaming_rate_interval

    seq = []
    for _ in range(50):
        seq.append({"metric": 1.0, "service": "s", "host": "h"})
        seq.append(0.1)
    out = _intervals(
        lambda s: streaming_rate_interval(s, 1.0),
        seq,
        row_fields=("event_id", "time", "metric", "state", "host",
                    "service", "ttl"),
        key_fields=(),
    )
    # all 50 events counted, every closed interval at exactly gen-rate
    assert [(r["time"], r["metric"]) for r in out] == [
        (1.0, 10.0), (2.0, 10.0), (3.0, 10.0), (4.0, 10.0), (5.0, 10.0)
    ]


def test_percentiles_service_suffix_vector(spark):
    """Ports core_test.clj percentiles (core_test.clj:346-377): 101
    shuffled metrics 0..100 through ``percentiles 1 [0 0.5 0.95 0.99
    1]`` -> one service-suffixed event per point with the exact rank
    value (50/95/99/100; integer rank positions, so interpolation
    cannot diverge)."""
    rows = [("h", "per", float(n), 0.5) for n in range(101)]
    df = spark.createDataFrame(
        rows, "host string, service string, metric double, time double"
    )
    out = analytics.percentiles(df, 1.0, [0, 0.5, 0.95, 0.99, 1])
    got = {r["service"]: r["metric"] for r in out.collect()}
    assert got["per 0.5"] == 50.0
    assert got["per 0.95"] == 95.0
    assert got["per 0.99"] == 99.0
    assert got["per 1"] == 100.0
    assert got["per 0"] == 0.0


def test_sdo_fans_out_to_every_child(spark):
    """Ports sdo-test (streams_test.clj): every child sees every
    event, a single child is pass-through, and zero children is a
    no-op that feeds nothing anywhere."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "metric long")
    outs = stateless.sdo(
        df,
        lambda d: d.select((F.col("metric") + 1).alias("metric")),
        lambda d: d.select((F.col("metric") * 10).alias("metric")),
    )
    assert [sorted(r.metric for r in o.collect()) for o in outs] == [
        [2, 3, 4],
        [10, 20, 30],
    ]
    assert stateless.sdo(df) == []


def test_ensure_event_times_defaults_ingest_clock(spark):
    """Ports post-load-event (common.clj:86-89) and core_test
    ensures-event-times: a time-less event gets the ingest clock
    (pinned here), an event with a time keeps it, and time_us mirrors
    the fill."""
    df = spark.createDataFrame(
        [("h1", None, None), ("h2", 50.0, 50_000_000)],
        "host string, time double, time_us long",
    )
    out = {r.host: (r.time, r.time_us)
           for r in stateless.ensure_event_times(df, now=123.5).collect()}
    assert out == {"h1": (123.5, 123_500_000), "h2": (50.0, 50_000_000)}
    # unpinned: the query-constant clock fills every null identically
    live = stateless.ensure_event_times(df).collect()
    filled = [r.time for r in live if r.host == "h1"]
    assert filled[0] is not None and filled[0] > 1.7e9


def test_iso8601_to_unix_reference_vectors(spark):
    """Ports iso8601->unix-test (common_test.clj): offset datetimes,
    fractional seconds, Z, and bare dates (UTC midnight) — the exact
    four reference vectors — plus numeric passthrough on the JSON
    ingest path."""
    from riemann_spark.sources.json_codec import events_from_json

    rows = [
        ('{"host":"a","time":"2013-04-15T18:06:58-07:00"}',),
        ('{"host":"b","time":"2013-04-15T18:06:58.123+11:00"}',),
        ('{"host":"c","time":"2013-04-15T18:06:58Z"}',),
        ('{"host":"d","time":"2013-04-15"}',),
        ('{"host":"e","time":1366074418.5}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = {r.host: r.time for r in events_from_json(df).collect()}
    assert got == {
        "a": 1366074418.0,
        "b": 1366009618.0,
        "c": 1366049218.0,
        "d": 1365984000.0,
        "e": 1366074418.5,
    }


def test_iso8601_variable_fraction_vectors(spark):
    """The reference's :date-time-parser accepts any fractional-second
    width (common.clj:76-84). Variable-fraction forms ('…58.1Z',
    '…58.123456+02:00') must parse — not NULL out and silently fall
    back to the ingest clock downstream."""
    from riemann_spark.sources.json_codec import iso8601_to_unix

    rows = [
        (0, "2013-04-15T18:06:58.1Z"),
        (1, "2013-04-15T18:06:58.123456+02:00"),
        (2, "2013-04-15T18:06:58.12-07:00"),
        (3, "not-a-time"),
        (4, "2013-04-15T18:06:58"),  # offset-less -> UTC
        (5, "2013-04-15T18:06:58+02"),  # hour-only ISO offset
        (6, "2013-04-15T18:06:58-07"),
        (7, "2013-04-15T18:06:58.25"),  # offset-less + fraction -> UTC
        # offset-less INSIDE a DST skip window (02:30 local does not
        # exist in America/Los_Angeles on 2013-03-10) — must still be
        # the plain UTC instant, independent of the session zone
        (8, "2013-03-10T02:30:00"),
    ]
    df = spark.createDataFrame(rows, "i int, s string")
    expected = {
        0: 1366049218.0,
        1: 1366042018.0,
        2: 1366074418.0,
        3: None,
        4: 1366049218.0,
        5: 1366042018.0,
        6: 1366074418.0,
        7: 1366049218.0,
        8: 1362882600.0,
    }
    got = {
        r.i: r.t
        for r in df.select("i", iso8601_to_unix(F.col("s")).alias("t")).collect()
    }
    assert got == expected
    # every vector must be SESSION-TIMEZONE-INDEPENDENT — offset-less
    # forms anchor to UTC (the reference's clj-time default zone),
    # they must not drift with spark.sql.session.timeZone
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        got_la = {
            r.i: r.t
            for r in df.select(
                "i", iso8601_to_unix(F.col("s")).alias("t")
            ).collect()
        }
        assert got_la == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_json_iso_emission_timezone_independent(spark):
    """events_to_json(iso_times=True) must emit the correct UTC
    instant with a literal 'Z' even when the session timezone is not
    UTC — an XXX offset pattern would print the session offset against
    a UTC wall clock, shifting the instant."""
    from riemann_spark.sources.json_codec import (
        events_from_json,
        events_to_json,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        ev = spark.createDataFrame(
            [("h", 1366074418.0)], "host string, time double"
        )
        raw = events_to_json(ev, iso_times=True).collect()[0]["value"]
        assert '"time":"2013-04-16T01:06:58.000Z"' in raw
        back = events_from_json(
            spark.createDataFrame([(raw,)], "value string")
        ).collect()[0]
        assert back["time"] == 1366074418.0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_json_iso_time_emission_roundtrips(spark):
    """event-to-json emits ISO8601 times (common.clj:126-130); our
    opt-in iso_times lane must round-trip through the ingest parser
    to the same unix seconds."""
    from riemann_spark.sources.json_codec import (
        events_from_json,
        events_to_json,
    )

    ev = spark.createDataFrame(
        [("h", "s", 1366074418.0)],
        "host string, service string, time double",
    )
    j = events_to_json(ev, iso_times=True)
    assert '"time":"20' in j.collect()[0]["value"]  # ISO string on the wire
    back = events_from_json(j).collect()[0]
    assert back["time"] == 1366074418.0


def test_iso8601_to_unix_random_vectors(spark):
    """Randomized ISO8601 parsing check in ONE Spark job: 60 seeded
    datetimes across offsets/fractional-seconds/date-only forms,
    expected epochs computed independently with Python's datetime —
    whole-second truncation like the reference's iso8601->unix."""
    import random
    from datetime import datetime, timedelta, timezone

    from riemann_spark.sources.json_codec import iso8601_to_unix

    rng = random.Random(8)
    rows, exp = [], {}
    for i in range(60):
        epoch = rng.randint(0, 2_000_000_000)
        off_min = rng.choice([0, 0, 60, -420, 330, 765, -720])
        tz = timezone(timedelta(minutes=off_min))
        dt = datetime.fromtimestamp(epoch, tz)
        form = rng.choice(["sec", "ms", "date"])
        if form == "date":
            d = datetime.fromtimestamp(epoch, timezone.utc).date()
            s = d.isoformat()
            expected = datetime(
                d.year, d.month, d.day, tzinfo=timezone.utc
            ).timestamp()
        elif form == "ms":
            ms = rng.randint(0, 999)
            s = dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms:03d}" + (
                "Z" if off_min == 0 else dt.strftime("%z")[:3] + ":" + dt.strftime("%z")[3:]
            )
            expected = float(epoch)  # whole-second truncation
        else:
            s = dt.strftime("%Y-%m-%dT%H:%M:%S") + (
                "Z" if off_min == 0 else dt.strftime("%z")[:3] + ":" + dt.strftime("%z")[3:]
            )
            expected = float(epoch)
        rows.append((i, s))
        exp[i] = expected
    df = spark.createDataFrame(rows, "i int, s string")
    got = {
        r.i: r.t
        for r in df.select("i", iso8601_to_unix(F.col("s")).alias("t")).collect()
    }
    assert got == exp
