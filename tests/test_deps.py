"""deps rule algebra — ports the shapes in
/root/reference/test/riemann/deps_test.clj (hash-match, localhost-match,
depends-match, all-match, any-match, real-match)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from riemann_spark.operators import deps
from tests.conftest import events

pytestmark = pytest.mark.slow  # thorough lane; fast loop: -m 'not slow'


def tag(spark, index_rows, event_rows, rule):
    idx = events(spark, *index_rows) if index_rows else events(
        spark, {"service": "zzz", "time": 0.0}
    ).filter(F.lit(False))
    evs = events(spark, *event_rows)
    out = deps.deps_tag(evs, idx, rule)
    return [r.deps_satisfied for r in out.orderBy("event_id").collect()]


def test_hash_match(spark):
    # no states
    assert tag(spark, [], [{"service": "q", "time": 0.0}], {"service": "foo"}) == [False]
    # single state
    assert tag(
        spark, [{"state": "ok", "time": 0.0}], [{"time": 1.0}], {"state": "ok"}
    ) == [True]
    # wrong state
    assert tag(
        spark, [{"state": "critical", "time": 0.0}], [{"time": 1.0}], {"state": "ok"}
    ) == [False]


def test_localhost_match(spark):
    r = deps.localhost({"service": "memcache", "state": "ok"})
    idx = [{"host": "1", "service": "memcache", "state": "ok", "time": 0.0}]
    assert tag(spark, idx, [{"host": "1", "time": 1.0}], r) == [True]
    assert tag(spark, idx, [{"host": "2", "time": 1.0}], r) == [False]
    bad = [{"host": "1", "service": "memcache", "state": "false", "time": 0.0}]
    assert tag(spark, bad, [{"host": "1", "time": 1.0}], r) == [False]


def test_depends_match(spark):
    # different service is always true (vacuous)
    r = deps.depends({"service": "x"}, {"service": "y"})
    assert tag(spark, [], [{"service": "z", "time": 1.0}], r) == [True]
    # single dep
    r = deps.depends({"service": "x"}, {"service": "y", "state": "ok"})
    ok = [{"service": "y", "state": "ok", "time": 0.0}]
    assert tag(spark, ok, [{"service": "x", "time": 1.0}], r) == [True]
    no = [{"service": "y", "state": "no", "time": 0.0}]
    assert tag(spark, no, [{"service": "x", "time": 1.0}], r) == [False]
    assert tag(spark, [], [{"service": "x", "time": 1.0}], r) == [False]


def test_all_match(spark):
    r = deps.all({"service": "x"}, {"service": "y"})
    both = [{"service": "x", "time": 0.0}, {"service": "y", "time": 0.0}]
    assert tag(spark, both, [{"time": 1.0}], r) == [True]
    assert tag(spark, [], [{"time": 1.0}], r) == [False]
    assert tag(spark, both[:1], [{"time": 1.0}], r) == [False]


def test_any_match(spark):
    r = deps.any_({"service": "x"}, {"service": "y"})
    both = [{"service": "x", "time": 0.0}, {"service": "y", "time": 0.0}]
    assert tag(spark, both, [{"time": 1.0}], r) == [True]
    assert tag(spark, [], [{"time": 1.0}], r) == [False]
    assert tag(spark, both[:1], [{"time": 1.0}], r) == [True]


def test_real_match_nested(spark):
    # deps_test.clj real-match: all(depends(lbapp, any(riak1, riak2)),
    #                              depends(api, localhost(any(memcached,
    #                              redis), any(cpu ok))))
    r = deps.all(
        deps.depends(
            {"service": "lbapp"},
            deps.any_(
                {"service": "riak 1", "state": "ok"},
                {"service": "riak 2", "state": "ok"},
            ),
        ),
        deps.depends(
            {"service": "api"},
            deps.localhost(
                deps.any_(
                    {"service": "memcached", "state": "ok"},
                    {"service": "redis", "state": "ok"},
                ),
                deps.any_({"service": "cpu", "state": "ok"}),
            ),
        ),
    )
    idx = [
        {"host": "a", "service": "riak 1", "state": "ok", "time": 0.0},
        {"host": "a", "service": "redis", "state": "ok", "time": 0.0},
        {"host": "a", "service": "cpu", "state": "ok", "time": 0.0},
        {"host": "b", "service": "redis", "state": "ok", "time": 0.0},
    ]
    # lbapp: riak 1 is ok somewhere → satisfied
    assert tag(spark, idx, [{"service": "lbapp", "host": "b", "time": 1.0}], r) == [True]
    # api on host a: redis+cpu ok on a → satisfied
    assert tag(spark, idx, [{"service": "api", "host": "a", "time": 1.0}], r) == [True]
    # api on host b: redis ok on b but no cpu ok on b → not satisfied
    assert tag(spark, idx, [{"service": "api", "host": "b", "time": 1.0}], r) == [False]
    # unrelated service: vacuously satisfied
    assert tag(spark, idx, [{"service": "web", "host": "b", "time": 1.0}], r) == [True]


def test_empty_map_matches_nonempty_index(spark):
    assert tag(spark, [{"time": 0.0}], [{"time": 1.0}], {}) == [True]
    assert tag(spark, [], [{"time": 1.0}], {}) == [False]
