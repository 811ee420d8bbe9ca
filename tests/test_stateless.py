"""Stateless operator golden cases (streams_test.clj ports)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from riemann_spark.operators import stateless
from tests.conftest import events, metrics


def test_smap_inc(spark):
    # (test-stream (smap inc) [6 3 -1] [7 4 0]) — streams_test.clj:37-39
    df = events(spark, *({"metric": m, "time": float(i)} for i, m in enumerate([6.0, 3.0, -1.0])))
    out = stateless.adjust(df, "metric", lambda c: c + 1)
    assert metrics(out) == [7.0, 4.0, 0.0]


def test_where_else(spark):
    df = events(spark, {"metric": 1.0}, {"metric": 10.0}, {"metric": None})
    yes, no = stateless.where_else(df, "metric > 5")
    assert metrics(yes) == [10.0]
    assert metrics(no) == [1.0, None]  # null comparisons land in else


def test_over_under(spark):
    df = events(spark, {"metric": 1.0}, {"metric": 5.0}, {"metric": 9.0})
    assert metrics(stateless.over(df, 5)) == [9.0]
    assert metrics(stateless.under(df, 5)) == [1.0]


def test_match_variants(spark):
    df = events(
        spark,
        {"service": "api", "metric": 1.0},
        {"service": "apparat", "metric": 2.0},
        {"service": None, "metric": 3.0},
    )
    assert metrics(stateless.match(df, "service", "api")) == [1.0]
    assert metrics(stateless.match(df, "service", "re:^ap")) == [1.0, 2.0]
    assert metrics(stateless.match(df, "service", {"api", "apparat"})) == [1.0, 2.0]
    assert metrics(stateless.match(df, "service", None)) == [3.0]


def test_tagged(spark):
    df = events(
        spark,
        {"tags": ["a", "b"], "metric": 1.0},
        {"tags": ["b"], "metric": 2.0},
        {"tags": None, "metric": 3.0},
    )
    assert metrics(stateless.tagged_all(df, ["a", "b"])) == [1.0]
    assert metrics(stateless.tagged_any(df, ["a", "b"])) == [1.0, 2.0]


def test_with_default_adjust_scale(spark):
    df = events(spark, {"metric": 1024.0, "state": None, "ttl": None})
    out = stateless.with_fields(df, {"description": "d"})
    out = stateless.default(out, {"state": "ok", "ttl": 60.0})
    out = stateless.scale(out, 1.0 / 1024)
    row = out.collect()[0]
    assert row.description == "d"
    assert row.state == "ok" and row.ttl == 60.0
    assert row.metric == 1.0
    # with overwrites; default does not
    out2 = stateless.with_fields(out, {"state": "forced"})
    assert out2.collect()[0].state == "forced"
    out3 = stateless.default(out, {"state": "ignored"})
    assert out3.collect()[0].state == "ok"


def test_tag_untag(spark):
    df = events(spark, {"tags": ["a"]}, {"tags": None})
    tagged = stateless.tag(df, ["b", "a"])
    got = [r.tags for r in tagged.orderBy("event_id").collect()]
    # new tags first, distinct-preserving (streams_test.clj:233-250)
    assert got == [["b", "a"], ["b", "a"]]
    untagged = stateless.untag(tagged, "a")
    got = [r.tags for r in untagged.orderBy("event_id").collect()]
    assert got == [["b"], ["b"]]


def test_expired_filters(spark):
    df = events(
        spark,
        {"state": "expired", "time": 100.0, "metric": 1.0},
        {"state": "ok", "time": 100.0, "ttl": 10.0, "metric": 2.0},   # past ttl at 150
        {"state": "ok", "time": 145.0, "ttl": 10.0, "metric": 3.0},   # live at 150
        {"state": "ok", "time": 50.0, "metric": 4.0},                  # default ttl 60 → expired
    )
    assert metrics(stateless.expired(df, 150.0)) == [1.0, 2.0, 4.0]
    assert metrics(stateless.not_expired(df, 150.0)) == [3.0]


def test_split_streams_first_match_wins(spark):
    df = events(spark, {"metric": 200.0}, {"metric": 120.0}, {"metric": 5.0})
    hot, warm, rest = stateless.split_streams(df, ["metric > 150", "metric > 100"])
    assert metrics(hot) == [200.0]
    assert metrics(warm) == [120.0]  # matched 2nd pred only
    assert metrics(rest) == [5.0]


def test_dual_mirror_expire(spark):
    df = events(spark, {"metric": 1.0, "state": "ok"}, {"metric": 9.0, "state": "ok"})
    yes, no = stateless.dual(df, "metric > 5")
    assert metrics(yes) == [9.0]
    rows = no.collect()
    assert [r.metric for r in rows] == [1.0] and rows[0].state == "expired"


def test_smapcat_sflatten(spark):
    df = events(spark, {"metric": 2.0})
    out = stateless.smapcat(df, F.array(F.col("metric"), F.col("metric") * 10), alias="m")
    assert sorted(r.m for r in out.collect()) == [2.0, 20.0]


@pytest.mark.slow
def test_reference_test_stream_golden_cases(spark):
    """Canonical test-stream shapes ported verbatim from
    streams_test.clj (smap/where/over/under/default/adjust/scale)."""
    from tests.conftest import assert_stream
    from riemann_spark.operators import stateless

    # (test-stream (smap inc) [6 3 -1] [7 4 0]) — streams_test.clj:37-44
    assert_stream(
        spark,
        lambda df: stateless.smap(
            df, "event_id", (F.col("metric") + 1).alias("metric")
        ),
        [6, 3, -1],
        [7, 4, 0],
    )
    # where: metric > 5 passes
    assert_stream(
        spark, lambda df: stateless.where(df, "metric > 5"), [6, 3, 7], [6, 7]
    )
    # over / under (streams.clj:1661-1675)
    assert_stream(spark, lambda df: stateless.over(df, 5), [6, 3, 7], [6, 7])
    assert_stream(spark, lambda df: stateless.under(df, 5), [6, 3, 7], [3])
    # scale (streams.clj:1443-1461)
    assert_stream(
        spark, lambda df: stateless.scale(df, 2.0), [1, 2, 3], [2, 4, 6]
    )
    # default fills only missing fields (streams.clj:1395-1417)
    assert_stream(
        spark,
        lambda df: stateless.default(df, {"metric": 9.0}),
        [{"metric": None}, {"metric": 3.0}],
        [9, 3],
    )
    # adjust a present field (streams.clj:1419-1441)
    assert_stream(
        spark,
        lambda df: stateless.adjust(df, "metric", lambda c: c * 10),
        [1, 2],
        [10, 20],
    )
