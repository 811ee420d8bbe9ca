"""Bucketed co-located joins: the write-once-shuffle-never-again path.

At 100 TB the index and per-key rollups are joined on [host, service]
by every dashboard query — bucketing them eliminates those per-query
exchanges. These tests assert the plans actually go exchange-free."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators.bucketing import read_bucketed, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    ev = spark.range(1000).selectExpr(
        "cast(id % 50 as string) AS host", "cast(id AS double) AS metric"
    )
    ix = spark.range(200).selectExpr(
        "cast(id % 50 as string) AS host", "cast(id % 3 AS string) AS zone"
    )
    write_bucketed(ev, "t_events_bucketed", ["host"], 8)
    write_bucketed(ix, "t_index_bucketed", ["host"], 8)
    yield "t_events_bucketed", "t_index_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_events_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_index_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ev_t, ix_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, ev_t).join(read_bucketed(spark, ix_t), "host")
        p = _plan(j)
        assert "Exchange" not in p
        assert j.count() == 1000 * 200 // 50  # 20 ev x 4 ix per host
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    ev_t, _ = bucketed_tables
    g = read_bucketed(spark, ev_t).groupBy("host").agg(F.sum("metric").alias("s"))
    p = _plan(g)
    assert "Exchange" not in p
    assert g.count() == 50


def test_unbucketed_join_pays_the_exchange(spark, bucketed_tables):
    """Control: the same join over plain frames shuffles both sides."""
    ev_t, _ = bucketed_tables
    plain = spark.range(200).selectExpr(
        "cast(id % 50 as string) AS host", "cast(id % 3 AS string) AS zone"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(read_bucketed(spark, ev_t).join(plain, "host"))
        assert "Exchange" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
