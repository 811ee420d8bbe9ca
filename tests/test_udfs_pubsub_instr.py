"""UDF escape hatches, pubsub, instrumentation, exception streams,
difference/quotient folds."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from riemann_spark.functions.udfs import by_builder_pandas, smap_pandas, sreduce_pandas
from riemann_spark.operators import folds
from riemann_spark.sources.graphite import graphite_lines_with_errors
from riemann_spark.streaming.pubsub import PubSub
from tests.conftest import events, metrics


def test_smap_pandas_drops_and_maps(spark):
    df = events(spark, {"metric": 6.0}, {"metric": 3.0}, {"metric": -1.0})

    def inc_positive(pdf):
        out = pdf[pdf.metric > 0].copy()
        out["metric"] = out["metric"] + 1
        return out[["event_id", "metric"]]

    out = smap_pandas(df, inc_positive, "event_id long, metric double")
    assert metrics(out) == [7.0, 4.0]


def test_sreduce_running_fold(spark):
    # (test-stream (sreduce + 1) [1 2 3] [2 4 7]) — streams_test.clj:137-142
    df = events(spark, *({"metric": float(m), "time": float(i)} for i, m in enumerate([1, 2, 3])))
    out = sreduce_pandas(df, lambda acc, v: acc + v, init=1.0)
    assert metrics(out, "acc") == [2.0, 4.0, 7.0]


def test_by_builder(spark):
    df = events(
        spark,
        {"host": "a", "metric": 1.0},
        {"host": "a", "metric": 2.0},
        {"host": "b", "metric": 5.0},
    )

    def build(key, pdf):
        # child topology parameterized by the key value
        factor = 10.0 if key[0] == "a" else 1.0
        return pdf.assign(scaled=pdf.metric * factor)[["host", "event_id", "scaled"]]

    out = by_builder_pandas(df, build, ["host"], "host string, event_id long, scaled double")
    assert metrics(out, "scaled") == [10.0, 20.0, 5.0]


def test_pubsub_subscribe(spark):
    ps = PubSub()
    ev = events(spark, {"state": "ok", "metric": 1.0}, {"state": "critical", "metric": 2.0})
    ps.publish("index", ev)
    sub = ps.subscribe("index", 'state = "critical"')
    assert metrics(sub) == [2.0]
    assert ps.subscribe("index").count() == 2


def test_instrumentation_listener(spark, tmp_path):
    from riemann_spark.streaming import instrumentation

    listener = instrumentation.attach(spark)
    try:
        name = f"instr_{uuid.uuid4().hex[:6]}"
        df = spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        q = (
            df.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        ev = listener.events(spark)
        services = {r.service for r in ev.collect()}
        assert "riemann streams started" in services
    finally:
        spark.streams.removeListener(listener)


def test_exception_stream_split(spark):
    df = spark.createDataFrame(
        [("a.b 1.5 100",), ("broken line here",), ("c.d 2 xnotatime",)], "line string"
    )
    ok, dead = graphite_lines_with_errors(df)
    assert [r.service for r in ok.collect()] == ["a.b"]
    got = dead.collect()
    assert len(got) == 2 and all(r.error for r in got)


def test_difference_quotient_folds(spark):
    df = events(spark, *({"metric": float(m), "time": float(i)} for i, m in enumerate([10, 2, 3])))
    row = df.agg(
        folds.fdifference().alias("d"), folds.fquotient().alias("q")
    ).collect()[0]
    assert row.d == 10.0 - (2.0 + 3.0)
    assert row.q == pytest.approx(10.0 / 6.0)
    # quotient guards non-positive metrics → null
    df2 = events(spark, {"metric": 4.0, "time": 0.0}, {"metric": 0.0, "time": 1.0})
    assert df2.agg(folds.fquotient().alias("q")).collect()[0].q is None
