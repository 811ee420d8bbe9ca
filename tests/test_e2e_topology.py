"""Config-level end-to-end drive — the analogue of the reference's
``inject!`` + tap tests (src/riemann/test.clj:131-153): one streaming
source feeds a full topology (filter → transform → keyed rate AND the
live index) whose micro-batches fan out to collected taps and a live
WebSocket subscriber, across multiple batches with checkpointed state.
"""

from __future__ import annotations

import json
import os
import uuid
from urllib.parse import quote

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators import stateless
from riemann_spark.sources.websockets import WsClient, WsEventServer
from riemann_spark.streaming.index_stream import streaming_index
from riemann_spark.streaming.ops import streaming_rate
from riemann_spark.streaming.sinks import fan_out, make_sink
from tests.test_streaming import FULL_SCHEMA, _mk


@pytest.fixture()
def tmpdirs(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    yield src, str(tmp_path / "ck1"), str(tmp_path / "ck2")


@pytest.mark.slow
def test_full_topology_with_taps_and_ws_push(spark, tmpdirs):
    src, ck1, ck2 = tmpdirs
    batches = [
        [
            _mk(0, "a", "api", metric=10.0, t=0.0),
            _mk(1, "a", "api", metric=-5.0, t=1.0),   # filtered out
            _mk(2, "b", "api", metric=20.0, t=2.0),
        ],
        [
            _mk(3, "a", "api", metric=30.0, t=70.0),  # updates index
            _mk(4, "c", "api", metric=40.0, t=71.0),
        ],
    ]

    first = spark.createDataFrame(batches[0], FULL_SCHEMA)
    first.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    sdf = (
        spark.readStream.schema(first.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    # topology: where(metric >= 0) -> tag("prod") -> {tap, rate, index}
    piped = stateless.tag(stateless.where(sdf, "metric >= 0"), "prod")

    rate_rows: list = []
    piped_rows: list = []
    rate_q = (
        streaming_rate(piped, 60.0, keys=("service",), watermark="0 seconds")
        .writeStream.foreachBatch(fan_out([make_sink("collect", store=rate_rows)]))
        .outputMode("append")
        .option("checkpointLocation", ck1)
        .start()
    )
    tap_q = (
        piped.writeStream.foreachBatch(
            fan_out([make_sink("collect", store=piped_rows)])
        )
        .outputMode("append")
        .start()
    )

    with WsEventServer() as ws:
        client = WsClient(ws.port, "/pubsub/index?query=" + quote("metric > 15"))
        ws.wait_subscribers("index")

        def push_index(df, bid):
            ws.publish("index", [r.asDict(recursive=True) for r in df.collect()])

        idx_q = (
            streaming_index(piped)
            .writeStream.foreachBatch(push_index)
            .outputMode("append")
            .option("checkpointLocation", ck2)
            .start()
        )
        try:
            rate_q.processAllAvailable()
            idx_q.processAllAvailable()
            tap_q.processAllAvailable()
            for i, rows in enumerate(batches[1:], start=1):
                spark.createDataFrame(rows, FULL_SCHEMA).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{src}/b{i}")
                rate_q.processAllAvailable()
                idx_q.processAllAvailable()
                tap_q.processAllAvailable()
        finally:
            rate_q.stop()
            idx_q.stop()
            tap_q.stop()

        # ws tap: only index rows with metric > 15, as they streamed
        pushed = [json.loads(client.recv_text()) for _ in range(3)]
        client.close()
    hosts = sorted(p["host"] for p in pushed)
    assert hosts == ["b", "c"] or hosts == ["a", "b", "c"]
    assert all(p["metric"] > 15 for p in pushed)

    # mid-topology tap: the where() dropped event 1, the tag() ran
    assert sorted(r["event_id"] for r in piped_rows) == [0, 2, 3, 4]
    assert all("prod" in r["tags"] for r in piped_rows)

    # rate tap: window [0,60) closed by batch 2's watermark advance;
    # filtered event 1 excluded: (10+20)/60
    w0 = [r for r in rate_rows if r["window_start"] == 0.0]
    assert len(w0) == 1 and w0[0]["rate"] == pytest.approx(30.0 / 60.0)
