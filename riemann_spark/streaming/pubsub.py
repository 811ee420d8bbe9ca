"""Pub/sub: channels as named, predicate-filtered streaming queries.

Reference: pubsub.clj:35-109 — channels hold subscriber callbacks;
index inserts publish to the "index" channel (core.clj:219-225);
websocket/SSE subscribers attach query-language predicates to a
channel (transport/websockets.clj:36-64, sse.clj:141-170).

Spark realization (SURVEY §2.7): a channel is a streaming DataFrame;
a subscription is a query-language predicate filtered view of it wired
to a sink. Each subscription is independently start/stoppable — the
reference's subscribe/unsubscribe lifecycle maps to streaming query
start/stop, and ws/SSE egress is one sink implementation away (the
`http` sink in sinks.py is the shape).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

from riemann_spark.query import compile_query
from riemann_spark.streaming.sinks import SinkFn, fan_out


@dataclass
class PubSub:
    channels: dict[str, DataFrame] = field(default_factory=dict)
    _queries: list = field(default_factory=list)  # (query, persistent)

    def publish(self, channel: str, df: DataFrame) -> None:
        """Register a (streaming or batch) frame as a channel. The
        index's output stream conventionally publishes as "index"."""
        self.channels[channel] = df

    def subscribe(
        self,
        channel: str,
        query: str | Column | None = None,
    ) -> DataFrame:
        """A subscription: the channel filtered by a riemann query
        string — exactly the ws `subscribe index "state = \\"ok\\""`
        surface."""
        df = self.channels[channel]
        if query is not None:
            pred = compile_query(query) if isinstance(query, str) else query
            df = df.filter(pred)
        return df

    def start(
        self,
        channel: str,
        query: str | None,
        sinks: list[SinkFn],
        checkpoint: str,
        name: str | None = None,
        persistent: bool = False,
    ):
        """Wire a subscription to sinks and start it. ``persistent``
        marks it as surviving ``sweep()`` (pubsub.clj:60-76
        subscribe!'s persistent flag): transport-bound subscriptions
        (a ws connection) are temporary; config-declared ones are
        persistent."""
        df = self.subscribe(channel, query)
        q = (
            df.writeStream.foreachBatch(fan_out(sinks))
            .option("checkpointLocation", checkpoint)
            .queryName(name or f"{channel}-sub")
            .start()
        )
        self._queries.append((q, persistent))
        return q

    def sweep(self) -> None:
        """Stop every non-persistent subscription (pubsub.clj:96-103
        sweep! — the connection-churn reset: transport restarts drop
        their subscribers, config-declared ones keep flowing)."""
        keep = []
        for q, persistent in self._queries:
            if persistent:
                keep.append((q, persistent))
            else:
                q.stop()
        self._queries = keep

    def stop_all(self) -> None:
        for q, _persistent in self._queries:
            q.stop()
        self._queries.clear()
