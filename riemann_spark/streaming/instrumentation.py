"""Self-instrumentation: the engine monitors itself with its own
event vocabulary.

Reference: instrumentation.clj:50-58 + core.clj:31-64 — every 10 s the
server injects events like ``riemann streams rate`` and latency
quantiles about its own pipeline.

Spark realization: a ``StreamingQueryListener`` turning each progress
report into riemann events (host = the application id, service =
"riemann streams <metric>"). Feed ``events()`` back through the
topology (or a kafka sink) for reference-parity self-monitoring; the
latency quantiles of the reference map to the durationMs breakdown.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from riemann_spark.schema import EVENT_SCHEMA


class InstrumentationListener(StreamingQueryListener):
    """Collects per-progress metrics as riemann-shaped event dicts."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._events: list[dict] = []

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        self._emit(str(event.id), "riemann streams started", 1.0)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._emit(str(p.id), "riemann streams rate", float(p.processedRowsPerSecond or 0.0))
        self._emit(str(p.id), "riemann streams rows", float(p.numInputRows or 0))
        for phase, ms in (p.durationMs or {}).items():
            self._emit(str(p.id), f"riemann streams latency {phase}", float(ms))

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._emit(str(event.id), "riemann streams stopped", 1.0)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- event surface ------------------------------------------------
    def _emit(self, qid: str, service: str, metric: float) -> None:
        with self._lock:
            self._events.append(
                {
                    "host": qid,
                    "service": service,
                    "state": "ok",
                    "description": None,
                    "metric": metric,
                    "tags": ["riemann"],
                    "time": time.time(),
                    "ttl": 20.0,
                    "attributes": None,
                }
            )

    def events(self, spark: SparkSession) -> DataFrame:
        """Snapshot the collected self-monitoring events as an event
        frame — route it anywhere the topology routes events."""
        with self._lock:
            rows = [tuple(e[f.name] for f in EVENT_SCHEMA.fields) for e in self._events]
        return spark.createDataFrame(rows, EVENT_SCHEMA)


def attach(spark: SparkSession) -> InstrumentationListener:
    listener = InstrumentationListener()
    spark.streams.addListener(listener)
    return listener
