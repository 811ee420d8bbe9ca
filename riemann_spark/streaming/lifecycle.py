"""Config lifecycle: hot reload by diffing topology definitions.

Reference §3.3: ``apply!`` (config.clj:349-355) → ``core/transition!``
(core.clj:131-161) diffs old/new services by ``equiv?``, stops
orphans, keeps equivalent ones running, starts new ones — SIGHUP hot
reload (bin.clj:39-77).

Spark analogue: a named streaming-query registry. A definition's
signature is its analyzed logical plan + sink options; ``apply`` stops
queries whose signature changed or vanished, starts new ones, and
leaves unchanged queries untouched (checkpoint continuity — the state
store carries across restarts of a changed-but-compatible query too,
which is how the reference's index survives reloads).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StreamDef:
    """One named streaming topology: build() returns the final
    (possibly stateful) streaming DataFrame; sink_opts configure the
    writer."""

    build: Callable[[], DataFrame]
    checkpoint: str
    format: str = "memory"
    output_mode: str = "append"
    options: tuple = ()

    def signature(self) -> str:
        df = self.build()
        # analyzed plan captures the full operator tree; sink config
        # participates so an output change also restarts
        plan = df._jdf.queryExecution().analyzed().toString()
        return f"{plan}|{self.format}|{self.output_mode}|{sorted(self.options)}"


class Core:
    """The running core: named queries + transition semantics."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._running: dict[str, tuple[str, object]] = {}

    def apply(self, defs: dict[str, StreamDef]) -> dict[str, str]:
        """Transition to a new config. Returns name → action taken
        (kept | started | restarted | stopped)."""
        actions: dict[str, str] = {}
        sigs = {name: d.signature() for name, d in defs.items()}

        for name, (old_sig, query) in list(self._running.items()):
            if name not in defs:
                query.stop()
                del self._running[name]
                actions[name] = "stopped"
            elif sigs[name] != old_sig:
                query.stop()
                del self._running[name]
                actions[name] = "restarted"

        for name, d in defs.items():
            if name in self._running:
                actions[name] = "kept"
                continue
            w = (
                d.build()
                .writeStream.format(d.format)
                .outputMode(d.output_mode)
                .option("checkpointLocation", d.checkpoint)
                .queryName(name)
            )
            for k, v in d.options:
                w = w.option(k, v)
            self._running[name] = (sigs[name], w.start())
            actions.setdefault(name, "started")
        return actions

    def query(self, name: str):
        return self._running[name][1]

    def stop_all(self) -> None:
        for _, (_sig, q) in self._running.items():
            q.stop()
        self._running.clear()
