"""The index: latest event per [host, service] with TTL expiry.

Reference: ``src/riemann/index.clj`` — a NonBlockingHashMap keyed by
``[host service]`` (:20, :58-126); inserting a ``state="expired"``
event deletes the key (:98-101); ``expire`` sweeps events whose
``time + ttl`` has passed and returns them as synthetic expired events
(:73-87, reaper ``core.clj:275-309``); ``search`` filters by query
predicate with a point-lookup fast path (:44-56, :89-95).

Spark realization (batch): a ``Window.partitionBy(host, service)`` +
``row_number`` latest-per-key — one shuffle on the key, map-side
combinable, skew-tolerant under AQE. The reference's O(1) fast path is
subsumed by Catalyst predicate pushdown; at 100 TB the index table
would be written bucketed/partitioned by host so the same point query
prunes to one file group. Streaming form:
riemann_spark.streaming.index_stream (stateful latest-per-key with
event-time TTL timers).

Deviation note (documented per SURVEY §2.9): the reference's insert is
unconditional last-write-wins in *arrival* order; batch mode has no
arrival order, so we take max-by ``(time, event_id)`` — the event-time
winner with a deterministic tie-break. A second deviation: inserting a
time-less event THROWS in the reference (index_test.clj
missing-time-throws); here the ingest boundary assigns the clock
instead (``stateless.ensure_event_times``, the post-load-event seam),
so the index never sees one — a null time that does reach batch
``build_index`` simply never wins (desc ordering puts nulls last).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from riemann_spark.query import compile_query
from riemann_spark.schema import DEFAULT_TTL

KEY = ("host", "service")


def build_index(
    events: DataFrame,
    now: float | None = None,
    keep_expired: bool = False,
    order_col: str = "event_id",
) -> DataFrame:
    """Materialize the latest event per [host, service].

    ``state="expired"`` winners act as tombstones and are dropped
    (index.clj:98-101) unless ``keep_expired``. If ``now`` is given,
    events past ``time + ttl`` are swept out (index.clj:73-87).
    """
    # window row_number, not groupBy+max_by(struct(*)): measured on 3M
    # rows / 225K keys, the struct repack makes max_by slower (0.99s vs
    # 0.88s min-of-3) despite avoiding the per-key sort
    order = [F.col("time").desc()]
    if order_col in events.columns:
        order.append(F.col(order_col).desc())
    w = Window.partitionBy(*KEY).orderBy(*order)
    out = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if not keep_expired:
        out = out.filter(F.coalesce(F.col("state") != "expired", F.lit(True)))
    if now is not None:
        out = out.filter(
            F.col("time") + F.coalesce(F.col("ttl"), F.lit(DEFAULT_TTL)) > F.lit(now)
        )
    return out


def search(index_df: DataFrame, query: str | Column) -> DataFrame:
    """Filter the index by a riemann query string (or Column).

    Reference lifecycle SURVEY §3.2: string → AST → predicate →
    filter. Catalyst pushes the predicate into the scan.
    """
    pred = compile_query(query) if isinstance(query, str) else query
    return index_df.filter(pred)


def expire(
    index_df: DataFrame, now: float
) -> tuple[DataFrame, DataFrame]:
    """Split the index into (live, expired-events).

    The expired side mimics the reaper's synthetic events
    (core.clj:300-307): ``{host service state="expired" time=now}``.
    """
    deadline = F.col("time") + F.coalesce(F.col("ttl"), F.lit(DEFAULT_TTL))
    live = index_df.filter(deadline > F.lit(now))
    expired = (
        index_df.filter(deadline <= F.lit(now))
        .select(
            "host",
            "service",
            F.lit("expired").alias("state"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("double").alias("metric"),
            F.lit(None).cast("array<string>").alias("tags"),
            F.lit(now).alias("time"),
            F.lit(None).cast("double").alias("ttl"),
        )
    )
    return live, expired


def delete_from_index(
    index_df: DataFrame,
    event,
    fields: tuple[str, ...] = KEY,
) -> DataFrame:
    """Delete index entries matching the event's values on ``fields``
    (core.clj:256-273 delete-from-index: default [host service]; a
    field list deletes every entry agreeing on all those fields).

    ``event`` is either one event dict (single-cohort delete) or a
    DataFrame of delete commands — the distributed form: the command
    cohort is deduplicated to its match-fields and anti-joined
    broadcast against the index, so a stream of deletions costs one
    broadcast, never a shuffle of the index."""
    if isinstance(event, dict):
        cond = F.lit(True)
        for f_ in fields:
            cond = cond & F.col(f_).eqNullSafe(F.lit(event.get(f_)))
        return index_df.filter(~cond)
    cmds = event.select(*fields).dropDuplicates()
    on = [index_df[f_].eqNullSafe(cmds[f_]) for f_ in fields]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    return index_df.join(F.broadcast(cmds), cond, "left_anti")
