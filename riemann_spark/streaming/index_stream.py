"""Streaming index: latest event per [host, service] with TTL expiry.

Reference behavior being reproduced (see operators/index.py for the
batch oracle):
- upsert latest per key (index.clj:98-101), tombstone on
  state="expired";
- reaper: when time+ttl passes, emit a synthetic
  {host service state="expired" time=now} event (index.clj:73-87,
  core.clj:275-309,300-307).

Realized as ``applyInPandasWithState`` over groupBy(host, service)
with EventTimeTimeout: per-key state is the current latest event; a
timer at (time + ttl) fires once the watermark passes it, emitting the
synthetic expired row and clearing state — the reaper loop without a
scheduler thread, checkpointed and partitioned across executors.

Scale: state is one row per live [host, service] key, hash-partitioned
by the shuffle — the direct analogue of the reference's
NonBlockingHashMap but distributed and fault-tolerant.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from riemann_spark.schema import DEFAULT_TTL
from riemann_spark.streaming.ops import with_event_timestamp

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("service", StringType()),
        StructField("state", StringType()),
        StructField("metric", DoubleType()),
        StructField("time", DoubleType()),
        StructField("ttl", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("state", StringType()),
        StructField("metric", DoubleType()),
        StructField("time", DoubleType()),
        StructField("ttl", DoubleType()),
        StructField("event_id", LongType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    keep_keys: tuple[str, ...] = (),
) -> Iterator[pd.DataFrame]:
    host, service = key

    if state.hasTimedOut:
        # reaper fire: synthetic expired event at the watermark clock.
        # keep_keys (core.clj:284-301, reaper :keep-keys) carries the
        # named fields of the indexed event onto the expired row —
        # default none beyond the key, exactly the reference's
        # [:host :service]; state/time are always overwritten.
        now = state.getCurrentWatermarkMs() / 1000.0
        prev = state.get if state.exists else None
        state.remove()
        metric = prev[1] if prev is not None and "metric" in keep_keys else None
        ttl = prev[3] if prev is not None and "ttl" in keep_keys else None
        yield pd.DataFrame(
            [[host, service, "expired", metric, now, ttl]],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )
        return

    best: tuple[Any, ...] | None = state.get if state.exists else None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (
                row.state,
                None if pd.isna(row.metric) else float(row.metric),
                float(row.time),
                None if pd.isna(row.ttl) else float(row.ttl),
                int(row.event_id),
            )
            # last-write-wins by (time, event_id) — the batch index's
            # documented deterministic ordering
            if best is None or (cand[2], cand[4]) > (best[2], best[4]):
                best = cand

    if best is None:
        return
    if best[0] == "expired":
        # tombstone deletes the key (index.clj:98-101)
        if state.exists:
            state.remove()
        return

    state.update(best)
    expiry_ms = int((best[2] + (best[3] if best[3] is not None else DEFAULT_TTL)) * 1000)
    # timers must be ahead of the watermark; clip a late-arriving
    # already-expired entry to fire at the next watermark advance
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(expiry_ms, wm + 1))
    yield pd.DataFrame(
        [[host, service, best[0], best[1], best[2], best[3]]],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def streaming_index(
    sdf: DataFrame,
    watermark: str = "0 seconds",
    keep_keys: str | tuple[str, ...] = (),
) -> DataFrame:
    """Wire the stateful index over a streaming event frame.

    Emits the key's new latest event on every update, plus synthetic
    ``state="expired"`` rows when TTLs lapse. ``keep_keys`` mirrors the
    reaper's ``:keep-keys`` option (core.clj:284-301): names of indexed
    fields to carry onto the expired row (``"all"`` = every field the
    index schema carries; default none beyond the key, the reference's
    ``[:host :service]``). Feed the output back to a source topic for
    the reference's reinject loop (SURVEY §2.7 — Spark DAGs are
    acyclic, so feedback is a Kafka round-trip)."""
    from riemann_spark.streaming.state_api import apply_with_state

    # a bare string ("metric") must become a one-element tuple —
    # tuple("metric") would silently explode it into characters
    if isinstance(keep_keys, str):
        kk: tuple[str, ...] = (
            ("metric", "ttl") if keep_keys == "all" else (keep_keys,)
        )
    else:
        kk = tuple(keep_keys)
    # only the fields the reaper actually carries onto the expired row
    # are valid — accepting any indexed field (e.g. 'time', 'state',
    # which the reaper always overwrites) would make those silent
    # no-ops, the exact misconfiguration class this check exists for
    valid = {"metric", "ttl"}
    unknown = [k for k in kk if k not in valid]
    if unknown:
        raise ValueError(
            f"streaming_index keep_keys: unknown/uncarryable field(s) "
            f"{unknown}; the reaper can carry {sorted(valid)} "
            f'(or "all")'
        )

    def update(key, pdfs, state):
        yield from _update(key, pdfs, state, keep_keys=kk)

    sdf = with_event_timestamp(sdf).withWatermark("event_ts", watermark)
    return apply_with_state(
        sdf, ("host", "service"), update, OUTPUT_SCHEMA, STATE_SCHEMA,
        timeout=GroupStateTimeout.EventTimeTimeout,
    )


def delete_tombstones(
    index_snapshot: DataFrame,
    commands: DataFrame,
    fields: tuple[str, ...] = ("host",),
    now: float = 0.0,
) -> DataFrame:
    """delete-from-index by field match for the STREAMING index
    (core.clj:256-273): cohort delete commands (e.g. "drop every key
    of this host") fan out against the current index snapshot into
    per-key ``state="expired"`` tombstones — exactly what the keyed
    state machine consumes as deletions (index.clj:98-101,
    _update:95-99). Feed the result back into the index stream's
    source (the documented Kafka reinject boundary, SURVEY §2.7).

    ``now`` must be >= the cohort's event times so the tombstone wins
    last-write-wins; event_id is pinned to a sentinel above any real
    id for the deterministic tie-break."""
    cmds = commands.select(*fields).dropDuplicates()
    cond = index_snapshot[fields[0]].eqNullSafe(cmds[fields[0]])
    for f_ in fields[1:]:
        cond = cond & index_snapshot[f_].eqNullSafe(cmds[f_])
    from pyspark.sql import functions as F

    keys = index_snapshot.join(F.broadcast(cmds), cond, "left_semi")
    return keys.select(
        "host",
        "service",
        F.lit("expired").alias("state"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("double").alias("metric"),
        F.lit(None).cast("array<string>").alias("tags"),
        F.lit(float(now)).alias("time"),
        F.lit(None).cast("double").alias("ttl"),
        F.lit(1 << 62).alias("event_id"),
    )
