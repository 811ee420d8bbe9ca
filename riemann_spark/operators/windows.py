"""Windows (SURVEY.md §2.4) — tumbling/sliding, time- and count-based.

Batch forms. Each ``*_window`` helper either adds a deterministic
window-id column (callers then ``groupBy`` it — one shuffle, partial
aggregation applies) or returns a ``pyspark.sql.Window`` spec for
per-row sliding aggregates.

Reference mapping:
- fixed-offset-time-window streams.clj:420-431 — epoch-aligned
  tumbling; identical to ``F.window`` / integer bucket math.
- fixed-time-window streams.clj:409-418 — tumbling anchored at the
  first event's time (per stream). Batch: anchor = min(time) over the
  grouping keys.
- moving-time-window streams.clj:322-353 — per-event look-back of n
  seconds (max-event-time horizon).
- moving-event-window streams.clj:292-303 — last-n-events sliding.
- fixed-event-window streams.clj:305-320 — n-event tumbling.

At scale: time buckets are pure integer math on the scan (no UDF); the
only shuffle is the groupBy on (keys, bucket), which AQE coalesces.
Count windows need a total order per key — they partition by key and
sort within partition (Spark sorts spill; no driver involvement).
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _warn_unkeyed(op: str) -> None:
    """Unkeyed ordered windows funnel EVERY row through one task — a
    silent scale-killer at cluster data volumes. Loud by design
    (callers in the catalog always pass keys)."""
    warnings.warn(
        f"{op} with keys=() runs a single-partition global sort; "
        "pass keys=(...) for any data that doesn't fit one executor",
        stacklevel=3,
    )


def time_bucket(n_seconds: float, time_col: str | Column = "time") -> Column:
    """Epoch-aligned tumbling bucket start (fixed-offset-time-window:
    ``t - t mod n``). Pure arithmetic — engine-agnostic, pushdown-safe."""
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    n = float(n_seconds)
    if n <= 0:
        raise ValueError(f"time_bucket interval must be positive, got {n_seconds}")
    if n.is_integer():
        # integer fast path: exact long arithmetic
        return F.floor(t / F.lit(n)) * F.lit(int(n))
    # fractional interval: multiply by the double literal (last-ulp risk
    # accepted; casting the literal to long would truncate, e.g. 0.5 -> 0)
    return F.floor(t / F.lit(n)) * F.lit(n)


def fixed_offset_time_window(
    df: DataFrame, n_seconds: float, time_col: str = "time", out: str = "window_start"
) -> DataFrame:
    """Tag each event with its epoch-aligned tumbling-window start."""
    return df.withColumn(out, time_bucket(n_seconds, time_col).cast("double"))


def fixed_time_window(
    df: DataFrame,
    n_seconds: float,
    keys: Sequence[str] = (),
    time_col: str = "time",
    out: str = "window_start",
) -> DataFrame:
    """Tumbling window anchored at the first event's time (per key
    group, or globally when keys=()): window i covers
    [anchor + i·n, anchor + (i+1)·n).

    Rejects n ≤ 0 exactly as the reference throws
    IllegalArgumentException (streams_test.clj:1666-1668)."""
    if float(n_seconds) <= 0:
        raise ValueError(f"fixed_time_window interval must be positive, got {n_seconds}")
    w = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy()
    anchor = F.min(time_col).over(w)
    t = F.col(time_col)
    n = F.lit(float(n_seconds))
    return df.withColumn(out, anchor + F.floor((t - anchor) / n) * n)


def moving_event_window(
    n: int, keys: Sequence[str] = (), time_col: str = "time", order_col: str = "event_id"
) -> WindowSpec:
    """Sliding count window: this row and the n-1 preceding, per key,
    ordered by (time, tiebreak)."""
    if not keys:
        _warn_unkeyed("moving_event_window")
    return (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )


def moving_time_window(
    n_seconds: float, keys: Sequence[str] = (), time_col: str = "time"
) -> WindowSpec:
    """Sliding event-time window: all events within the trailing
    n seconds of each event (range frame).

    PySpark's rangeBetween only takes integral bounds; fractional
    windows order by integer microseconds instead (time·1e6)."""
    if float(n_seconds).is_integer():
        order = F.col(time_col)
        lo = -int(n_seconds)
    else:
        order = (F.col(time_col) * 1_000_000).cast("long")
        lo = -int(round(n_seconds * 1_000_000))
    return (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(order)
        .rangeBetween(lo, 0)
    )


def fixed_event_window(
    df: DataFrame,
    n: int,
    keys: Sequence[str] = (),
    time_col: str = "time",
    order_col: str = "event_id",
    out: str = "window_id",
) -> DataFrame:
    """n-event tumbling window id: floor((row_number-1)/n) per key."""
    if not keys:
        _warn_unkeyed("fixed_event_window")
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col(order_col))
    )
    return df.withColumn(out, F.floor((F.row_number().over(w) - 1) / F.lit(n)))


def sessionize(
    df: DataFrame,
    gap: float,
    keys: Sequence[str] = ("host",),
    time_col: str = "time_us",
    order_col: str = "event_id",
) -> DataFrame:
    """Activity sessions per key: consecutive events closer than
    ``gap`` seconds belong to one session (gaps-and-islands).

    Beyond the reference's surface (its closest relative is
    ``stable``'s run segmentation) but table stakes for event
    analytics at scale. One shuffle on the key; the lag + running-sum
    pass and the session aggregate reuse the same partitioning, so
    Catalyst plans a single Exchange. For unbounded streams the same
    semantics come from ``F.session_window`` with a watermark; this
    formulation is the deterministic batch/backfill path (integer µs
    arithmetic, exact-decimal metric sums — oracle-safe).

    Output: one row per session with span, size, and metric sum.
    """
    from riemann_spark.operators.folds import dsum

    gap_us = int(round(gap * 1e6))
    kcols = [F.col(k) for k in keys]
    w = Window.partitionBy(*kcols).orderBy(F.col(time_col), F.col(order_col))
    prev_t = F.lag(time_col).over(w)
    new_sess = F.when(
        prev_t.isNull() | ((F.col(time_col) - prev_t) > gap_us), 1
    ).otherwise(0)
    with_id = df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    return (
        with_id.groupBy(*kcols, F.col("session_id"))
        .agg(
            F.min(time_col).alias("t_start"),
            F.max(time_col).alias("t_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("metric").alias("sum_metric"),
        )
    )
