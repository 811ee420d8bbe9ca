"""Interval (range) join — map point events into keyed time windows,
at scale, without a cartesian product.

The reference evaluates "is this event inside an active maintenance /
burst window" by consulting live state at arrival time (the same
index-at-arrival posture as deps.clj:24-80); replayed over history
that membership test becomes an interval join, which Spark has no
native operator for.  A naive ``events JOIN windows ON key AND start
<= t AND t < end`` compiles to BroadcastNestedLoop (or worse,
CartesianProduct) — quadratic at 100 TB.  The standard scalable
formulation used here:

1. pick a bucket width ``B`` (µs); explode each window to the integer
   buckets it overlaps (``sequence(start div B, (end-1) div B)``) —
   a window of span S produces ~S/B + 1 rows, so total explode cost
   is Σ spans / B, tunable and linear;
2. tag each event with its single bucket ``t div B``;
3. shuffle equi-join on (keys…, bucket) — hash join, AQE-skew-safe —
   then apply the residual ``start <= t < end`` filter.

Every event lands in exactly one bucket, every window covers every
bucket it overlaps, so the equi-join sees every (event, window)
candidate exactly once: no duplicates to drop, no misses.  Choosing
``B`` near the median window span keeps the explode factor ~2 while
the join stays a plain hash shuffle that scales with partition count.

``merge_intervals`` is the companion gaps-and-islands pass that turns
raw (possibly overlapping) window seeds into disjoint per-key
intervals first — integer-µs arithmetic end to end, so results are
exact and partition-invariant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = "w_start_us",
    end_col: str = "w_end_us",
) -> DataFrame:
    """Merge overlapping/touching half-open intervals per key
    (gaps-and-islands): an interval starts a new island iff its start
    exceeds the running max end of everything before it.  One shuffle
    on the keys; the island window and the min/max aggregate share the
    same partitioning, so Catalyst plans a single Exchange."""
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new",
        (prev_max_end.isNull() | (F.col(start_col) > prev_max_end)).cast(
            "int"
        ),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
        )
        .drop("__island")
    )


def interval_join(
    events: DataFrame,
    windows: DataFrame,
    keys: Sequence[str],
    time_col: str = "time_us",
    start_col: str = "w_start_us",
    end_col: str = "w_end_us",
    bucket_us: int = 600_000_000,
) -> DataFrame:
    """Events × windows on ``key AND start <= t < end`` via the
    bucket-explode equi-join.  Returns event rows with the matched
    window's ``start_col``/``end_col`` appended (inner join: only
    events inside some window survive).  Windows may overlap each
    other — an event inside k windows emits k rows; run
    ``merge_intervals`` first when exactly-one semantics are wanted."""
    wb = windows.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {int(bucket_us)}"),
                F.expr(f"({end_col} - 1) div {int(bucket_us)}"),
            )
        ),
    )
    eb = events.withColumn(
        "__bucket", F.expr(f"{time_col} div {int(bucket_us)}")
    )
    joined = eb.join(wb, [*keys, "__bucket"]).filter(
        (F.col(start_col) <= F.col(time_col))
        & (F.col(time_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
