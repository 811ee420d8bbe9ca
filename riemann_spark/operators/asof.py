"""As-of (point-in-time) join — enrich each event with the most
recent state of another stream at that event's time.

The reference does this implicitly: its streams read the live index
at arrival time (e.g. deps rules ask "was the DB critical when this
event arrived", deps.clj:24-80). Replayed over history at 100 TB,
"the index at arrival time" becomes a point-in-time join, which Spark
has no native operator for. The standard scalable formulation is used
here (no per-row subqueries, no range join explosion):

union both sides tagged → one window per key ordered by
(time, side, order) → ``last(payload, ignorenulls=True)`` carries the
latest right-side payload forward → keep left rows. One shuffle on
the key, linear scan per partition — the same cost as any keyed
window, independent of how far back the match lies.

Right rows at the exact left timestamp are visible (ASOF ``>=``
semantics, right-before-left tie order); duplicate right timestamps
are pre-deduped by max order-col so the match is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_enrich(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("host",),
    time_col: str = "time_us",
    payload_cols: Sequence[str] = ("metric",),
    order_col: str = "event_id",
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``<prefix><payload>`` columns from the latest right
    row with right.time <= left.time (null when no prior right row)."""
    payload = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col(time_col).alias("__t"),
    )
    # dedup right per (keys, time): deterministic winner by order_col
    r = (
        right.groupBy(*keys, time_col)
        .agg(F.max_by(payload, F.col(order_col)).alias("__p"))
        .select(*keys, time_col, "__p")
        .withColumn("__side", F.lit(0))
    )
    left_cols = left.columns
    l = left.select(*left_cols).withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    l = l.withColumn("__side", F.lit(1))
    # align schemas: right side carries nulls for left-only columns
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*left_cols, "__p", "__side").unionByName(
        r.select(*left_cols, "__p", "__side")
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col("__side"), F.col(order_col).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = enriched.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in payload_cols],
        F.col("__m")["__t"].alias(f"{prefix}{time_col}"),
    )
    return out
