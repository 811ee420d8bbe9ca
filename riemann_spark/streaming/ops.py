"""Streaming wrappers over the batch operator library.

All stateless operators (riemann_spark.operators.stateless) work on
streaming DataFrames unchanged — they are pure Column projections and
filters. This module adds the pieces that need event-time plumbing:
watermarked windowed aggregations and count-window state.

Late data policy: the reference silently drops events older than the
newest emitted window (streams.clj:387-389); ``withWatermark`` + append
mode reproduces exactly that, with the lateness bound made explicit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riemann_spark.operators.folds import _d


def with_event_timestamp(df: DataFrame, time_col: str = "time") -> DataFrame:
    """Attach a TimestampType event-time column (from unix-seconds
    ``time``) — Structured Streaming watermarks need a timestamp."""
    return df.withColumn("event_ts", F.timestamp_seconds(F.col(time_col)))


def streaming_rate(
    sdf: DataFrame,
    interval_seconds: float,
    keys: Sequence[str] = ("host", "service"),
    watermark: str = "10 seconds",
) -> DataFrame:
    """rate (streams.clj:841-883), streaming form: tumbling event-time
    window + exact-decimal sum / interval, late rows beyond the
    watermark dropped (the reference's "too old" branch)."""
    sdf = with_event_timestamp(sdf).withWatermark("event_ts", watermark)
    win = F.window("event_ts", f"{int(interval_seconds)} seconds")
    return (
        sdf.groupBy(*keys, win)
        .agg(
            (F.sum(_d("metric")).cast("double") / F.lit(float(interval_seconds))).alias(
                "rate"
            )
        )
        .select(
            *keys,
            F.col("window.start").cast("double").alias("window_start"),
            "rate",
        )
    )


def streaming_window_folds(
    sdf: DataFrame,
    interval_seconds: float,
    keys: Sequence[str] = ("service",),
    watermark: str = "10 seconds",
) -> DataFrame:
    """fixed-offset-time-window + fold family, streaming form."""
    sdf = with_event_timestamp(sdf).withWatermark("event_ts", watermark)
    win = F.window("event_ts", f"{int(interval_seconds)} seconds")
    return (
        sdf.groupBy(*keys, win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_d("metric")).cast("double").alias("sum_metric"),
            F.min("metric").alias("min_metric"),
            F.max("metric").alias("max_metric"),
        )
        .select(
            *keys,
            F.col("window.start").cast("double").alias("window_start"),
            "n_events",
            "sum_metric",
            "min_metric",
            "max_metric",
        )
    )


def streaming_dedup_exact(
    sdf: DataFrame,
    fingerprint_col: Column | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: one representative per content
    fingerprint passes (arbitrary within a micro-batch — structured
    streaming has no intra-batch order), replays in later batches drop — the ingest-time half of the
    dedup tier (functions/dedup.exact_duplicates is the backfill
    half). State = one row per distinct fingerprint, bounded by the
    watermark horizon: Spark evicts fingerprints older than the
    watermark, which is the deliberate semantics for an unbounded
    stream (an exact forever-dedup would grow state forever; dedupe
    beyond the horizon belongs to the batch pass over the landed
    lake)."""
    from riemann_spark.functions.text import fingerprint
    from riemann_spark.streaming.ops import with_event_timestamp

    fp = fingerprint_col if fingerprint_col is not None else fingerprint("description")
    return (
        with_event_timestamp(sdf)
        .withColumn("fingerprint", fp)
        .withWatermark("event_ts", watermark)
        .dropDuplicates(["fingerprint"])
    )


def streaming_sessions(
    sdf: DataFrame,
    gap_seconds: float,
    keys: Sequence[str] = ("host", "service"),
    watermark: str = "10 seconds",
) -> DataFrame:
    """Gap-based activity sessions, streaming form: the native
    ``F.session_window`` state machine (merge-on-overlap, close when
    the watermark passes last-event + gap) — the streaming twin of
    operators/windows.py sessionize, which is the batch oracle for
    the closed-session set. Append mode emits each session exactly
    once, when it can no longer grow."""
    sdf = with_event_timestamp(sdf).withWatermark("event_ts", watermark)
    # millisecond-resolution gap string: int(gap_seconds) would
    # truncate fractional gaps (0.5 -> "0 seconds", an invalid window)
    # and silently diverge from the batch sessionize oracle, which
    # compares inter-event deltas against the float gap
    gap_ms = round(gap_seconds * 1000)
    if gap_ms <= 0 or abs(gap_ms - gap_seconds * 1000) > 1e-6:
        raise ValueError(
            f"gap_seconds {gap_seconds!r} must be a positive multiple of 1ms"
        )
    win = F.session_window("event_ts", f"{gap_ms} milliseconds")
    return (
        sdf.groupBy(*keys, win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_d("metric")).cast("double").alias("sum_metric"),
        )
        .select(
            *keys,
            F.col("session_window.start").cast("double").alias("session_start"),
            F.col("session_window.end").cast("double").alias("session_end"),
            "n_events",
            "sum_metric",
        )
    )
