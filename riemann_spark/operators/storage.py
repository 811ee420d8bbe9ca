"""Event-time storage layout: partitioned writes + pruned reads.

The reference holds state in RAM and bounds it with TTLs
(/root/reference/src/riemann/index.clj); a 100 TB Spark deployment
instead lands events in object storage and must bound what a query
*reads*. Two mechanisms, both declarative so Catalyst applies them
with zero query-side code:

- **partition pruning**: write ``partitionBy(event_date)`` (hive
  layout); any filter on the partition column prunes directories
  before listing files — a day query over a year of data scans
  1/365th of it (shows as ``PartitionFilters`` in the scan node).
- **row-group skipping**: within each partition, sort by
  (host, service, time) so parquet min/max column stats make point
  lookups skip row groups (shows as ``PushedFilters``).

Granularity: day ≈ 275 GB/partition at 100 TB/yr — large enough to
avoid the many-small-files listing wall, small enough that single-day
queries stay cheap. Hour suits hot recent-data queries; both are just
a different truncation of the same epoch-seconds double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TRUNC = {"day": "dd", "hour": "HH"}


def with_event_date(df: DataFrame, granularity: str = "day", time_col: str = "time") -> DataFrame:
    """Derive the partition column from epoch-seconds ``time``."""
    ts = F.timestamp_seconds(F.col(time_col))
    if granularity == "day":
        part = F.to_date(ts)
    elif granularity == "hour":
        part = F.date_format(ts, "yyyy-MM-dd-HH")
    else:
        raise ValueError(f"granularity must be day|hour, got {granularity!r}")
    return df.withColumn("event_date", part)


def write_events_partitioned(
    df: DataFrame,
    path: str,
    granularity: str = "day",
    time_col: str = "time",
    sort_keys: tuple[str, ...] = ("host", "service", "time"),
) -> None:
    """Land events hive-partitioned by event time, sorted within
    partitions for parquet min/max stat skipping."""
    out = with_event_date(df, granularity, time_col)
    keys = [k for k in sort_keys if k in out.columns]
    if keys:
        out = out.sortWithinPartitions(*keys)
    out.write.mode("overwrite").partitionBy("event_date").parquet(path)


def read_events_range(
    spark: SparkSession,
    path: str,
    t_from: float,
    t_to: float,
    time_col: str = "time",
) -> DataFrame:
    """Time-range read over a partitioned event lake. The redundant
    ``event_date`` bounds are derived from the time bounds so Catalyst
    prunes partitions (the time filter alone lives in a data column
    and cannot prune directories)."""
    df = spark.read.parquet(path)
    d_from = F.to_date(F.timestamp_seconds(F.lit(t_from)))
    d_to = F.to_date(F.timestamp_seconds(F.lit(t_to)))
    return df.filter(
        (F.col("event_date") >= d_from)
        & (F.col("event_date") <= d_to)
        & (F.col(time_col) >= t_from)
        & (F.col(time_col) < t_to)
    )
