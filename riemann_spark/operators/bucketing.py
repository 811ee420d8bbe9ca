"""Bucketed (pre-shuffled) tables: co-located joins and aggregations.

Riemann never needs this — one process holds all state. At 100 TB the
recurring cost is re-shuffling the same big table on the same key for
every join/agg. Bucketing pays the shuffle ONCE at write time:
``bucketBy(n, keys)`` hash-partitions files on disk, and every later
join or groupBy on those keys reads the table already partitioned —
Catalyst drops the Exchange entirely (both sides of a join, when they
share bucket keys and count).

The natural fit here is the event INDEX and any per-[host, service]
rollup: materialize them bucketed by (host, service), and the
dashboards / deps rules / enrichment joins that hit them stop paying
per-query shuffles.

Mechanics (all standard Spark, no Hive metastore needed — native
datasource tables in the session warehouse):

- bucket counts must MATCH across co-joined tables (or be multiples
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
- ``sortBy`` the same keys so sort-merge joins also skip the Sort,
- readers must keep ``spark.sql.sources.bucketing.enabled`` (default
  true) — asserted by tests/test_plans.py-style guards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed+sorted parquet table.

    The one-time shuffle this write performs is the last one: any
    join/groupBy on ``keys`` against this table is exchange-free."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (scan advertises the bucket partitioning)."""
    return spark.table(table)
