"""Graphite plaintext protocol: ``path[;tag=value...] value timestamp``.

Reference: transport/graphite.clj — parser at :37-85 (whitespace split,
metric parse, optional ``;k=v`` tag extraction at :21-35), server at
:120-160. The reference builds ``->Event nil service nil nil metric nil
timestamp nil`` (graphite.clj:75-82): service = the metric path, host
nil unless a parser-fn extracts it.

Here the parser is a pure Column projection over a ``line`` column —
works on `spark.read.text`, socket streams, or Kafka values; fuses
into the scan, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_line(line: Column) -> list[Column]:
    parts = F.split(F.trim(line), r"\s+")
    path_full = parts[0]
    path = F.split(path_full, ";")[0]
    tag_parts = F.filter(
        F.split(path_full, ";"), lambda t, i: (i > 0) & (t != "")
    )
    return [
        path.alias("service"),
        parts[1].try_cast("double").alias("metric"),
        parts[2].try_cast("double").alias("time"),
        tag_parts.alias("tags"),
    ]


def graphite_lines_to_events(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse a frame of graphite lines into the event model (host nil,
    service = path — graphite.clj:75-82). Unparseable numbers become
    null metric/time (try_cast), mirroring the reference's catch-and-
    drop (graphite.clj:59-66); filter on metric IS NOT NULL to drop."""
    out = df.select(*parse_line(F.col(line_col)))
    return (
        out.withColumn("host", F.lit(None).cast("string"))
        .withColumn("state", F.lit(None).cast("string"))
        .withColumn("description", F.lit(None).cast("string"))
        .withColumn("ttl", F.lit(None).cast("double"))
        .select("host", "service", "state", "description", "metric", "tags", "time", "ttl")
    )


def graphite_lines_with_errors(
    df: DataFrame, line_col: str = "line"
) -> tuple[DataFrame, DataFrame]:
    """Parse with an exception stream (streams.clj:81-121 call-rescue):
    well-formed lines → events; malformed lines → a dead-letter frame
    carrying the raw line, instead of poisoning the pipeline. The
    reference catches per-event and routes to *exception-stream*; here
    the split is declarative and both sides stay distributed."""
    parsed = df.select(F.col(line_col).alias("__line"), *parse_line(F.col(line_col)))
    ok = parsed.filter(
        F.col("metric").isNotNull() & F.col("time").isNotNull()
    ).drop("__line")
    dead = parsed.filter(
        F.col("metric").isNull() | F.col("time").isNull()
    ).select(
        F.col("__line").alias("line"),
        F.lit("unparseable metric or timestamp").alias("error"),
    )
    return ok, dead


def events_to_graphite_lines(
    df: DataFrame,
    path: Column | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Encode events as graphite lines (the graphite SINK direction,
    reference graphite.clj:116). Metric formatted at fixed decimal
    precision so the round-trip is engine-portable."""
    p = path if path is not None else F.concat_ws(".", F.col("host"), F.col("service"))
    metric_s = F.col("metric").cast(f"decimal(20,{decimals})").cast("string")
    time_s = F.col("time").cast("long").cast("string")
    return df.select(
        F.concat_ws(" ", p, metric_s, time_s).alias("line")
    )
