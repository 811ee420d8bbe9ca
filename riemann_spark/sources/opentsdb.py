"""OpenTSDB telnet protocol: ``put <metric> <ts> <value> <tag=v> ...``.

Reference: transport/opentsdb.clj — parser :24-77 (drops the leading
``put``, reads name/timestamp/value, ``host=`` tag becomes the event
host, remaining tags ride along), server :120-145.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_to_opentsdb_lines(df: DataFrame) -> DataFrame:
    """Sink encode: ``put <service> <ts> <value> host=<host>`` — the
    telnet put line the server at transport/opentsdb.clj:120-145
    consumes. Metric stringified via DECIMAL(20,2) for deterministic
    cross-engine formatting (same trick as the graphite sink); time as
    whole epoch seconds (the telnet protocol's resolution)."""
    return df.select(
        F.concat_ws(
            " ",
            F.lit("put"),
            F.col("service"),
            F.floor(F.col("time")).cast("bigint").cast("string"),
            F.col("metric").cast("decimal(20,2)").cast("string"),
            F.concat(F.lit("host="), F.col("host")),
        ).alias("line")
    )


def opentsdb_lines_to_events(df: DataFrame, line_col: str = "line") -> DataFrame:
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    tag_str = F.array_join(F.slice(parts, 5, 1000), ",")
    attrs = F.str_to_map(tag_str, F.lit(","), F.lit("="))
    return df.filter(parts[0] == "put").select(
        F.element_at(attrs, "host").alias("host"),
        parts[1].alias("service"),
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("string").alias("description"),
        parts[3].try_cast("double").alias("metric"),
        F.map_keys(attrs).alias("tags"),
        parts[2].try_cast("double").alias("time"),
        F.lit(None).cast("double").alias("ttl"),
        attrs.alias("attributes"),
    )
