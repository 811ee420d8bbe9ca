"""JSON event codec — the reference's second wire format
(common.clj:126-130 event-to-json; websocket ingest
transport/websockets.clj:94-133).

``from_json``/``to_json`` against EVENT_SCHEMA: JVM-side, streaming-
safe, schema-checked. Unknown JSON keys are folded into the open
``attributes`` map by ``events_from_json(keep_extra=True)`` —
reproducing the open-schema tail (common.clj:270-274).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riemann_spark.schema import EVENT_SCHEMA

_CORE = [f.name for f in EVENT_SCHEMA.fields if f.name != "attributes"]


def iso8601_to_unix(col: F.Column) -> F.Column:
    """ISO8601 string -> whole unix seconds (common.clj:76-84
    iso8601->unix): offset-carrying datetimes (with or without
    fractional seconds), 'Z', and bare dates (UTC midnight). Returns
    NULL for non-ISO input (try_to_timestamp, never a parse error)."""
    ts = F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        # bare date == UTC midnight, independent of session timezone
        F.try_to_timestamp(
            F.concat(col, F.lit("T00:00:00Z")),
            F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"),
        ),
        # variable-fraction / long-fraction offset forms the explicit
        # patterns miss ('…58.1Z', '…58.123456+02:00') — the reference's
        # :date-time-parser accepts these (common.clj:76-84); Spark's
        # default ISO8601 parser handles them (tried last so the
        # UTC-midnight bare-date branch keeps its timezone-independent
        # semantics). The offset's minutes group is optional: ISO8601
        # hour-only offsets ('+02') are valid and the reference's
        # parser accepts them. An OFFSET-LESS datetime is anchored to
        # UTC (the reference's clj-time default zone) by appending a
        # literal 'Z' BEFORE parsing — parsing in the session zone and
        # shifting back would pick the session offset at two different
        # wall clocks and drift by an hour inside DST transitions.
        F.when(
            col.rlike("([Zz]|[+-][0-9]{2}(:?[0-9]{2})?)$"),
            F.try_to_timestamp(col),
        ).otherwise(F.try_to_timestamp(F.concat(col, F.lit("Z")))),
    )
    return F.unix_timestamp(ts).cast("double")


def events_from_json(
    df: DataFrame, json_col: str = "value", keep_extra: bool = False
) -> DataFrame:
    parsed = df.select(
        F.from_json(F.col(json_col).cast("string"), EVENT_SCHEMA).alias("e"),
        F.col(json_col).cast("string").alias("__raw"),
    )
    out = parsed.select("e.*", "__raw")
    # the reference's JSON wire carries ISO8601 times (event-to-json
    # emits them, ensure-event-time parses them back — common.clj:
    # 126-137): the schema parse nulls a string time, so recover it
    # from the raw scalar; numeric times take the schema-parsed value
    out = out.withColumn(
        "time",
        F.coalesce(
            F.col("time"),
            iso8601_to_unix(F.get_json_object(F.col("__raw"), "$.time")),
        ),
    )
    if keep_extra:
        # open-schema tail: any key not in the core field set lands in
        # the attributes map
        all_map = F.from_json(F.col("__raw"), "map<string,string>")
        extra = F.map_filter(all_map, lambda k, _: ~k.isin(*_CORE, "attributes"))
        out = out.withColumn(
            "attributes",
            F.when(
                F.col("attributes").isNotNull(),
                F.map_concat(F.col("attributes"), extra),
            ).otherwise(extra),
        )
    return out.drop("__raw")


def events_to_json(df: DataFrame, iso_times: bool = False) -> DataFrame:
    """Event frame → one JSON string column (event-to-json).

    ``iso_times`` emits ``time`` as an ISO8601 UTC string — the
    reference's wire form (common.clj:126-130 unix-to-iso8601);
    default stays numeric (both forms round-trip through
    ``events_from_json``)."""
    cols = [c for c in df.columns if c in {f.name for f in EVENT_SCHEMA.fields}]
    out = df
    if iso_times and "time" in out.columns:
        # to_utc_timestamp shifts the instant so the session-tz wall
        # clock reads UTC; the offset must then be a literal 'Z' — the
        # XXX pattern would print the *session* offset, emitting a
        # wrong instant whenever spark.sql.session.timeZone != UTC
        out = out.withColumn(
            "time",
            F.date_format(
                F.to_utc_timestamp(
                    F.timestamp_seconds(F.col("time")),
                    F.current_timezone(),
                ),
                "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
            ),
        )
        cols = [c for c in cols]  # same core projection, string time
        return out.select(F.to_json(F.struct(*cols)).alias("value"))
    return out.select(F.to_json(F.struct(*cols)).alias("value"))
