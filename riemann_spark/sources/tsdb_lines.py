"""InfluxDB line protocol + Prometheus exposition text: the two
cheapest-win vendor sink formats over the existing http sink.

Reference shapes: influxdb.clj — event->point-9 at :134-150 maps
service → measurement, ``tag-fields`` (default #{:host}) → tags,
metric → the ``value`` field, time converted to the target precision
(:100-124); prometheus.clj — generate-datapoint-with-labels at :43-47
emits ``name{labels} value\\n`` pushed to a pushgateway
(:118-145), with name/label sanitization replace-disallowed at :12-15
(non ``[a-zA-Z0-9_]`` → ``_``, runs collapsed).

Both directions are pure Column projections (JVM-side, codegen-fused):
encoders for the sink path, parsers for the ingest path — same design
as graphite.py. The escaping below follows the public InfluxDB line
protocol spec (commas/equals/spaces backslash-escaped in identifiers,
string fields double-quoted) and the Prometheus exposition format
(label values double-quoted; the reference emits them UNQUOTED, a
pushgateway-era laxity — quoting is the spec-valid superset and is the
default here, switchable for bug-for-bug parity).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ influx --

def _esc_ident(c: Column) -> Column:
    """Escape measurement/tag-key/tag-value/field-key characters."""
    return F.regexp_replace(c, r"([,= ])", r"\\$1")


def _unesc_ident(c: Column) -> Column:
    return F.regexp_replace(c, r"\\([,= ])", r"$1")


def events_to_influx_lines(
    df: DataFrame,
    tag_fields: Sequence[str] = ("host",),
    precision: str = "seconds",
    decimals: int = 6,
) -> DataFrame:
    """Encode events as InfluxDB line-protocol rows (influxdb.clj
    event->point-9 mapping): ``service,host=h value=1.5 1234567890``.

    Tags are sorted by key (the line-protocol canonical form), null or
    empty tag values dropped (nil-or-empty-str, influxdb.clj:29-30).
    Rows missing service, metric, or time are dropped — the
    reference's nil-metric guard (influxdb.clj event->point-9 returns
    nil without a metric and the sink filters nils) — so no NULL line
    ever reaches a sink's join/write. Metric is formatted at fixed
    decimal precision so the round trip is engine-portable; time
    converted per ``precision`` like convert-time (influxdb.clj:113-124).
    """
    mult = {"seconds": 1, "milliseconds": 1000, "microseconds": 1_000_000}[precision]
    df = df.filter(
        F.col("service").isNotNull()
        & F.col("metric").isNotNull()
        & F.col("time").isNotNull()
    )
    tag_cols = [
        F.when(
            F.col(t).isNotNull() & (F.col(t).cast("string") != ""),
            F.concat(F.lit("," + t + "="), _esc_ident(F.col(t).cast("string"))),
        ).otherwise(F.lit(""))
        for t in sorted(tag_fields)
    ]
    metric_s = F.col("metric").cast(f"decimal(24,{decimals})").cast("string")
    time_s = (F.col("time") * mult).cast("long").cast("string")
    return df.select(
        F.concat(
            _esc_ident(F.col("service")),
            *tag_cols,
            F.lit(" value="),
            metric_s,
            F.lit(" "),
            time_s,
        ).alias("line")
    )


def influx_lines_to_events(
    df: DataFrame, line_col: str = "line", precision: str = "seconds"
) -> DataFrame:
    """Parse line-protocol rows back into the event model: measurement
    → service, ``host`` tag → host, ``value`` field → metric, trailing
    timestamp → time (seconds as double). Pure Column regex — splits on
    UNESCAPED delimiters via negative lookbehind, then unescapes.
    Malformed numbers become null (try_cast), filterable like the
    graphite dead-letter path."""
    mult = {"seconds": 1, "milliseconds": 1000, "microseconds": 1_000_000}[precision]
    line = F.trim(F.col(line_col))
    sections = F.split(line, r"(?<!\\) ")
    ident = sections[0]  # measurement,tag=v,...
    fields = sections[1]
    ts = sections[2]
    ident_parts = F.split(ident, r"(?<!\\),")
    service = _unesc_ident(ident_parts[0])
    tag_kvs = F.filter(ident_parts, lambda t, i: i > 0)
    # F.get (not element_at): null on missing tag/field instead of the
    # ANSI out-of-bounds error — malformed lines degrade to null columns
    host = F.get(
        F.transform(
            F.filter(
                tag_kvs,
                lambda kv: F.split(kv, r"(?<!\\)=")[0] == "host",
            ),
            lambda kv: F.split(kv, r"(?<!\\)=")[1],
        ),
        0,
    )
    value = F.get(
        F.transform(
            F.filter(
                F.split(fields, r"(?<!\\),"),
                lambda kv: F.split(kv, r"(?<!\\)=")[0] == "value",
            ),
            lambda kv: F.split(kv, r"(?<!\\)=")[1],
        ),
        0,
    )
    return df.select(
        _unesc_ident(host).alias("host"),
        service.alias("service"),
        value.try_cast("double").alias("metric"),
        (ts.try_cast("double") / mult).alias("time"),
    )


# -------------------------------------------------------- prometheus --

def _prom_sanitize(c: Column) -> Column:
    """replace-disallowed (prometheus.clj:12-15): non-word chars → _,
    runs of _ collapsed."""
    return F.regexp_replace(F.regexp_replace(c, r"[^a-zA-Z0-9_]", "_"), r"_{2,}", "_")


def events_to_prometheus_text(
    df: DataFrame,
    label_fields: Sequence[str] = ("host",),
    separator: str = ",",
    quote_values: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """Encode events as Prometheus exposition lines
    (prometheus.clj generate-datapoint-with-labels :43-47):
    ``service_name{host="h1",tags="a,b"} 1.5``.

    Metric name = sanitized service; labels = sanitized keys with the
    event's values, plus a ``tags`` label joining the tags array with
    ``separator`` (generate-labels, prometheus.clj:71-84). Rows without
    service or metric are dropped, like the reference's nil guard
    (:41). ``quote_values=False`` reproduces the reference's unquoted
    label values bug-for-bug."""
    q = '"' if quote_values else ""
    label_cols: list[Column] = []
    for lf in label_fields:
        label_cols.append(
            F.when(
                F.col(lf).isNotNull(),
                F.concat(
                    _prom_sanitize(F.lit(lf)),
                    F.lit("=" + q),
                    F.col(lf).cast("string"),
                    F.lit(q),
                ),
            )
        )
    if "tags" in df.columns:
        label_cols.append(
            F.when(
                F.size(F.col("tags")) > 0,
                F.concat(
                    F.lit("tags=" + q),
                    F.array_join(F.col("tags"), separator),
                    F.lit(q),
                ),
            )
        )
    labels = F.array_join(F.array_compact(F.array(*label_cols)), ",")
    metric_s = F.col("metric").cast(f"decimal(24,{decimals})").cast("string")
    return (
        df.filter(F.col("service").isNotNull() & F.col("metric").isNotNull())
        .select(
            F.concat(
                _prom_sanitize(F.col("service")),
                F.lit("{"),
                labels,
                F.lit("} "),
                metric_s,
            ).alias("line")
        )
    )


def prometheus_text_to_samples(
    df: DataFrame, line_col: str = "line", quoted: bool = True
) -> DataFrame:
    """Parse exposition lines back to (name, labels map, value) — the
    ingest direction for scrape-format payloads. Column-only regex.

    ``quoted=True`` (matching the encoder's spec-valid default) splits
    label pairs only at ``,key="`` boundaries, so a label VALUE
    containing ``=`` (e.g. ``tags="a,b=c"``) does not reparse as a
    spurious label. ``quoted=False`` pairs with the reference's
    unquoted parity mode and keeps the laxer ``,key=`` boundary (an
    unquoted value containing ``=`` is ambiguous by construction
    there, as in the reference)."""
    boundary = ',(?=[a-zA-Z_][a-zA-Z0-9_]*=")' if quoted else ",(?=[a-zA-Z_][a-zA-Z0-9_]*=)"
    line = F.trim(F.col(line_col))
    name = F.regexp_extract(line, r"^([a-zA-Z_][a-zA-Z0-9_]*)", 1)
    body = F.regexp_extract(line, r"\{(.*)\}", 1)
    value = F.regexp_extract(line, r"\}\s+(\S+)$", 1)
    kvs = F.expr(
        f"""
        map_from_entries(
          transform(
            filter(split(regexp_extract(trim({line_col}), '\\\\{{(.*)\\\\}}', 1),
                         '{boundary}'),
                   s -> s != ''),
            s -> struct(split(s, '=', 2)[0] AS key,
                        regexp_replace(split(s, '=', 2)[1], '^"|"$', '') AS value)))
        """
    )
    return df.select(
        name.alias("name"),
        F.when(body != "", kvs).otherwise(F.expr("map()")).alias("labels"),
        value.try_cast("double").alias("value"),
    )
