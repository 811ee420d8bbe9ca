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


def events_from_json(
    df: DataFrame, json_col: str = "value", keep_extra: bool = False
) -> DataFrame:
    parsed = df.select(
        F.from_json(F.col(json_col).cast("string"), EVENT_SCHEMA).alias("e"),
        F.col(json_col).cast("string").alias("__raw"),
    )
    out = parsed.select("e.*", "__raw")
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


def events_to_json(df: DataFrame) -> DataFrame:
    """Event frame → one JSON string column (event-to-json)."""
    cols = [c for c in df.columns if c in {f.name for f in EVENT_SCHEMA.fields}]
    return df.select(F.to_json(F.struct(*cols)).alias("value"))
