"""The arbitrary-lambda escape hatch (SURVEY.md §2.10).

The reference accepts any Clojure fn as mapper (smap,
streams.clj:163-175), reducer (sreduce, :206-250), or key extractor
(by, :1571). The Column-expression forms in operators/ are always
preferred (JVM, codegen); these pandas-based forms are for semantics
Columns can't express. All Arrow-batched — never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def smap_pandas(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """smap with an arbitrary per-event function (vectorized over
    Arrow batches). Mirrors smap's nil-dropping: fn returns the rows
    it keeps (streams.clj:163-175)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema)


def sreduce_pandas(
    df: DataFrame,
    fn: Callable[[object, pd.Series], object],
    init,
    keys: Sequence[str] = ("host", "service"),
    value_col: str = "metric",
    out_col: str = "acc",
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """sreduce (streams.clj:206-250): running user-fn reduce per key,
    emitting the accumulator at every event, in (time, id) order.

    applyInPandas sees one key group per call — the reference's per-key
    closure state, but distributed across executors and spill-safe."""
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + f", {order_col} long, {out_col} double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([time_col, order_col])
        acc = init
        accs = []
        for v in pdf[value_col]:
            acc = fn(acc, v)
            accs.append(acc)
        out = pdf[[*keys, order_col]].copy()
        out[out_col] = accs
        return out

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)


def by_builder_pandas(
    df: DataFrame,
    build: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    keys: Sequence[str],
    schema,
) -> DataFrame:
    """by-builder (streams.clj:1585-1597): per-key children built FROM
    the key value — applyInPandas hands the key tuple to the builder."""

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return build(key, pdf)

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)
