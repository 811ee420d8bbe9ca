"""Operator library — batch (DataFrame) forms of the reference's stream
DSL (SURVEY.md §2). Streaming variants live in riemann_spark.streaming
and reuse the same Column logic."""

from riemann_spark.operators import (  # noqa: F401
    analytics,
    asof,
    bucketing,
    deps,
    folds,
    index,
    skew,
    stateless,
    storage,
    windows,
)
