"""Stateless event→event operators (SURVEY.md §2.2).

Every operator is pure Column work — no UDFs, no shuffles — so at any
scale these fuse into a single WholeStageCodegen scan stage with
predicate pushdown into the parquet/Kafka source. Each function takes
and returns a DataFrame (the "stream"); children-composition in the
reference becomes ordinary chaining.

Reference mapping (file:line into /root/reference):
- where/where*    streams.clj:1739-1810
- match           streams.clj:1263-1282, protocol common.clj:181-212
- over/under      streams.clj:1661-1675
- tagged-all/any  streams.clj:1284-1328
- expired         streams.clj:1332-1344, expired? :52-61
- with/default    streams.clj:1346-1417
- adjust/scale    streams.clj:1419-1461
- tag/untag       streams.clj:1463-1488
- smap/smapcat/sflatten  streams.clj:154-204
- split/splitp    streams.clj:1812-1916
- dual            streams.clj:127-152
"""

from __future__ import annotations

import numbers
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riemann_spark.query import compile_query
from riemann_spark.schema import DEFAULT_TTL


def _as_pred(pred: str | Column) -> Column:
    return compile_query(pred) if isinstance(pred, str) else pred


def where(df: DataFrame, pred: str | Column) -> DataFrame:
    """Predicate filter; accepts a riemann query string or a Column."""
    return df.filter(_as_pred(pred))


def where_else(df: DataFrame, pred: str | Column) -> tuple[DataFrame, DataFrame]:
    """(matching, else-branch) — the reference's ``(else ...)`` clause.

    The else branch receives events that did NOT match (including
    null-valued comparisons, per two-valued closure semantics).
    """
    p = _as_pred(pred)
    return df.filter(p), df.filter(~F.coalesce(p, F.lit(False)))


def match(df: DataFrame, field: str, value) -> DataFrame:
    """Match a field against value/regex/set (reference Match protocol).

    - plain value  → null-safe equality
    - compiled-regex analogue: a string starting with ``re:`` → rlike
    - set/sequence → isin
    """
    col = F.col(field)
    if isinstance(value, str) and value.startswith("re:"):
        return df.filter(col.rlike(value[3:]))
    if isinstance(value, (set, frozenset, list, tuple)):
        return df.filter(col.isin(*value))
    if value is None:
        return df.filter(col.isNull())
    return df.filter(col.eqNullSafe(F.lit(value)))


def over(df: DataFrame, x: float) -> DataFrame:
    return df.filter(F.col("metric") > x)


def under(df: DataFrame, x: float) -> DataFrame:
    return df.filter(F.col("metric") < x)


def tagged_all(df: DataFrame, tags: Sequence[str]) -> DataFrame:
    """All given tags present on the event."""
    pred = F.lit(True)
    for t in tags:
        pred = pred & F.array_contains(F.col("tags"), F.lit(t))
    return df.filter(pred)


tagged = tagged_all


def tagged_any(df: DataFrame, tags: Sequence[str]) -> DataFrame:
    """Any of the given tags present."""
    return df.filter(F.arrays_overlap(F.col("tags"), F.array(*[F.lit(t) for t in tags])))


def expired_pred(now: float | Column) -> Column:
    """expired? (streams.clj:52-61): state="expired" OR now - time > ttl
    (ttl defaulting to 60)."""
    now_col = F.lit(now) if isinstance(now, numbers.Number) else now
    return (F.col("state") == "expired") | (
        now_col - F.col("time") > F.coalesce(F.col("ttl"), F.lit(DEFAULT_TTL))
    )


def expired(df: DataFrame, now: float | Column) -> DataFrame:
    return df.filter(expired_pred(now))


def not_expired(df: DataFrame, now: float | Column) -> DataFrame:
    return df.filter(~F.coalesce(expired_pred(now), F.lit(False)))


def with_fields(df: DataFrame, fields: Mapping[str, object]) -> DataFrame:
    """Set/overwrite fields; a None value removes (nulls) the field."""
    for k, v in fields.items():
        if v is None:
            df = df.withColumn(k, F.lit(None))
        elif isinstance(v, Column):
            df = df.withColumn(k, v)
        else:
            df = df.withColumn(k, F.lit(v))
    return df


def default(df: DataFrame, fields: Mapping[str, object]) -> DataFrame:
    """Set fields only where currently null."""
    for k, v in fields.items():
        lit = v if isinstance(v, Column) else F.lit(v)
        if k in df.columns:
            df = df.withColumn(k, F.coalesce(F.col(k), lit))
        else:
            df = df.withColumn(k, lit)
    return df


def adjust(df: DataFrame, field: str, fn: Callable[[Column], Column]) -> DataFrame:
    """Update one field with a Column function."""
    return df.withColumn(field, fn(F.col(field)))


def scale(df: DataFrame, factor: float) -> DataFrame:
    """metric × factor."""
    return df.withColumn("metric", F.col("metric") * F.lit(factor))


def tag(df: DataFrame, tags: str | Sequence[str]) -> DataFrame:
    """Add tag(s): new tags first, then existing, distinct-preserving —
    the reference's exact output order (streams.clj:1463-1477,
    streams_test.clj:233-250: tag "foo" on ["bar" "baz"] →
    ["foo" "bar" "baz"])."""
    ts = [tags] if isinstance(tags, str) else list(tags)
    new = F.array(*[F.lit(t) for t in ts])
    return df.withColumn(
        "tags", F.array_union(new, F.coalesce(F.col("tags"), F.array()))
    )


def untag(df: DataFrame, tags: str | Sequence[str]) -> DataFrame:
    """Remove tag(s); nil tags normalize to [] exactly as the
    reference's (remove ...) over nil does (streams_test.clj:210-230:
    untag on {} → {:tags []})."""
    ts = [tags] if isinstance(tags, str) else list(tags)
    return df.withColumn(
        "tags",
        F.array_except(
            F.coalesce(F.col("tags"), F.array()), F.array(*[F.lit(t) for t in ts])
        ),
    )


def smap(df: DataFrame, *cols: Column) -> DataFrame:
    """Streaming map as a projection (columnar fast path).

    The reference drops nil results (streams.clj:163-175); the columnar
    analogue of a nil result is an all-null projection, which callers
    express with a trailing where(). Arbitrary-lambda smap goes through
    riemann_spark.functions.udfs.map_in_pandas instead.
    """
    return df.select(*cols)


def smapcat(df: DataFrame, array_col: Column, alias: str = "event") -> DataFrame:
    """Map to a sequence and flatten (explode)."""
    return df.select(F.explode(array_col).alias(alias))


def sflatten(df: DataFrame, array_col: str = "events") -> DataFrame:
    """Flatten vectors-of-events back into an event stream."""
    return df.select(F.inline(F.col(array_col)))


def split_by(
    df: DataFrame, branches: Sequence[tuple[str | Column, object]], default_value=None, alias: str = "branch"
) -> DataFrame:
    """First-matching-predicate value routing (splitp as a CASE).

    For topology routing (different downstream *pipelines* per branch)
    use ``split_streams``.
    """
    expr = None
    for pred, value in branches:
        p = _as_pred(pred)
        v = value if isinstance(value, Column) else F.lit(value)
        expr = F.when(p, v) if expr is None else expr.when(p, v)
    if expr is None:
        expr = F.lit(default_value)
    else:
        expr = expr.otherwise(F.lit(default_value))
    return df.withColumn(alias, expr)


def split_streams(df: DataFrame, preds: Sequence[str | Column]) -> list[DataFrame]:
    """First-matching-predicate topology routing: returns one DataFrame
    per predicate plus a final default branch (events matching none)."""
    out: list[DataFrame] = []
    taken = F.lit(False)
    for pred in preds:
        p = F.coalesce(_as_pred(pred), F.lit(False))
        out.append(df.filter(~taken & p))
        taken = taken | p
    out.append(df.filter(~taken))
    return out


def sdo(df: DataFrame, *fns: Callable[[DataFrame], DataFrame]) -> list[DataFrame]:
    """Fan one stream out to several children (streams.clj:252-262).
    In Spark this is just plan reuse; cache() if children re-scan."""
    return [fn(df) for fn in fns]


def ensure_event_times(df: DataFrame, now: float | None = None) -> DataFrame:
    """post-load-event (common.clj:86-89) / ensure-event-time
    (common.clj:132-137): events arriving without a time get the
    ingest clock. ``now`` pins the clock (tests, replays); the default
    is the query-constant current timestamp — every event in a
    micro-batch shares the ingest instant, which is exactly the
    batch-granular semantic a distributed ingest has (per-row clock
    calls would make the column nondeterministic under retries).
    ``time_us`` mirrors the fill when present."""
    t = (
        F.lit(float(now))
        if now is not None
        else F.unix_micros(F.current_timestamp()) / F.lit(1000000.0)
    )
    out = df.withColumn("time", F.coalesce(F.col("time"), t))
    if "time_us" in df.columns:
        out = out.withColumn(
            "time_us",
            F.coalesce(
                F.col("time_us"),
                F.round(F.col("time") * 1000000.0).cast("long"),
            ),
        )
    return out


def dual(df: DataFrame, pred: str | Column) -> tuple[DataFrame, DataFrame]:
    """Mirror-image split (streams.clj:127-152): matching events go to
    the first stream; the second receives the complement with
    state="expired" (the mirror-expire trick)."""
    p = _as_pred(pred)
    yes = df.filter(p)
    no = df.filter(~F.coalesce(p, F.lit(False))).withColumn("state", F.lit("expired"))
    return yes, no
