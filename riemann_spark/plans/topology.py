"""Config DSL — composing topologies in flow order (SURVEY.md §3.3).

The reference's config is Clojure where ``(streams (where ... (rate 5
index)))`` builds a closure tree at eval time. The Spark analogue is
unexecuted DataFrame composition: a ``Stream`` wraps a DataFrame and
each combinator returns a new ``Stream`` — the same lazy-composition
shape, with Catalyst seeing the whole plan. ``pipe`` (streams.clj:
1490-1554) is just method chaining; ``apply()`` ≈ core/transition!
(query start); stopping/starting named queries is the hot-reload path
(config.clj:349-355, core.clj:131-161).

Example::

    top = (Stream.of(events_df)
           .where('metric > 5 and not (service =~ "%test%")')
           .scale(1 / 1024.0)
           .tag("scaled"))
    hot, rest = top.split('state = "critical"')
    snapshot = top.index()            # latest-per-key table
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame

from riemann_spark.operators import analytics, index, stateless


@dataclass(frozen=True)
class Stream:
    df: DataFrame

    # ---------------------------------------------------------- intro
    @staticmethod
    def of(df: DataFrame) -> "Stream":
        return Stream(df)

    def to_df(self) -> DataFrame:
        return self.df

    # --------------------------------------------------- composition
    def pipe(self, *fns: Callable[[DataFrame], DataFrame]) -> "Stream":
        df = self.df
        for fn in fns:
            df = fn(df)
        return Stream(df)

    # ------------------------------------------------------- filters
    def where(self, pred: str | Column) -> "Stream":
        return Stream(stateless.where(self.df, pred))

    def over(self, x: float) -> "Stream":
        return Stream(stateless.over(self.df, x))

    def under(self, x: float) -> "Stream":
        return Stream(stateless.under(self.df, x))

    def tagged(self, tags: Sequence[str]) -> "Stream":
        return Stream(stateless.tagged_all(self.df, tags))

    # ---------------------------------------------------- transforms
    def with_fields(self, fields: Mapping[str, object]) -> "Stream":
        return Stream(stateless.with_fields(self.df, fields))

    def default(self, fields: Mapping[str, object]) -> "Stream":
        return Stream(stateless.default(self.df, fields))

    def scale(self, factor: float) -> "Stream":
        return Stream(stateless.scale(self.df, factor))

    def tag(self, tags) -> "Stream":
        return Stream(stateless.tag(self.df, tags))

    def untag(self, tags) -> "Stream":
        return Stream(stateless.untag(self.df, tags))

    # ------------------------------------------------------- routing
    def split(self, pred: str | Column) -> tuple["Stream", "Stream"]:
        yes, no = stateless.where_else(self.df, pred)
        return Stream(yes), Stream(no)

    def sdo(self, *fns: Callable[["Stream"], "Stream"]) -> list["Stream"]:
        return [fn(self) for fn in fns]

    # ----------------------------------------------------- analytics
    def rate(self, interval: float, keys=analytics.KEY) -> "Stream":
        return Stream(analytics.rate(self.df, interval, keys))

    def changed(self, field: str = "state", **kw) -> "Stream":
        return Stream(analytics.changed(self.df, field, **kw))

    def top(self, k: int, **kw) -> "Stream":
        return Stream(analytics.top(self.df, k, **kw))

    def throttle(self, n: int, dt: float, **kw) -> "Stream":
        return Stream(analytics.throttle(self.df, n, dt, **kw))

    # --------------------------------------------------------- index
    def index(self, now: float | None = None) -> "Stream":
        return Stream(index.build_index(self.df, now=now))

    def search(self, query: str) -> "Stream":
        return Stream(index.search(self.df, query))
