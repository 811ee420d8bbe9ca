"""Dependency-rule algebra (reference: deps.clj:24-80).

A Rule is a statement about an event and the current index:

- ``{field: value, ...}`` (a plain dict) — SOME event in the index
  carries all those field values; ``{}`` matches any non-empty index.
- ``all(*rules)`` — every rule matches.
- ``any_(*rules)`` — at least one rule matches.
- ``localhost(*rules)`` — ``all(rules)`` evaluated against the index
  restricted to events sharing the event-of-interest's host.
- ``depends(a, *bs)`` — if map-rule ``a`` matches the CURRENT EVENT
  (deps.clj:64-70 evaluates a against [event], not the index), then
  ``all(bs)`` must match the index; otherwise vacuously true.

Spark realization — no per-event index probing:

1. every leaf map-rule is aggregated over the index ONCE:
   global leaves  → one row of booleans (`max(case when pred)`),
   cross-joined (broadcast of a single row) onto the events;
   localhost leaves → one boolean per host, broadcast-joined on host.
2. the rule tree then compiles to a pure boolean Column over the
   joined frame (AND/OR/CASE) — whole-stage codegen, no UDFs.

At 100 TB: the index aggregates collapse to #hosts rows before any
join, the events side never shuffles (broadcast joins only), and the
rule evaluation itself is free (codegen). This is the same shape the
reference computes per event against its in-memory index, made
columnar.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class All:
    rules: tuple


@dataclass(frozen=True)
class Any:
    rules: tuple


@dataclass(frozen=True)
class Localhost:
    rule: object


@dataclass(frozen=True)
class Depends:
    a: dict
    b: object


def all(*rules):  # noqa: A001 — mirrors the reference's name (deps.clj:42)
    return All(tuple(rules))


def any_(*rules):
    return Any(tuple(rules))


def localhost(*rules):
    return Localhost(All(tuple(rules)))


def depends(a: dict, *bs):
    return Depends(a, All(tuple(bs)))


def _index_pred(fields: dict) -> Column:
    """Leaf predicate over an index row: select-keys equality
    (deps.clj:27-31). {} → TRUE (any row)."""
    c = F.lit(True)
    for k, v in fields.items():
        c = c & (F.col(k) == F.lit(v))
    return c


def _event_pred(fields: dict) -> Column:
    """Leaf predicate over the event-of-interest itself (the
    depends-a test, deps.clj:64-67 matches a against [event])."""
    return _index_pred(fields)


@dataclass
class _Plan:
    global_leaves: list = field(default_factory=list)  # [(id, fields)]
    host_leaves: list = field(default_factory=list)    # [(id, fields)]

    def register(self, fields: dict, local: bool) -> str:
        bucket = self.host_leaves if local else self.global_leaves
        name = f"__dep_{'h' if local else 'g'}{len(bucket)}"
        bucket.append((name, dict(fields)))
        return name


def _collect(rule, plan: _Plan, local: bool) -> None:
    if isinstance(rule, dict):
        plan.register(rule, local)
    elif isinstance(rule, (All, Any)):
        for r in rule.rules:
            _collect(r, plan, local)
    elif isinstance(rule, Localhost):
        _collect(rule.rule, plan, local=True)
    elif isinstance(rule, Depends):
        # a is an event-side predicate — no index aggregation needed
        _collect(rule.b, plan, local)
    else:
        raise TypeError(f"not a rule: {rule!r}")


def _compile(rule, plan: _Plan, local: bool, counters: dict) -> Column:
    if isinstance(rule, dict):
        key = "h" if local else "g"
        name = f"__dep_{key}{counters[key]}"
        counters[key] += 1
        return F.coalesce(F.col(name), F.lit(False))
    if isinstance(rule, All):
        c = F.lit(True)
        for r in rule.rules:
            c = c & _compile(r, plan, local, counters)
        return c
    if isinstance(rule, Any):
        c = F.lit(False)
        for r in rule.rules:
            c = c | _compile(r, plan, local, counters)
        return c
    if isinstance(rule, Localhost):
        return _compile(rule.rule, plan, local=True, counters=counters)
    if isinstance(rule, Depends):
        return F.when(
            F.coalesce(_event_pred(rule.a), F.lit(False)),
            _compile(rule.b, plan, local, counters),
        ).otherwise(F.lit(True))
    raise TypeError(f"not a rule: {rule!r}")


def deps_tag(
    events: DataFrame,
    index_df: DataFrame,
    rule,
    out: str = "deps_satisfied",
) -> DataFrame:
    """Tag each event with whether its dependencies are satisfied
    (deps.clj:73-80 deps-tag → :deps-satisfied?).

    ``index_df`` is the current index snapshot (latest-per-key, e.g.
    ``operators.index.build_index`` output)."""
    plan = _Plan()
    _collect(rule, plan, local=False)

    df = events
    if plan.global_leaves and plan.host_leaves:
        # one index pass for BOTH leaf tiers (r14 §12): aggregate
        # every leaf per host, persist the model-sized result
        # (#hosts rows), and fold the global booleans out of it with
        # a second, #hosts-row agg — the index subtree (latest-per-
        # key: scan + sorts) used to be planned and computed once
        # per tier. max-over-hosts of per-host max == global max;
        # hosts the left join misses coalesce to False either way.
        aggs = [
            F.coalesce(F.max(F.when(_index_pred(fl), True)), F.lit(False)).alias(n)
            for n, fl in plan.global_leaves + plan.host_leaves
        ]
        per_host = (
            index_df.groupBy(F.col("host").alias("__dep_host")).agg(*aggs).persist()
        )
        glob = per_host.agg(
            *[
                F.coalesce(F.max(n), F.lit(False)).alias(n)
                for n, _ in plan.global_leaves
            ]
        )
        df = df.crossJoin(F.broadcast(glob))
        hsel = per_host.select("__dep_host", *[n for n, _ in plan.host_leaves])
        df = df.join(
            F.broadcast(hsel), df["host"] == hsel["__dep_host"], "left"
        ).drop("__dep_host")
    elif plan.global_leaves:
        aggs = [
            F.coalesce(F.max(F.when(_index_pred(fl), True)), F.lit(False)).alias(n)
            for n, fl in plan.global_leaves
        ]
        df = df.crossJoin(F.broadcast(index_df.agg(*aggs)))
    elif plan.host_leaves:
        aggs = [
            F.coalesce(F.max(F.when(_index_pred(fl), True)), F.lit(False)).alias(n)
            for n, fl in plan.host_leaves
        ]
        per_host = index_df.groupBy(F.col("host").alias("__dep_host")).agg(*aggs)
        df = df.join(
            F.broadcast(per_host), df["host"] == per_host["__dep_host"], "left"
        ).drop("__dep_host")

    col = _compile(rule, plan, local=False, counters={"g": 0, "h": 0})
    drop = [n for n, _ in plan.global_leaves] + [n for n, _ in plan.host_leaves]
    return df.withColumn(out, col).drop(*drop)
