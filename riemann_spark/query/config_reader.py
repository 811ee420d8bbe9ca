"""Reader for riemann ``.config`` stream topologies (SURVEY §3.3 made
literal): parse the Clojure ``(streams ...)`` form and compile the
supported combinator subset straight onto DataFrames, so an existing
config file drives this engine without hand translation.

Scope — the STREAM DSL, not general Clojure: the reader understands
s-expressions, keywords, strings, numbers, vectors, maps, and the
``#"re"`` regex macro; the compiler maps the combinators this engine
implements (where/default/with/adjust/scale/tag/tagged/by/rate/
changed-state/stable/throttle/rollup/index/expired and the where
predicate sub-language: and/or/not, field comparisons, ``(service
#"re")`` matchers, tagged). Server/require/logging/tests top-level
forms are configuration-plumbing, not stream semantics — they are
recognized and skipped. Anything genuinely unsupported raises with
the offending symbol, never silently drops semantics.

Compilation is structural, not interpretive: each form becomes the
corresponding Column expression / operator call, so Catalyst sees the
same plan the hand-written topology produces (the parity test builds
the SHIPPED reference config both ways and diffs the plans' output).

Reference anchors: config eval (config.clj:349-372), streams macro
(config.clj:85-98), child-fanout closure semantics (streams.clj:63-121).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riemann_spark.operators import analytics, index as index_ops, stateless

# ------------------------------------------------------------ reader


@dataclass(frozen=True)
class Sym:
    name: str

    def __repr__(self) -> str:  # keeps error messages readable
        return self.name


@dataclass(frozen=True)
class Kw:
    name: str

    def __repr__(self) -> str:
        return f":{self.name}"


@dataclass(frozen=True)
class Regex:
    pattern: str


_TOKEN = re.compile(
    r"""
    (?P<ws>[\s,]+)
  | (?P<comment>;[^\n]*)
  | (?P<regex>\#"(?:[^"\\]|\\.)*")
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<open>[(\[{])
  | (?P<close>[)\]}])
  | (?P<dispatch>\#\()
  | (?P<atom>[^\s,()\[\]{}";]+)
    """,
    re.VERBOSE,
)


def tokenize(src: str) -> list:
    toks = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            raise ValueError(f"config reader: bad token at {src[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        toks.append((m.lastgroup, m.group()))
    return toks


def _atom(text: str):
    if text.startswith(":"):
        return Kw(text[1:])
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    if text == "true":
        return True
    if text == "false":
        return False
    if text == "nil":
        return None
    return Sym(text)


def parse_forms(src: str) -> list:
    """All top-level forms. Vectors → lists tagged by leading Kw-free
    python list; maps → dicts; ``#(...)`` lambdas → opaque Sym."""
    toks = tokenize(src)
    out, stack = [], []

    def push(v):
        (stack[-1].append(v) if stack else out.append(v))

    i = 0
    while i < len(toks):
        kind, text = toks[i]
        if kind == "open":
            stack.append([("(", "[", "{").index(text)])
        elif kind == "close":
            frame = stack.pop()
            tag, items = frame[0], frame[1:]
            if tag == 2:  # map
                v = dict(zip(items[0::2], items[1::2]))
            elif tag == 1:  # vector
                v = ("vec", items)
            else:
                v = tuple(items)
            push(v)
        elif kind == "dispatch":  # #( — opaque function literal
            depth = 1
            j = i + 1
            while depth:
                k, _t = toks[j]
                depth += 1 if k in ("open", "dispatch") else -1 if k == "close" else 0
                j += 1
            push(Sym("#fn"))
            i = j - 1
        elif kind == "string":
            push(text[1:-1].encode().decode("unicode_escape"))
        elif kind == "regex":
            push(Regex(text[2:-1]))
        else:
            push(_atom(text))
        i += 1
    if stack:
        raise ValueError("config reader: unbalanced parens")
    return out


# --------------------------------------------------------- predicates

_CMP = {"=": "==", ">": ">", "<": "<", ">=": ">=", "<=": "<=", "not=": "!="}
_FIELDS = {"host", "service", "state", "description", "metric", "time", "ttl"}


def compile_pred(form) -> Column:
    """The ``where`` predicate sub-language (streams.clj:1739-1810)."""
    if isinstance(form, tuple) and form and isinstance(form[0], Sym):
        head = form[0].name
        if head == "and":
            out = compile_pred(form[1])
            for f in form[2:]:
                out = out & compile_pred(f)
            return out
        if head == "or":
            out = compile_pred(form[1])
            for f in form[2:]:
                out = out | compile_pred(f)
            return out
        if head == "not":
            return ~F.coalesce(compile_pred(form[1]), F.lit(False))
        if head in _CMP:
            lhs, rhs = form[1], form[2]
            lc = _operand(lhs)
            rc = _operand(rhs)
            op = _CMP[head]
            if op == "==":
                return lc.eqNullSafe(rc) if rhs is None else (lc == rc)
            return {">": lc > rc, "<": lc < rc, ">=": lc >= rc, "<=": lc <= rc,
                    "!=": lc != rc}[op]
        if head in _FIELDS:
            # (service "x") equality, (service #"re") regex matcher
            arg = form[1]
            if isinstance(arg, Regex):
                return F.col(head).rlike(arg.pattern)
            return F.col(head) == F.lit(arg)
        if head == "tagged":
            return F.array_contains(F.coalesce(F.col("tags"), F.array()), form[1])
        raise ValueError(f"config reader: unsupported predicate form ({head} ...)")
    raise ValueError(f"config reader: unsupported predicate {form!r}")


def _operand(x) -> Column:
    if isinstance(x, Sym) and x.name in _FIELDS:
        return F.col(x.name)
    if isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], Kw):
        # (:field event) accessor
        return F.col(x[0].name)
    if isinstance(x, (int, float, str)) or x is None:
        return F.lit(x)
    raise ValueError(f"config reader: unsupported operand {x!r}")


# ---------------------------------------------------------- compiler

#: top-level forms that are deployment plumbing, not stream semantics
_PLUMBING = {
    "logging/init", "tcp-server", "udp-server", "ws-server", "sse-server",
    "graphite-server", "opentsdb-server", "instrumentation",
    "periodically-expire", "require", "assert", "tests", "repl-server",
    "pubsub", "let",
}


class Topology:
    """Compiled config: named leaf DataFrames. ``index`` collects every
    (index) leaf (unioned if several); ``taps[name]`` mirrors the
    reference's (tap :name stream) test instrumentation; side-effect
    children (#fn, email, prn) become named ``sinks`` leaves carrying
    the events that reached them."""

    def __init__(self) -> None:
        self.index: DataFrame | None = None
        self.taps: dict[str, DataFrame] = {}
        self.sinks: dict[str, DataFrame] = {}
        self._sink_n = 0

    def _add_index(self, df: DataFrame) -> None:
        built = index_ops.build_index(df)
        self.index = built if self.index is None else self.index.unionByName(built)

    def _add_sink(self, name: str, df: DataFrame) -> None:
        key = f"{name}_{self._sink_n}"
        self._sink_n += 1
        self.sinks[key] = df


def _compile_children(df: DataFrame, forms, topo: Topology) -> None:
    for f in forms:
        _compile_stream(df, f, topo)


def _compile_stream(df: DataFrame, form, topo: Topology) -> None:
    if isinstance(form, Sym):
        if form.name == "index":
            topo._add_index(df)
            return
        if form.name == "#fn":
            topo._add_sink("fn", df)
            return
        if form.name == "expired":
            # batch compile has no wall clock: the expired branch sees
            # tombstones (state="expired"); TTL-sweep expiry is the
            # streaming reaper's job (streaming/index_stream.py)
            topo._add_sink("expired", df.filter(F.col("state") == "expired"))
            return
        raise ValueError(f"config reader: unsupported child symbol {form.name}")
    if not (isinstance(form, tuple) and form and isinstance(form[0], Sym)):
        raise ValueError(f"config reader: unsupported stream form {form!r}")
    head, args = form[0].name, form[1:]

    if head == "index":
        # (index) call form — same leaf as the bare symbol
        topo._add_index(df)
        return
    if head == "where":
        pred, children = args[0], list(args[1:])
        # (else child...) clause (streams.clj:1790-1810): non-matching
        # events INCLUDING null comparisons, where_else's contract
        elses = [c for c in children
                 if isinstance(c, tuple) and c and isinstance(c[0], Sym)
                 and c[0].name == "else"]
        children = [c for c in children if c not in elses]
        kept, other = stateless.where_else(df, compile_pred(pred))
        if children:
            _compile_children(kept, children, topo)
        else:
            topo._add_sink("where", kept)
        for e in elses:
            _compile_children(other, e[1:], topo)
    elif head == "default":
        if isinstance(args[0], dict):
            fields = {k.name: v for k, v in args[0].items()}
            children = args[1:]
        else:
            fields = {args[0].name: args[1]}
            children = args[2:]
        fields = {
            k: (float(v) if k == "ttl" and isinstance(v, int) else v)
            for k, v in fields.items()
        }
        out = stateless.default(df, fields)
        _compile_children(out, children, topo)
    elif head == "with":
        # (with :field v children) or (with {:f1 v1 :f2 v2} children)
        if isinstance(args[0], dict):
            fields = {k.name: v for k, v in args[0].items()}
            children = args[1:]
        else:
            fields = {args[0].name: args[1]}
            children = args[2:]
        out = stateless.with_fields(df, fields)
        _compile_children(out, children, topo)
    elif head == "scale":
        out = stateless.scale(df, float(args[0]))
        _compile_children(out, args[1:], topo)
    elif head == "adjust":
        # (adjust [:field op arg] children) with arithmetic ops — the
        # common config shape; arbitrary clojure fns stay unsupported
        vec, children = args[0], args[1:]
        items = vec[1]
        if len(items) != 3 or not isinstance(items[1], Sym) or items[1].name not in "*+-/":
            raise ValueError(f"config reader: unsupported adjust fn {items[1:] or items!r}")
        field_kw, op_sym, amount = items
        ops = {"*": lambda c: c * amount, "+": lambda c: c + amount,
               "-": lambda c: c - amount, "/": lambda c: c / amount}
        out = stateless.adjust(df, field_kw.name, ops[op_sym.name])
        _compile_children(out, children, topo)
    elif head == "tag":
        out = stateless.tag(df, args[0])
        _compile_children(out, args[1:], topo)
    elif head == "tagged":
        out = stateless.tagged_all(df, [args[0]])
        _compile_children(out, args[1:], topo)
    elif head == "expired":
        out = df.filter(F.col("state") == "expired")
        if args and not isinstance(args[0], Sym):
            _compile_children(out, args, topo)
        else:
            # children that are side-effect fns collapse to a sink
            topo._add_sink("expired", out)
    elif head == "by":
        vec, children = args[0], args[1:]
        keys = [k.name for k in vec[1]]
        for ch in children:
            _compile_keyed(df, keys, ch, topo)
    elif head == "rate":
        interval, children = float(args[0]), args[1:]
        out = _rate_events(df, interval, analytics.KEY)
        _compile_leafish(out, children, topo, "rate")
    elif head == "changed-state":
        opts = args[0] if args and isinstance(args[0], dict) else {}
        children = args[1:] if opts else args
        init = opts.get(Kw("init")) if opts else None
        out = analytics.changed_state(df, init=init)
        _compile_leafish(out, children, topo, "changed_state")
    elif head == "stable":
        dt, field_kw, children = float(args[0]), args[1], args[2:]
        out = analytics.stable(df, dt, field=field_kw.name)
        _compile_leafish(out, children, topo, "stable")
    elif head == "throttle":
        n, dt, children = int(args[0]), float(args[1]), args[2:]
        out = analytics.throttle(df, n, dt)
        _compile_leafish(out, children, topo, "throttle")
    elif head == "rollup":
        n, dt, children = int(args[0]), float(args[1]), args[2:]
        out = analytics.rollup(df, n, dt)
        _compile_leafish(out, children, topo, "rollup")
    elif head == "over":
        out = stateless.over(df, float(args[0]))
        _compile_leafish(out, args[1:], topo, "over")
    elif head == "under":
        out = stateless.under(df, float(args[0]))
        _compile_leafish(out, args[1:], topo, "under")
    elif head == "percentiles":
        interval, vec, children = float(args[0]), args[1], args[2:]
        points = [float(p) for p in vec[1]]
        out = analytics.percentiles(df, interval, points)
        # percentile rows carry service+window_start+metric; re-shape
        # to the event model the same way rate does
        out = out.select(
            F.lit(None).cast("string").alias("host"),
            "service",
            F.lit("ok").alias("state"),
            F.col("window_start").alias("time"),
            "metric",
        )
        _compile_leafish(out, children, topo, "percentiles")
    elif head == "split":
        # (split pred1 child1 pred2 child2 ... default?) — first
        # matching predicate wins (streams.clj:1812-1916)
        rest = list(args)
        default_child = rest.pop() if len(rest) % 2 == 1 else None
        taken = F.lit(False)
        for pred, child in zip(rest[0::2], rest[1::2]):
            c = F.coalesce(compile_pred(pred), F.lit(False))
            _compile_children(df.filter(~taken & c), [child], topo)
            taken = taken | c
        if default_child is not None:
            _compile_children(df.filter(~taken), [default_child], topo)
    elif head == "splitp":
        # (splitp < metric t1 child1 t2 child2 default) — the cond
        # split (streams.clj:1812-1916): first matching branch wins
        cmp_sym, field_sym = args[0], args[1]
        rest = list(args[2:])
        default_child = rest.pop() if len(rest) % 2 == 1 else None
        ops = {"<": "lt", ">": "gt", "<=": "leq", ">=": "geq"}
        if cmp_sym.name not in ops:
            raise ValueError(f"config reader: unsupported splitp op {cmp_sym}")
        col = F.col(field_sym.name)
        taken = F.lit(False)
        for thresh, child in zip(rest[0::2], rest[1::2]):
            c = {"lt": col < thresh, "gt": col > thresh,
                 "leq": col <= thresh, "geq": col >= thresh}[ops[cmp_sym.name]]
            branch = df.filter(~taken & F.coalesce(c, F.lit(False)))
            _compile_children(branch, [child], topo)
            taken = taken | F.coalesce(c, F.lit(False))
        if default_child is not None:
            _compile_children(df.filter(~taken), [default_child], topo)
    elif head == "ewma-timeless":
        r_, children = float(args[0]), args[1:]
        out = analytics.ewma_timeless(df, r_)
        _compile_leafish(out, children, topo, "ewma")
    elif head == "coalesce":
        children = args[1:] if args and not isinstance(args[0], (tuple, Sym)) else args
        out = analytics.coalesce_snapshot(df)
        _compile_leafish(out, children, topo, "coalesce")
    elif head == "tap":
        # same tap name at several points appends to one capture,
        # like the reference's shared per-name results atom
        name_kw, children = args[0], args[1:]
        prev = topo.taps.get(name_kw.name)
        topo.taps[name_kw.name] = df if prev is None else prev.unionByName(df)
        _compile_children(df, children, topo)
    elif head in ("email", "prn", "pagerduty", "graphite", "slack"):
        topo._add_sink(head, df)
    else:
        raise ValueError(f"config reader: unsupported stream op ({head} ...)")


def _rate_events(df: DataFrame, interval: float, keys) -> DataFrame:
    """rate emits window rows; children expect the event model, so the
    output re-shapes as the reference does: an event per window, timed
    at the window start, metric = the rate (streams.clj:841-883)."""
    out = analytics.rate(df, interval, keys=keys)
    cols = [F.col(k) for k in keys]
    if "host" not in keys:
        cols.append(F.lit(None).cast("string").alias("host"))
    if "service" not in keys:
        cols.append(F.lit("rate").alias("service"))
    return out.select(
        *cols,
        F.lit("ok").alias("state"),
        F.col("window_start").alias("time"),
        F.col("rate").alias("metric"),
    )


def _compile_leafish(out: DataFrame, children, topo: Topology, name: str) -> None:
    if children:
        _compile_children(out, children, topo)
    else:
        topo._add_sink(name, out)


def _compile_keyed(df: DataFrame, keys: list[str], form, topo: Topology) -> None:
    """(by [:k] (rate ...)) — keyed operators take keys= directly (the
    groupBy IS the reference's per-key closure fan-out)."""
    if isinstance(form, tuple) and form and isinstance(form[0], Sym):
        head = form[0].name
        if head == "rate":
            out = _rate_events(df, float(form[1]), keys)
            _compile_leafish(out, form[2:], topo, "rate")
            return
    # fall back: non-keyed ops behave identically under by
    _compile_stream(df, form, topo)


def load_config(src: str, events: DataFrame) -> Topology:
    """Compile a riemann config's (streams ...) forms against an event
    DataFrame. Plumbing top-level forms are skipped; (let [x (tap ...)]
    (streams ...)) bodies are walked for their streams forms."""
    topo = Topology()

    def walk_top(form):
        if not (isinstance(form, tuple) and form and isinstance(form[0], Sym)):
            return
        head = form[0].name
        if head == "streams":
            _compile_children(events, form[1:], topo)
        elif head == "let":
            # bindings may contain (tap :name (index)) — honor the tap
            bindings = form[1][1]
            binds: dict[str, object] = {}
            for sym, val in zip(bindings[0::2], bindings[1::2]):
                binds[sym.name] = val
            for body in form[2:]:
                walk_top(_substitute(body, binds))
        elif head in _PLUMBING:
            return
        else:
            raise ValueError(f"config reader: unsupported top-level form ({head} ...)")

    for form in parse_forms(src):
        walk_top(form)
    return topo


def _substitute(form, binds: dict):
    """Inline let-bound symbols (one level — the config idiom)."""
    if isinstance(form, Sym) and form.name in binds:
        return binds[form.name]
    if isinstance(form, tuple):
        return tuple(_substitute(f, binds) for f in form)
    return form


# ------------------------------------------- inject!-style test harness


def events_from_dicts(spark, events: list[dict]) -> DataFrame:
    """Event dicts → a canonical EVENT_SCHEMA DataFrame. Keys outside
    the core event fields land in the ``attributes`` map (stringified),
    matching the reference's custom-attribute semantics
    (common.clj:270-274)."""
    from riemann_spark.schema import EVENT_SCHEMA

    core = {f.name for f in EVENT_SCHEMA.fields}
    rows = []
    for e in events:
        row = {k: e.get(k) for k in core}
        row["time"] = float(e.get("time", 0.0))
        if row.get("metric") is not None:
            row["metric"] = float(row["metric"])
        if row.get("ttl") is not None:
            row["ttl"] = float(row["ttl"])
        extras = {k: str(v) for k, v in e.items() if k not in core and k != "event_id"}
        if extras:
            row["attributes"] = {**(row.get("attributes") or {}), **extras}
        # arrival-order id: the tie-break column ordering-sensitive
        # operators (changed-state, ddt, ...) key on in the event tables
        row["event_id"] = int(e.get("event_id", len(rows)))
        rows.append(row)
    from pyspark.sql.types import LongType, StructField, StructType

    # StructType.add mutates in place — never call it on the shared schema
    schema = StructType(
        list(EVENT_SCHEMA.fields) + [StructField("event_id", LongType())]
    )
    return spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields) for r in rows], schema
    )


def run_config_test(spark, config_src: str, events: list[dict] | DataFrame):
    """``inject!`` for a ported config (reference test.clj:131-153):
    compile the config's (streams ...) against the given events and
    return ``{tap_name: [event dicts]}`` — what each ``(tap :name
    ...)`` captured, rows sorted by (time, host, service) for stable
    assertion. Batch semantics stand in for controlled time: event
    ``:time`` fields ARE the clock, so ordering-sensitive operators
    see the same timeline ``(advance! t)`` would have produced.

    Use it to check a migrated config end-to-end::

        rs = run_config_test(spark, open("riemann.config").read(),
                             [{"time": 2, "service": "bar", ...}])
        assert len(rs["some-tap"]) == 1
    """
    if not isinstance(events, DataFrame):
        events = events_from_dicts(spark, events)
    topo = load_config(config_src, events)
    out: dict[str, list[dict]] = {}
    for name, df in topo.taps.items():
        cols = df.columns
        order = [c for c in ("time", "host", "service") if c in cols]
        rows = df.orderBy(*order).collect() if order else df.collect()
        out[name] = [
            {k: v for k, v in r.asDict(recursive=True).items() if v is not None}
            for r in rows
        ]
    return out


def lookup(events: list[dict], host, service):
    """test.clj:154-166 — the last tapped event matching host and
    service, or None."""
    found = None
    for e in events:
        if e.get("host") == host and e.get("service") == service:
            found = e
    return found
