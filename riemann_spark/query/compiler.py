"""AST → pyspark Column / ANSI SQL predicate.

Semantics follow reference ``src/riemann/query.clj``:

- ``=`` is nil-literal-aware: nil matches only nil (query.clj +
  common.clj:209-212) → ``eqNullSafe``.
- ``!=`` is ``(not (= ...))`` — so ``host != 1`` DOES match events with
  null host → negated ``eqNullSafe``.
- ordered comparisons are nil-guarded (query.clj:124-132): a null field
  never matches → plain Column comparison (NULL → filtered out).
- ``=~`` is SQL-LIKE with ``%`` wildcards, compiled to an anchored
  regex (query.clj:146-155; only ``%`` is a wildcard — ``_`` is
  literal, unlike SQL LIKE).
- ``~=`` is an unanchored regex search (re-find) → ``rlike``.
- ``tagged "x"`` → tags array containment (streams.clj:1284-1305).
- unknown fields resolve to the open ``attributes`` map (SURVEY §1.1).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

CORE_FIELDS = {"host", "service", "state", "description", "metric", "tags", "time", "ttl"}

_ORDERED = {"<", ">", "<=", ">="}

# the event model's static types drive the reference's runtime guards
# (query.clj:184-189: `=` is cross-type-false Clojure equality, ordered
# comparisons are number?-guarded, regex matches are string?-guarded) —
# compiled here as constant-folded FALSE / guarded casts instead of
# per-event checks, so no query can throw at runtime (ANSI mode would
# otherwise raise on e.g. `host = 1` casting 'ş' to bigint)
_STRING_FIELDS = {"host", "service", "state", "description"}
_NUMERIC_FIELDS = {"metric", "time", "ttl"}


def _kind(field: str) -> str:
    if field in _STRING_FIELDS:
        return "string"
    if field in _NUMERIC_FIELDS:
        return "numeric"
    if field == "tags":
        return "tags"
    return "attr"  # open attributes: map<string,string>


def _eq_type_mismatch(field: str, value) -> bool:
    """Clojure `=` semantics: values of different types are unequal
    (bools are not numbers). None is type-compatible with anything.
    Attr fields are stringly-stored but may hold numbers (the
    reference's custom fields are untyped, query_test.clj:252-263
    ``paws = 4``), so numeric literals compare through a try-cast —
    see ``_attr_numeric_eq``."""
    if value is None:
        return False
    k = _kind(field)
    if isinstance(value, bool):
        return True  # no boolean-typed event fields
    if isinstance(value, (int, float)):
        return k in ("string", "tags")
    return k in ("numeric", "tags")  # string literal


def _attr_numeric_eq(field: str, value) -> bool:
    """True when ``field = value`` must compare an attr value
    numerically (try-cast both engines; uncastable → unequal)."""
    return (
        _kind(field) == "attr"
        and isinstance(value, (int, float))
        and not isinstance(value, bool)
    )


def _ordered_comparable(field: str, value) -> bool:
    """number?-guarded ordered comparison: needs a numeric literal and
    a numeric-capable field (attr values try-cast from string)."""
    return (
        isinstance(value, (int, float))
        and not isinstance(value, bool)
        and _kind(field) in ("numeric", "attr")
    )


def _field_col(name: str) -> Column:
    if name in CORE_FIELDS:
        return F.col(name)
    return F.col("attributes").getItem(name)


def _like_to_regex(pattern: str) -> str:
    """`%`-wildcard LIKE → anchored regex (only % is magic)."""
    parts = pattern.split("%")
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"


def to_column(ast) -> Column:
    """Compile a parsed query AST into a pyspark boolean Column."""
    if ast is True:
        return F.lit(True)
    if ast is False or ast is None:
        return F.lit(False)
    head = ast[0]
    if head == "and":
        out = to_column(ast[1])
        for sub in ast[2:]:
            out = out & to_column(sub)
        return out
    if head == "or":
        out = to_column(ast[1])
        for sub in ast[2:]:
            out = out | to_column(sub)
        return out
    if head == "not":
        # NOT with three-valued logic: riemann's compiled fns are
        # two-valued, so coalesce NULL comparisons to false first.
        return ~F.coalesce(to_column(ast[1]), F.lit(False))
    if head == "tagged":
        return F.coalesce(F.array_contains(F.col("tags"), F.lit(ast[1])), F.lit(False))

    op, field, value = ast
    col = _field_col(field)
    if op == "=":
        if _eq_type_mismatch(field, value):
            return F.lit(False)
        if _attr_numeric_eq(field, value):
            return col.try_cast("double").eqNullSafe(F.lit(float(value)))
        return col.eqNullSafe(F.lit(value)) if value is not None else col.isNull()
    if op == "!=":
        if _eq_type_mismatch(field, value):
            return F.lit(True)
        if _attr_numeric_eq(field, value):
            return ~col.try_cast("double").eqNullSafe(F.lit(float(value)))
        return ~col.eqNullSafe(F.lit(value)) if value is not None else col.isNotNull()
    if op in _ORDERED:
        if not _ordered_comparable(field, value):
            return F.lit(False)
        if _kind(field) == "attr":
            col = col.try_cast("double")
        lit = F.lit(value)
        if op == "<":
            return col < lit
        if op == ">":
            return col > lit
        if op == "<=":
            return col <= lit
        return col >= lit
    if op in ("=~", "~="):
        if _kind(field) in ("numeric", "tags"):
            return F.lit(False)  # string?-guarded (query.clj:160-165)
        return col.rlike(_like_to_regex(value) if op == "=~" else value)
    raise ValueError(f"unknown AST node: {ast!r}")


# ---------------------------------------------------------------- SQL ----

def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_lit(value) -> str:
    if value is None:
        return "NULL"
    if value is True:
        return "TRUE"
    if value is False:
        return "FALSE"
    if isinstance(value, str):
        return _sql_str(value)
    return repr(value)


def to_sql(ast, dialect: str = "duckdb") -> str:
    """Compile the AST to a SQL boolean expression (spark or duckdb).

    Used both to run the same predicate through ``spark.sql`` and to
    generate the DuckDB oracle for correctness checks.
    """
    if ast is True:
        return "TRUE"
    if ast is False or ast is None:
        return "FALSE"
    head = ast[0]
    if head in ("and", "or"):
        joiner = f" {head.upper()} "
        return "(" + joiner.join(to_sql(sub, dialect) for sub in ast[1:]) + ")"
    if head == "not":
        return f"(NOT COALESCE({to_sql(ast[1], dialect)}, FALSE))"
    if head == "tagged":
        if dialect == "duckdb":
            return f"COALESCE(list_contains(tags, {_sql_str(ast[1])}), FALSE)"
        return f"COALESCE(array_contains(tags, {_sql_str(ast[1])}), FALSE)"

    op, field, value = ast
    col = field if field in CORE_FIELDS else f"attributes['{field}']"
    lit = _sql_lit(value)
    if op == "=":
        if _eq_type_mismatch(field, value):
            return "FALSE"
        if _attr_numeric_eq(field, value):
            col, lit = f"TRY_CAST({col} AS DOUBLE)", _sql_lit(float(value))
        if value is None:
            return f"({col} IS NULL)"
        if dialect == "duckdb":
            return f"({col} IS NOT DISTINCT FROM {lit})"
        return f"({col} <=> {lit})"
    if op == "!=":
        if _eq_type_mismatch(field, value):
            return "TRUE"
        if _attr_numeric_eq(field, value):
            col, lit = f"TRY_CAST({col} AS DOUBLE)", _sql_lit(float(value))
        if value is None:
            return f"({col} IS NOT NULL)"
        if dialect == "duckdb":
            return f"({col} IS DISTINCT FROM {lit})"
        return f"(NOT ({col} <=> {lit}))"
    if op in _ORDERED:
        if not _ordered_comparable(field, value):
            return "FALSE"
        if _kind(field) == "attr":
            col = f"TRY_CAST({col} AS DOUBLE)"
        return f"({col} {op} {lit})"
    if op in ("=~", "~="):
        if _kind(field) in ("numeric", "tags"):
            return "FALSE"
        pat = _like_to_regex(value) if op == "=~" else value
        if dialect == "duckdb":
            return f"regexp_matches({col}, {_sql_str(pat)})"
        return f"({col} RLIKE {_sql_str(pat)})"
    raise ValueError(f"unknown AST node: {ast!r}")


# ------------------------------------------------------------ python ----

def to_predicate(ast):
    """Compile the AST to a plain-Python ``event dict -> bool``.

    The serving-side backend: per-connection subscription filters in
    the ws/SSE/TCP-query endpoints evaluate events one at a time on
    the driver (the reference compiles queries to Clojure fns the same
    way, query.clj:103-160). Matches ``to_column`` semantics: nil-safe
    ``=``, nil-guarded ordered comparisons, two-valued NOT.
    """
    if ast is True:
        return lambda e: True
    if ast is False or ast is None:
        return lambda e: False
    head = ast[0]
    if head in ("and", "or"):
        subs = [to_predicate(s) for s in ast[1:]]
        if head == "and":
            return lambda e: all(p(e) for p in subs)
        return lambda e: any(p(e) for p in subs)
    if head == "not":
        sub = to_predicate(ast[1])
        return lambda e: not sub(e)
    if head == "tagged":
        tag = ast[1]
        return lambda e: tag in (e.get("tags") or ())

    op, field, value = ast
    if field in CORE_FIELDS:
        get = lambda e: e.get(field)  # noqa: E731
    else:
        get = lambda e: (e.get("attributes") or {}).get(field)  # noqa: E731
    if op in ("=", "!="):
        if _eq_type_mismatch(field, value):
            return (lambda e: False) if op == "=" else (lambda e: True)
        if _attr_numeric_eq(field, value):
            want = float(value)

            def attr_eq(e):
                v = get(e)
                try:
                    return float(v) == want  # mirror TRY_CAST AS DOUBLE
                except (TypeError, ValueError):
                    return False

            return attr_eq if op == "=" else (lambda e: not attr_eq(e))
        if op == "=":
            return lambda e: get(e) == value if value is not None else get(e) is None
        return lambda e: get(e) != value if value is not None else get(e) is not None
    if op in _ORDERED:
        if not _ordered_comparable(field, value):
            return lambda e: False
        import operator

        cmp = {"<": operator.lt, ">": operator.gt, "<=": operator.le, ">=": operator.ge}[op]
        is_attr = _kind(field) == "attr"

        def ordered(e):
            v = get(e)
            if v is None:
                return False
            if is_attr:  # map values are strings: mirror TRY_CAST
                try:
                    v = float(v)
                except (TypeError, ValueError):
                    return False
            try:
                return bool(cmp(v, value))
            except TypeError:
                return False

        return ordered
    if op in ("=~", "~="):
        if _kind(field) in ("numeric", "tags"):
            return lambda e: False
        rx = re.compile(_like_to_regex(value) if op == "=~" else value)

        def matches(e):
            v = get(e)
            return isinstance(v, str) and rx.search(v) is not None

        return matches
    raise ValueError(f"unknown AST node: {ast!r}")
