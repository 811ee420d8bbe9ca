"""Query language conformance — table-driven string→AST→matches pairs
mirroring the reference suite (test/riemann/query_test.clj:6-160)."""

from __future__ import annotations

import pytest

from riemann_spark.query import compile_query, parse, to_column, to_sql
from riemann_spark.query.parser import QueryParseError
from tests.conftest import events

AST_CASES = [
    ("true", True),
    ("false", False),
    ('host = "foo"', ("=", "host", "foo")),
    ("metric = 1", ("=", "metric", 1)),
    ("metric = 1.5", ("=", "metric", 1.5)),
    ("metric = -1.5e2", ("=", "metric", -150.0)),
    ("metric = 7N", ("=", "metric", 7)),
    ("metric = nil", ("=", "metric", None)),
    ("metric = null", ("=", "metric", None)),
    ("metric >= 2.5", (">=", "metric", 2.5)),
    ("metric != 4", ("!=", "metric", 4)),
    ('service =~ "%foo%"', ("=~", "service", "%foo%")),
    ('state ~= "^mi"', ("~=", "state", "^mi")),
    ('tagged "cat"', ("tagged", "cat")),
    (
        'host = 1 or state = 2',
        ("or", ("=", "host", 1), ("=", "state", 2)),
    ),
    (
        "not ((host = 1 or host = 2) and host = 3)",
        (
            "not",
            ("and", ("or", ("=", "host", 1), ("=", "host", 2)), ("=", "host", 3)),
        ),
    ),
    # unicode string (query_test.clj:42)
    ('host = "ş"', ("=", "host", "ş")),
    # full escape set (query_test.clj:40-41)
    ('state = "\\b\\t\\n\\f\\r"', ("=", "state", "\b\t\n\f\r")),
    ('state = " \\" \\\\ "', ("=", "state", ' " \\ ')),
    # custom attribute field
    ('custom_key = "v"', ("=", "custom_key", "v")),
]


@pytest.mark.parametrize("query,expected", AST_CASES)
def test_ast(query, expected):
    assert parse(query) == expected


@pytest.mark.parametrize("bad", ["host =", "and", "host ~ 1", '(host = 1', "metric > "])
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse(bad)


MATCH_FIXTURE = [
    dict(host="a", service="api", state="ok", metric=1.0, tags=["cat", "dog"], time=1.0),
    dict(host="b", service="api req", state="warning", metric=2.5, time=2.0),
    dict(host=None, service="mill", state="critical", metric=None, time=3.0),
    dict(host="ş", service="unicode", state="ok", metric=-150.0, time=4.0),
]

MATCH_CASES = [
    ("true", [0, 1, 2, 3]),
    ("false", []),
    ('host = "a"', [0]),
    ("host = nil", [2]),
    ("host != nil", [0, 1, 3]),
    # != matches null fields too (riemann: (not (= nil "a")) is true)
    ('host != "a"', [1, 2, 3]),
    ("metric > 1", [1]),
    ("metric >= 1", [0, 1]),
    ("metric < 0", [3]),
    ('service =~ "%req%"', [1]),
    ('service =~ "api%"', [0, 1]),
    ('state ~= "^w"', [1]),
    ('tagged "cat"', [0]),
    ('tagged "bird"', []),
    ('host = "a" or metric > 2', [0, 1]),
    ('not (host = "a")', [1, 2, 3]),
    ('host = "ş"', [3]),
    ("metric = -1.5e2", [3]),
]


@pytest.mark.parametrize("query,expected_ids", MATCH_CASES)
def test_matches(spark, query, expected_ids):
    df = events(spark, *MATCH_FIXTURE)
    got = sorted(r[0] for r in df.filter(compile_query(query)).select("event_id").collect())
    assert got == expected_ids, query


@pytest.mark.parametrize("query,expected_ids", MATCH_CASES)
def test_sql_dialect_matches(spark, query, expected_ids):
    """The spark-SQL rendering of each predicate selects the same rows."""
    df = events(spark, *MATCH_FIXTURE)
    df.createOrReplaceTempView("qev")
    sql = to_sql(parse(query), "spark")
    got = sorted(
        r[0]
        for r in spark.sql(f"SELECT event_id FROM qev WHERE {sql}").collect()
    )
    assert got == expected_ids, query


@pytest.mark.parametrize("query,expected_ids", MATCH_CASES)
def test_python_predicate_matches(query, expected_ids):
    """The driver-side python backend (serving endpoints) selects the
    same events as the Column backend."""
    from riemann_spark.query.compiler import to_predicate

    pred = to_predicate(parse(query))
    got = [i for i, e in enumerate(MATCH_FIXTURE) if pred(e)]
    assert got == expected_ids, query


# ---------------------------------------------------------------- #
# property test: the three backends agree on arbitrary queries

def _hyp_strategies():
    from hypothesis import strategies as st

    fields = st.sampled_from(["host", "service", "state", "metric", "time", "zone"])
    strs = st.sampled_from(['"a"', '"api"', '"w%"', '"^w"', '"x y"'])
    nums = st.sampled_from(["1", "2.5", "-150", "0"])
    ops = st.sampled_from(["=", "!=", "<", ">", "<=", ">="])

    simple = st.one_of(
        st.builds(lambda f, o, v: f"{f} {o} {v}", fields, ops, nums),
        st.builds(lambda f, v: f"{f} = {v}", fields, strs),
        st.builds(lambda f, v: f"{f} =~ {v}", fields, strs),
        st.builds(lambda v: f"tagged {v}", st.sampled_from(['"cat"', '"x"'])),
        st.sampled_from(["true", "false", "host = nil", "metric != nil"]),
    )

    def combine(children):
        return st.one_of(
            st.builds(lambda a, b: f"({a} and {b})", children, children),
            st.builds(lambda a, b: f"({a} or {b})", children, children),
            st.builds(lambda a: f"not ({a})", children),
        )

    return st.recursive(simple, combine, max_leaves=6)


@pytest.mark.slow
def test_three_backends_agree_on_random_queries(spark):
    """Column (Catalyst), SQL, and python-predicate backends must
    select identical row sets for arbitrary well-formed queries."""
    from hypothesis import HealthCheck, given, settings
    from riemann_spark.query.compiler import to_predicate

    df = events(spark, *MATCH_FIXTURE)
    df.createOrReplaceTempView("qev3")
    fixture = MATCH_FIXTURE

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(q=_hyp_strategies())
    def run(q):
        ast = parse(q)
        col_ids = sorted(r[0] for r in df.filter(to_column(ast)).select("event_id").collect())
        sql_ids = sorted(
            r[0]
            for r in spark.sql(
                f"SELECT event_id FROM qev3 WHERE {to_sql(ast, 'spark')}"
            ).collect()
        )
        py_ids = [i for i, e in enumerate(fixture) if to_predicate(ast)(e)]
        assert col_ids == sql_ids == py_ids, q

    run()


@pytest.mark.parametrize(
    "query,expected_ids",
    [
        ('host = 1', []),            # cross-type =: false, not a cast error
        ('host != 1', [0, 1, 2, 3]),  # (not (= host 1)) matches everything
        ('host > 1', []),            # number?-guard: string field never orders
        ('metric =~ "1%"', []),      # string?-guard: no regex on numbers
        ("metric = true", []),       # bools equal nothing in the event model
    ],
)
def test_reference_type_guard_semantics(spark, query, expected_ids):
    """query.clj:184-189 runtime guards, compiled as constant folds:
    cross-type comparisons are FALSE (never errors), in all three
    backends."""
    from riemann_spark.query.compiler import to_predicate

    df = events(spark, *MATCH_FIXTURE)
    ast = parse(query)
    assert sorted(r[0] for r in df.filter(to_column(ast)).select("event_id").collect()) == expected_ids
    df.createOrReplaceTempView("qev4")
    assert sorted(
        r[0] for r in spark.sql(f"SELECT event_id FROM qev4 WHERE {to_sql(ast, 'spark')}").collect()
    ) == expected_ids
    assert [i for i, e in enumerate(MATCH_FIXTURE) if to_predicate(ast)(e)] == expected_ids
