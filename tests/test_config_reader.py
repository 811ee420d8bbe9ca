"""The config reader compiles real riemann .config stream forms onto
DataFrames — tested against the SHIPPED reference config (read from
/root/reference at test time, not copied) and a synthetic config
exercising the wider combinator subset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators import analytics, index, stateless
from riemann_spark.query.config_reader import (
    compile_pred,
    load_config,
    parse_forms,
)
from riemann_spark.schema import load_events

SF = "/root/testdata/sf0.001"
SHIPPED = "/root/reference/config/riemann.config"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF)


def test_reader_parses_shipped_config():
    forms = parse_forms(open(SHIPPED).read())
    heads = [f[0].name for f in forms if isinstance(f, tuple) and f]
    # every top-level form of the real config is recognized
    assert "let" in heads and "tcp-server" in heads and "tests" in heads


def test_shipped_config_compiles_and_matches_handbuilt(spark, events):
    topo = load_config(open(SHIPPED).read(), events)
    # (let [index (tap :index (index))] ...) → tap registered
    assert "index" in topo.taps
    # (expired #(prn ...)) → side-effect leaf captured as a sink
    assert any(k.startswith("expired") for k in topo.sinks)
    assert topo.index is not None

    # hand-built equivalent of the config's stream tree
    hand = index.build_index(
        stateless.where(
            stateless.default(events, {"ttl": 3.0}),
            ~F.coalesce(F.col("service").rlike("^riemann "), F.lit(False)),
        )
    )
    got = sorted((r.host, r.service, r.metric) for r in topo.index.collect())
    want = sorted((r.host, r.service, r.metric) for r in hand.collect())
    assert got == want and len(got) > 0


def test_predicate_sublanguage(spark, events):
    cases = [
        ('(and (> metric 50) (not (service #"^p")))',
         (F.col("metric") > 50) & ~F.coalesce(F.col("service").rlike("^p"), F.lit(False))),
        ('(or (= state "critical") (tagged "high"))',
         (F.col("state") == "critical")
         | F.array_contains(F.coalesce(F.col("tags"), F.array()), "high")),
        ('(>= (:metric event) 100)', F.col("metric") >= 100),
    ]
    for src, col in cases:
        (form,) = parse_forms(src)
        got = events.filter(compile_pred(form)).count()
        want = events.filter(col).count()
        assert got == want, src


def test_wider_combinator_subset(spark, events):
    cfg = """
(streams
  (where (> metric 100)
    (by [:host :service]
      (rate 3600 index))
    (changed-state {:init "ok"}
      (throttle 5 3600 (email "oncall@example.com")))))
"""
    topo = load_config(cfg, events)
    assert topo.index is not None
    hot = events.filter(F.col("metric") > 100)
    # rate leaf landed in the index (rate emits window rows; build_index
    # keys on host/service which rate preserves)
    assert topo.index.count() > 0
    # the email sink received throttled state transitions
    (sink_df,) = [v for k, v in topo.sinks.items() if k.startswith("email")]
    want = analytics.throttle(
        analytics.changed_state(hot, init="ok"), 5, 3600.0
    ).count()
    assert sink_df.count() == want > 0


def test_unsupported_forms_raise_loudly(spark, events):
    with pytest.raises(ValueError, match="unsupported stream op"):
        load_config('(streams (exception-stream index))', events)
    with pytest.raises(ValueError, match="unsupported predicate"):
        load_config('(streams (where (fancy-fn 1) index))', events)


def test_where_else_clause(spark, events):
    cfg = """
(streams
  (where (= state "critical")
    (email "page")
    (else (email "archive"))))
"""
    topo = load_config(cfg, events)
    page = [v for k, v in topo.sinks.items() if k.startswith("email")][0]
    arch = [v for k, v in topo.sinks.items() if k.startswith("email")][1]
    n_crit = events.filter(F.col("state") == "critical").count()
    assert page.count() == n_crit > 0
    assert arch.count() == events.count() - n_crit


def test_over_under_percentiles_splitp(spark, events):
    cfg = """
(streams
  (over 300 (email "big"))
  (percentiles 86400 [0.5 0.95] index)
  (splitp < metric
    50  (email "low")
    150 (email "mid")
    (email "high")))
"""
    topo = load_config(cfg, events)
    emails = [v for k, v in sorted(topo.sinks.items()) if k.startswith("email")]
    big, low, mid, high = emails
    assert big.count() == events.filter(F.col("metric") > 300).count() > 0
    assert low.count() == events.filter(F.col("metric") < 50).count()
    assert mid.count() == events.filter(
        (F.col("metric") >= 50) & (F.col("metric") < 150)).count()
    assert high.count() == events.filter(F.col("metric") >= 150).count()
    assert low.count() + mid.count() + high.count() == events.count()
    assert topo.index.count() > 0    # percentile events indexed per point


def test_ewma_and_coalesce(spark, events):
    cfg = """
(streams
  (ewma-timeless 0.5 (email "smoothed"))
  (coalesce 5 (email "latest")))
"""
    topo = load_config(cfg, events)
    sm = [v for k, v in sorted(topo.sinks.items()) if k.startswith("email")][0]
    la = [v for k, v in sorted(topo.sinks.items()) if k.startswith("email")][1]
    assert sm.count() == events.count()       # ewma re-emits every event
    n_keys = events.select("host", "service").distinct().count()
    assert la.count() == n_keys               # coalesce snapshot: one/key


def test_split_general_predicates(spark, events):
    cfg = """
(streams
  (split
    (= state "critical") (email "page")
    (> metric 150)       (email "warn")
    (email "rest")))
"""
    topo = load_config(cfg, events)
    page, warn, rest = [v for k, v in sorted(topo.sinks.items())]
    n_crit = events.filter(F.col("state") == "critical").count()
    n_warn = events.filter(
        (F.col("state") != "critical") & (F.col("metric") > 150)).count()
    assert page.count() == n_crit
    assert warn.count() == n_warn     # first-match-wins: critical excluded
    assert page.count() + warn.count() + rest.count() == events.count()


def test_adjust_arithmetic(spark, events):
    cfg = '(streams (adjust [:metric * 2.0] (email "doubled")))'
    topo = load_config(cfg, events)
    (sink,) = topo.sinks.values()
    got = sink.agg(F.sum(F.col("metric").cast("decimal(38,6)")).cast("double")).collect()[0][0]
    want = events.agg(
        F.sum((F.col("metric") * 2.0).cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert got == want
    with pytest.raises(ValueError, match="unsupported adjust fn"):
        load_config('(streams (adjust [:metric log] index))', events)


def test_with_and_default_map_forms(spark, events):
    cfg = """
(streams
  (with {:state "forced" :description "note"} (email "w"))
  (default {:ttl 9} (email "d")))
"""
    topo = load_config(cfg, events)
    w = [v for k, v in sorted(topo.sinks.items()) if k.startswith("email")][0]
    d = [v for k, v in sorted(topo.sinks.items()) if k.startswith("email")][1]
    assert w.select("state").distinct().collect()[0][0] == "forced"
    assert w.select("description").distinct().collect()[0][0] == "note"
    # default only fills nulls; events carry ttl, so unchanged
    assert d.filter(F.col("ttl") == 9.0).count() == 0


def test_inject_style_harness(spark):
    """run_config_test = the reference's inject! (test.clj:131-153):
    compile a config with (tap ...) points, feed literal events,
    assert per-tap captures — the one-call migration-parity check."""
    from riemann_spark.query.config_reader import lookup, run_config_test

    cfg = """
(streams
  (where (> metric 50)
    (tap :hot (index))
    (changed-state {:init "ok"}
      (tap :transitions (index)))))
"""
    rs = run_config_test(spark, cfg, [
        {"time": 1, "host": "a", "service": "cpu", "metric": 10.0, "state": "ok"},
        {"time": 2, "host": "a", "service": "cpu", "metric": 90.0, "state": "warn"},
        {"time": 3, "host": "a", "service": "cpu", "metric": 95.0, "state": "warn"},
        {"time": 4, "host": "b", "service": "cpu", "metric": 60.0, "state": "ok"},
    ])
    assert set(rs) == {"hot", "transitions"}
    # :hot saw the three >50 events, time-ordered
    assert [e["time"] for e in rs["hot"]] == [2.0, 3.0, 4.0]
    assert all(e["metric"] > 50 for e in rs["hot"])
    # changed-state with init "ok": warn@2 is a transition, warn@3 is
    # not, b's ok@4 matches init so it isn't
    assert [(e["host"], e["time"], e["state"]) for e in rs["transitions"]] == [
        ("a", 2.0, "warn")
    ]
    # lookup (test.clj:154-166): last matching event wins
    assert lookup(rs["hot"], "a", "cpu")["time"] == 3.0
    assert lookup(rs["hot"], "nope", "cpu") is None


def test_inject_harness_custom_attributes_and_dup_taps(spark):
    """Extra dict keys become custom attributes; the same tap name at
    two points appends to one capture like the shared results atom."""
    from riemann_spark.query.config_reader import run_config_test

    cfg = """
(streams
  (where (tagged "prod")
    (tap :seen (index)))
  (where (> metric 0)
    (tap :seen (index))))
"""
    rs = run_config_test(spark, cfg, [
        {"time": 1, "host": "h", "service": "s", "metric": 1.0,
         "tags": ["prod"], "datacenter": "ams"},
    ])
    assert len(rs["seen"]) == 2  # captured at both tap points
    assert all(e["attributes"] == {"datacenter": "ams"} for e in rs["seen"])


def test_inject_harness_on_shipped_config(spark):
    """The SHIPPED reference config runs through the harness unchanged:
    its (tap :index (index)) captures exactly the non-riemann events."""
    from riemann_spark.query.config_reader import run_config_test

    rs = run_config_test(spark, open(SHIPPED).read(), [
        {"time": 1, "host": "a", "service": "riemann streams rate", "metric": 1.0},
        {"time": 2, "host": "a", "service": "api latency", "metric": 3.5},
    ])
    assert [e["service"] for e in rs["index"]] == ["api latency"]
    # the config's (default :ttl 3 ...) stamped the default ttl
    assert rs["index"][0]["ttl"] == 3.0


def test_inject_harness_matches_shipped_configs_own_deftest(spark):
    """The reference config SHIPS its own (tests (deftest index-test
    (inject! ...))) block — run that exact vector through the harness:
    inject {:service "test" :time 1} and expect {:index [{:service
    "test" :time 1 :ttl 3}]}."""
    from riemann_spark.query.config_reader import run_config_test

    rs = run_config_test(spark, open(SHIPPED).read(),
                         [{"service": "test", "time": 1}])
    got = [{k: e[k] for k in ("service", "time", "ttl")} for e in rs["index"]]
    assert got == [{"service": "test", "time": 1.0, "ttl": 3.0}]
