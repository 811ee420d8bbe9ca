"""Window + fold golden cases (streams.clj §2.4, folds.clj §2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riemann_spark.operators import folds, windows
from tests.conftest import events, metrics


def _seq(spark, vals, dt=1.0, **common):
    return events(
        spark, *({"metric": float(v), "time": float(i) * dt, **common} for i, v in enumerate(vals))
    )


def test_fixed_offset_time_window(spark):
    df = _seq(spark, [1, 2, 3, 4], dt=7.0)  # times 0,7,14,21 → buckets 0,0,10,20
    out = windows.fixed_offset_time_window(df, 10.0)
    assert metrics(out, "window_start") == [0.0, 0.0, 10.0, 20.0]


def test_time_bucket_fractional_interval(spark):
    # fractional dt must not collapse to bucket 0 (long-cast truncation)
    df = _seq(spark, [1, 2, 3, 4], dt=0.3)  # times 0, .3, .6, .9
    out = windows.fixed_offset_time_window(df, 0.5)
    assert metrics(out, "window_start") == [0.0, 0.0, 0.5, 0.5]
    with pytest.raises(ValueError):
        windows.time_bucket(0.0)


def test_fixed_time_window_anchored(spark):
    # anchored at first event's time (streams.clj:409-418), here t=5
    df = events(
        spark,
        {"metric": 1.0, "time": 5.0},
        {"metric": 2.0, "time": 14.0},
        {"metric": 3.0, "time": 15.0},
    )
    out = windows.fixed_time_window(df, 10.0)
    assert metrics(out, "window_start") == [5.0, 5.0, 15.0]


def test_fixed_event_window(spark):
    df = _seq(spark, range(7))
    out = windows.fixed_event_window(df, 3)
    assert metrics(out, "window_id") == [0, 0, 0, 1, 1, 1, 2]


def test_moving_event_window_agg(spark):
    df = _seq(spark, [1, 2, 3, 4])
    w = windows.moving_event_window(2)
    out = df.select("event_id", F.sum("metric").over(w).alias("s"))
    assert metrics(out, "s") == [1.0, 3.0, 5.0, 7.0]


def test_moving_time_window_agg(spark):
    df = events(
        spark,
        {"metric": 1.0, "time": 0.0},
        {"metric": 2.0, "time": 4.0},
        {"metric": 4.0, "time": 5.0},
        {"metric": 8.0, "time": 20.0},
    )
    w = windows.moving_time_window(5.0)
    out = df.select("event_id", F.sum("metric").over(w).alias("s"))
    assert metrics(out, "s") == [1.0, 3.0, 7.0, 8.0]


def test_folds_family(spark):
    df = _seq(spark, [1, 2, 2, 4, 6])
    row = df.agg(
        folds.dsum().alias("sum"),
        folds.dmean().alias("mean"),
        folds.fmedian().alias("median"),
        folds.fmode().alias("mode"),
        folds.dstddev_pop().alias("sd"),
        folds.fmin().alias("mn"),
        folds.fmax().alias("mx"),
        folds.fcount().alias("n"),
        folds.fproduct().alias("prod"),
    ).collect()[0]
    assert row["sum"] == 15.0 and row["mean"] == 3.0
    assert row["median"] == 2.0 and row["mode"] == 2.0
    assert row["sd"] == pytest.approx((16.0 / 5) ** 0.5)
    assert (row.mn, row.mx, row.n) == (1.0, 6.0, 5)
    assert row.prod == pytest.approx(96.0)


def test_folds_null_tolerant(spark):
    # nil-friendly variants skip null metrics (folds.clj:1-14)
    df = events(spark, {"metric": 1.0}, {"metric": None}, {"metric": 3.0})
    row = df.agg(folds.dsum().alias("s"), folds.dmean().alias("m")).collect()[0]
    assert row.s == 4.0 and row.m == 2.0


def test_sorted_sample_points(spark):
    df = _seq(spark, [1, 2, 3, 4, 5])
    row = df.agg(folds.sorted_sample_points("metric", [0.0, 0.5, 1.0]).alias("q")).collect()[0]
    assert row.q == [1.0, 3.0, 5.0]


def test_mode_tie_deterministic(spark):
    # ties → smallest value wins
    df = _seq(spark, [5, 5, 2, 2, 9])
    assert df.agg(folds.fmode().alias("m")).collect()[0].m == 2.0


def test_modes_returns_all_tied(spark):
    # modes (folds.clj:170-179): every value at the top count, sorted
    df = _seq(spark, [5, 5, 2, 2, 9])
    assert df.agg(folds.fmodes().alias("m")).collect()[0].m == [2.0, 5.0]
    one = _seq(spark, [1, 1, 3])
    assert one.agg(folds.fmodes().alias("m")).collect()[0].m == [1.0]


def test_fold_metrics_generic(spark):
    df = _seq(spark, [1, 2, 3])
    row = df.agg(
        folds.fold_metrics("metric", 0.0, lambda acc, x: acc + x * x).alias("ss")
    ).collect()[0]
    assert row.ss == 14.0


def test_salted_agg_matches_plain(spark):
    from riemann_spark.operators.skew import salted_agg
    from tests.conftest import events as _events

    df = _events(
        spark,
        *(
            {"host": "hot" if i % 4 else "cold", "metric": float(i), "time": float(i)}
            for i in range(40)
        ),
    )
    import pyspark.sql.functions as F

    salted = salted_agg(
        df,
        ["host"],
        {"s": F.sum(folds._d("metric")), "n": F.count(F.lit(1))},
        {"s": F.sum(F.col("s")).cast("double"), "n": F.sum(F.col("n"))},
    )
    plain = df.groupBy("host").agg(
        folds.dsum().alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = {(r.host): (r.s, r.n) for r in salted.collect()}
    b = {(r.host): (r.s, r.n) for r in plain.collect()}
    assert a == b


def test_sessionize_gap_splitting(spark):
    from riemann_spark.operators.windows import sessionize

    rows = [
        (0, "a", 0.0, 1.0), (1, "a", 100.0, 2.0), (2, "a", 150.0, 3.0),
        (3, "a", 400.0, 4.0),           # gap 250s > 200 → new session
        (4, "b", 0.0, 5.0),
    ]
    df = spark.createDataFrame(
        [(i, h, int(t * 1e6), m) for i, h, t, m in rows],
        "event_id long, host string, time_us long, metric double",
    )
    out = {
        (r["host"], r["session_id"]): (r["n_events"], r["t_start"], r["t_end"], r["sum_metric"])
        for r in sessionize(df, 200.0).collect()
    }
    assert out[("a", 1)] == (3, 0, 150_000_000, 6.0)
    assert out[("a", 2)] == (1, 400_000_000, 400_000_000, 4.0)
    assert out[("b", 1)] == (1, 0, 0, 5.0)


def test_folds_match_python_reference_on_random_vectors(spark):
    """Seeded random vectors, one Spark job: every fold vs a plain
    Python evaluation of the reference semantics (folds.clj)."""
    import math
    import random

    rnd = random.Random(42)
    groups = {}
    rows = []
    for g in range(40):
        n = rnd.randint(1, 12)
        xs = [round(rnd.uniform(-5, 50), 3) for _ in range(n)]
        groups[g] = xs
        rows += [(g, i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, event_id long, metric double")
    df = df.withColumn("time", F.col("event_id").cast("double"))

    got = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            folds.fmedian().alias("median"),
            folds.fmode().alias("mode"),
            folds.fmodes().alias("modes"),
            folds.fdifference().alias("difference"),
            folds.fquotient().alias("quotient"),
            folds.fmin().alias("mn"),
            folds.fmax().alias("mx"),
        )
        .collect()
    }
    for g, xs in groups.items():
        r = got[g]
        # mode/modes: max count, ties -> smallest
        from collections import Counter
        cnt = Counter(xs)
        top = max(cnt.values())
        tied = sorted(v for v, c in cnt.items() if c == top)
        assert r.mode == tied[0], (g, xs)
        assert r.modes == tied, (g, xs)
        assert r.mn == min(xs) and r.mx == max(xs)
        # difference: first - sum(rest)  (folds.clj:115-126)
        assert r.difference == pytest.approx(xs[0] - sum(xs[1:]), abs=1e-9)
        # quotient: first / product(rest); zero DIVISOR -> null
        # (folds.clj:128-145 catches the ArithmeticException); zero
        # first over nonzero rest is plain 0; negatives divide with
        # rational-arithmetic signs (folds_test.clj quotient-test)
        if any(x == 0 for x in xs[1:]):
            assert r.quotient is None, (g, xs)
        else:
            want = xs[0]
            for x in xs[1:]:
                want /= x
            assert r.quotient == pytest.approx(want, rel=1e-9), (g, xs)
        # median: exact element selection parity is covered by the
        # sorted_sample catalog row; here interpolated percentile
        s = sorted(xs)
        k = (len(s) - 1) * 0.5
        lo, hi = s[math.floor(k)], s[math.ceil(k)]
        assert r.median == pytest.approx(lo + (hi - lo) * (k - math.floor(k)))
