"""Streaming analytics operators, batch form (SURVEY.md §2.6).

These are the reference's stateful per-event operators re-expressed as
Window functions and grouped aggregations. Batch is the semantics
oracle; the streaming module reuses the same logic with state stores.

Scale notes: every operator here is one shuffle (partitionBy key) +
in-partition sort; nothing collects to the driver; lag/row_number/
running sums are single-pass over sorted partitions, and Spark
external-sorts partitions that exceed memory. Skewed keys are handled
by AQE; operators that window *per key* (the common case — riemann's
``by`` wraps everything, streams.clj:1556-1583) parallelize across the
key space exactly like the reference's per-key fork tables, but
distributed.

Reference mapping (streams.clj unless noted):
rate:841-883 percentiles:885-898 counter:900-932 ewma-timeless:961-977
ewma:979-1013 ddt-events:809-822 ddt-real:776-807 changed:1614-1653
changed-state:1655-1659 runs:1918-1934 stable:1936-2030 top:1015-1100
throttle:1102-1118 rollup:1120-1156 apdex:2103-2157 clock-skew:2159-2195
predict-linear:2197-2248 fill-in:683-751 interpolate-constant:753-774
sreduce:206-250 project:2073-2101 coalesce:1209-1241.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from riemann_spark.operators.folds import _d, dsum
from riemann_spark.operators.windows import time_bucket
from riemann_spark.query import compile_query

KEY = ("host", "service")


def _kw(keys: Sequence[str], time_col: str = "time", order_col: str = "event_id"):
    """Per-key event-order window (time, deterministic tiebreak)."""
    return Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(time_col), F.col(order_col)
    )


def rate(
    df: DataFrame,
    interval: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
) -> DataFrame:
    """Per-interval sum(metric)/interval, emitted per window
    (streams.clj:841-883). Exact-decimal sum → deterministic."""
    bucket = time_bucket(interval, time_col).cast("double").alias("window_start")
    return (
        df.groupBy(*keys, bucket)
        .agg((F.sum(_d("metric")).cast("double") / F.lit(float(interval))).alias("rate"))
    )


def percentiles(
    df: DataFrame,
    interval: float,
    points: Sequence[float],
    keys: Sequence[str] = ("service",),
    time_col: str = "time",
) -> DataFrame:
    """Per-interval percentile events; service suffixed with the point
    (streams.clj:885-898, folds.clj:16-49). Output one row per point
    via posexplode over the percentile array."""
    bucket = time_bucket(interval, time_col).cast("double").alias("window_start")
    pts = F.array(*[F.lit(float(p)) for p in points])
    agg = df.groupBy(*keys, bucket).agg(
        F.percentile(F.col("metric"), pts).alias("qs")
    )
    point_lits = F.array(*[F.lit(str(p)) for p in points])
    out = agg.select(
        *keys,
        "window_start",
        F.posexplode(F.col("qs")).alias("pos", "metric"),
    ).withColumn("point", point_lits[F.col("pos")])
    if "service" in keys:
        out = out.withColumn("service", F.concat_ws(" ", F.col("service"), F.col("point")))
    return out.drop("pos")


def counter(
    df: DataFrame,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
    reset_tag: str = "reset",
    init: float = 0.0,
) -> DataFrame:
    """Running sum of metrics per key; a "reset"-tagged event restarts
    the count (streams.clj:900-932). Reset = epoch segmentation: count
    resets seen so far defines an epoch, running sum within epoch.

    ``init`` seeds the first epoch only — a reset event restarts the
    count at its own metric, exactly the reference's
    ``(counter 100)`` vectors (streams_test.clj:144-166)."""
    w = _kw(keys, time_col, order_col)
    is_reset = F.coalesce(F.array_contains(F.col("tags"), reset_tag), F.lit(False))
    df2 = df.withColumn("__epoch", F.sum(is_reset.cast("int")).over(w))
    w2 = Window.partitionBy(*[F.col(k) for k in keys], F.col("__epoch")).orderBy(
        F.col(time_col), F.col(order_col)
    )
    seed = F.when(F.col("__epoch") == 0, F.lit(float(init))).otherwise(F.lit(0.0))
    return df2.withColumn(
        "counter", (F.sum(_d("metric")).over(w2) + seed).cast("double")
    ).drop("__epoch")


def ewma_timeless(
    df: DataFrame,
    r: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
    halflife_window: int | None = None,
) -> DataFrame:
    """EWMA ignoring inter-event time (streams.clj:961-977):
    ewma_n = r·x_n + (1-r)·ewma_{n-1}, seeded at 0.

    Closed form over a bounded look-back of W events; the dropped tail
    weighs (1-r)^W of the state, so W must scale with r. When
    ``halflife_window`` is None it is chosen as
    ceil(log(1e-12)/log(1-r)) — tail weight ≤ 1e-12, below double
    noise — capped at 8192 rows to bound the per-row collect_list
    (r < ~3.4e-3 hits the cap; at the cap the tail still weighs
    ≤ (1-r)^8192). Implemented as Σ r·(1-r)^k·x_{n-k} via aggregate
    over collect_list on the frame — a single window pass, no
    recursion, no state."""
    if halflife_window is None:
        import math

        if not 0.0 <= r <= 1.0:
            raise ValueError(f"ewma_timeless r must be in [0, 1], got {r}")
        if r == 0.0:
            # ewma_n = 0·x_n + 1·ewma_{n-1}, seeded 0 — identically zero
            # (streams_test.clj:1226-1228).
            return df.withColumn("ewma", F.lit(0.0))
        if r == 1.0:
            halflife_window = 1
        else:
            halflife_window = min(8192, max(1, math.ceil(math.log(1e-12) / math.log(1.0 - r))))
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col).desc(), F.col(order_col).desc())
        .rowsBetween(0, halflife_window - 1)
    )
    # newest-first list: weight of element i is r*(1-r)^i
    lst = F.collect_list(F.col("metric")).over(w)
    decay = F.lit(1.0 - r)
    ewma = F.aggregate(
        F.zip_with(
            lst,
            F.sequence(F.lit(0), F.size(lst) - 1),
            lambda x, i: x * F.lit(r) * F.pow(decay, i.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("ewma", ewma)


def ewma_timeless_exact(
    df: DataFrame,
    r: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """ewma-timeless for ANY r, bit-exact to the reference recursion
    ewma_n = r·x_n + (1−r)·ewma_{n−1} (streams.clj:961-977): a strict
    left fold over the per-key prefix — no pow(), so no libm-parity
    drift between engines (pow(0.9, i) differs from JVM Math.pow in
    the last ulp; a fold of fused multiply-adds does not).

    Cost: prefix collect_list per row → O(n²) work per key. This is
    the SEMANTICS ORACLE variant for short per-key streams (alerting
    keys see dozens–hundreds of events); at bulk scale use
    ewma_timeless (bounded window, O(W·n)) or streaming_ewma (true
    O(n) stateful)."""
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = F.collect_list(F.col("metric")).over(w)
    ewma = F.aggregate(
        prefix,
        F.lit(0.0),
        lambda acc, x: F.lit(r) * x + F.lit(1.0 - r) * acc,
    )
    return df.withColumn("ewma", ewma)


def ewma_timeless_half(
    df: DataFrame,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """ewma-timeless specialized to r=1/2 (streams.clj:961-977),
    computed EXACTLY via power-of-two scaling: with s_j = Σ_{i≤j}
    x_i·2^i (running windowed sum), ewma_j = 0.5·2^{-j}·s_j.

    Scaling by powers of two is exact in IEEE754, so this closed form
    reproduces the recursion ewma_j = r·x_j + (1-r)·ewma_{j-1} bit-for-
    bit — O(1) per row, a single running-sum window pass, no state and
    no per-row list materialization. Valid for per-key sequences up to
    ~900 events (2^970 overflow bound); beyond that, segment or use
    ewma_timeless."""
    w = _kw(keys, time_col, order_col)
    rn = F.row_number().over(w)
    df2 = df.withColumn("__rn", rn)
    wsum = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col("__rn")
    ).rowsBetween(Window.unboundedPreceding, 0)
    s = F.sum(F.col("metric") * F.pow(F.lit(2.0), F.col("__rn"))).over(wsum)
    return df2.withColumn(
        "ewma", F.lit(0.5) * F.pow(F.lit(2.0), -F.col("__rn")) * s
    ).drop("__rn")


def ddt_events(
    df: DataFrame,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Discrete derivative between consecutive events per key
    (streams.clj:809-822): (m - lag m)/(t - lag t); first event and
    zero-dt pairs are dropped (reference emits nothing for them)."""
    w = _kw(keys, time_col, order_col)
    dm = F.col("metric") - F.lag("metric").over(w)
    dt = F.col(time_col) - F.lag(time_col).over(w)
    return (
        df.withColumn("ddt", F.try_divide(dm, dt))
        .filter(F.col("ddt").isNotNull() & ~F.isnan(F.col("ddt")))
    )


def ddt_real(
    df: DataFrame,
    interval: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
) -> DataFrame:
    """Derivative sampled every ``interval`` seconds
    (streams.clj:776-807): last metric per interval, then the
    per-interval discrete derivative."""
    bucket = time_bucket(interval, time_col).cast("double").alias("window_start")
    per = df.groupBy(*keys, bucket).agg(
        F.max_by(F.col("metric"), F.struct(F.col(time_col), F.col("event_id"))).alias(
            "last_metric"
        )
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("window_start")
    dm = F.col("last_metric") - F.lag("last_metric").over(w)
    dt = F.col("window_start") - F.lag("window_start").over(w)
    return per.withColumn("ddt", F.try_divide(dm, dt)).filter(F.col("ddt").isNotNull())


def changed(
    df: DataFrame,
    field: str = "state",
    keys: Sequence[str] = KEY,
    init=None,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Emit only events whose ``field`` differs from the previous event's
    (streams.clj:1614-1653). ``init`` seeds the comparison for the
    first event (reference ``:init`` option): with init given, a first
    event equal to init is suppressed; without, the first event always
    passes."""
    w = _kw(keys, time_col, order_col)
    prev = F.lag(field).over(w)
    cur = F.col(field)
    if init is not None:
        changed_pred = ~cur.eqNullSafe(F.coalesce(prev, F.lit(init)))
    else:
        changed_pred = F.when(prev.isNull(), F.lit(True)).otherwise(
            ~cur.eqNullSafe(prev)
        )
    return df.withColumn("__chg", changed_pred).filter(F.col("__chg")).drop("__chg")


def changed_state(df: DataFrame, **kw) -> DataFrame:
    """(by [host service] (changed :state)) — streams.clj:1655-1659."""
    return changed(df, field="state", keys=KEY, **kw)


def runs(
    df: DataFrame,
    n: int,
    field: str = "state",
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Pass the last event of every n-in-a-row with equal ``field``
    (flap damping, streams.clj:1918-1934): the trailing n-event frame
    holds exactly one distinct value."""
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    ok = (F.count(F.lit(1)).over(w) == n) & (
        F.size(F.collect_set(F.col(field)).over(w)) == 1
    )
    return df.withColumn("__ok", ok).filter(F.col("__ok")).drop("__ok")


def stable(
    df: DataFrame,
    dt: float,
    field: str = "state",
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Pass events whose ``field`` value has persisted ≥ dt seconds
    (streams.clj:1936-2030). Run-length sessionization: change flags →
    cumulative run ids → keep events at least dt after their run's
    start (the reference buffers until stability is known; in batch we
    know)."""
    w = _kw(keys, time_col, order_col)
    chg = F.when(
        ~F.col(field).eqNullSafe(F.lag(field).over(w)) | F.lag(field).over(w).isNull(),
        1,
    ).otherwise(0)
    df2 = df.withColumn("__run", F.sum(chg).over(w))
    wrun = Window.partitionBy(*[F.col(k) for k in keys], F.col("__run"))
    run_start = F.min(time_col).over(wrun)
    run_span = F.max(time_col).over(wrun) - run_start
    # run proved stable; emit the events in it that arrived once the
    # value had held for the run (reference emits the whole buffered run
    # once span >= dt, then passes subsequent events through)
    return (
        df2.withColumn("__span", run_span)
        .filter(F.col("__span") >= dt)
        .drop("__run", "__span")
    )


def top(
    df: DataFrame,
    k: int,
    metric_col: str = "metric",
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Top-k of the latest-per-key snapshot by metric
    (streams.clj:1015-1100, snapshot form; demotion diffing is the
    streaming variant). Latest per key → orderBy().limit(k) — the
    TakeOrderedAndProject shape: each partition keeps a local k-heap
    and only k rows per partition reach the final merge, so no global
    single-partition sort of the snapshot even at millions of keys.
    The rank column is attached AFTER the take, when only k rows
    remain (the window there is k-row-bounded, not snapshot-wide)."""
    latest = (
        df.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
                    F.col(time_col).desc(), F.col(order_col).desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    order = [F.col(metric_col).desc(), *[F.col(c) for c in keys]]
    taken = latest.orderBy(*order).limit(k)
    wtop = Window.orderBy(*order)  # ranks k rows, not the snapshot
    return taken.withColumn("rank", F.row_number().over(wtop))


def throttle(
    df: DataFrame,
    n: int,
    dt: float,
    keys: Sequence[str] = (),
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """At most n events per dt window; extras dropped
    (streams.clj:1102-1118)."""
    bucket = time_bucket(dt, time_col)
    w = Window.partitionBy(*[F.col(c) for c in keys], bucket).orderBy(
        F.col(time_col), F.col(order_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def rollup(
    df: DataFrame,
    n: int,
    dt: float,
    keys: Sequence[str] = (),
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """The first n events per dt window pass through individually; the
    rest of the window accumulates into one aggregated row
    (streams.clj:1120-1156: side-effects fire while sent <= n, so
    ``rollup 3`` forwards events 1..3 and rolls [4, 5, ...]). Output has
    ``rolled`` = count of collected events for the tail row, NULL for
    pass-throughs."""
    bucket = time_bucket(dt, time_col).cast("double")
    w = Window.partitionBy(*[F.col(c) for c in keys], bucket).orderBy(
        F.col(time_col), F.col(order_col)
    )
    tagged = df.withColumn("__bucket", bucket).withColumn("__rn", F.row_number().over(w))
    passthrough = tagged.filter(F.col("__rn") <= n).withColumn(
        "rolled", F.lit(None).cast("long")
    )
    tail = (
        tagged.filter(F.col("__rn") > n)
        .groupBy(*keys, "__bucket")
        .agg(
            F.max_by(
                F.struct(*[c for c in df.columns]),
                F.struct(F.col(time_col), F.col(order_col)),
            ).alias("__last"),
            F.count(F.lit(1)).alias("rolled"),
        )
        .select("__last.*", "rolled")
        .withColumn("__bucket", bucket)
        .withColumn("__rn", F.lit(n))
    )
    return passthrough.unionByName(tail).drop("__bucket", "__rn")


def apdex(
    df: DataFrame,
    satisfied: str | Column,
    tolerated: str | Column,
    interval: float = 60.0,
    keys: Sequence[str] = ("service",),
    time_col: str = "time",
) -> DataFrame:
    """Per-interval Apdex = (satisfied + tolerated/2) / total
    (streams.clj:2103-2157). Predicates may be riemann query strings."""
    sat = compile_query(satisfied) if isinstance(satisfied, str) else satisfied
    tol = compile_query(tolerated) if isinstance(tolerated, str) else tolerated
    bucket = time_bucket(interval, time_col).cast("double").alias("window_start")
    if "state" in df.columns:
        # "Ignores expired events" (streams.clj:2118-2131): expired
        # rows count toward NOTHING — not even the denominator
        # (streams_test.clj:1761-1770 pins the 14-event total)
        df = df.filter(~F.coalesce(F.col("state") == "expired", F.lit(False)))
    n_sat = F.sum(F.when(sat, 1).otherwise(0))
    n_tol = F.sum(F.when(~F.coalesce(sat, F.lit(False)) & tol, 1).otherwise(0))
    n = F.count(F.lit(1))
    return df.groupBy(*keys, bucket).agg(
        ((n_sat + n_tol / F.lit(2.0)) / n).alias("apdex")
    )


def clock_skew(
    df: DataFrame, time_col: str = "time", order_col: str = "event_id"
) -> DataFrame:
    """Per-host clock offset vs the median of per-host latest clocks
    (streams.clj:2159-2195): latest time per host, median across hosts,
    skew = host_time − median."""
    latest = df.groupBy("host").agg(
        F.max(F.struct(F.col(time_col), F.col(order_col))).getField(time_col).alias(
            "host_time"
        )
    )
    med = latest.agg(F.percentile(F.col("host_time"), F.lit(0.5)).alias("median_time"))
    return latest.crossJoin(F.broadcast(med)).select(
        "host", (F.col("host_time") - F.col("median_time")).alias("skew")
    )


def predict_linear(
    df: DataFrame,
    n: int,
    lead_seconds: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """OLS over the last n events per key, extrapolated ``lead_seconds``
    ahead (streams.clj:2197-2248). Slope/intercept from exact decimal
    sums (deterministic, same closed form both engines):
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)."""
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(time_col), F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    x = F.col(time_col)
    y = F.col("metric")
    cnt = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(_d(x)).over(w).cast("double")
    sy = F.sum(_d(y)).over(w).cast("double")
    sxy = F.sum(_d(x * y)).over(w).cast("double")
    sxx = F.sum(_d(x * x)).over(w).cast("double")
    slope = F.try_divide(cnt * sxy - sx * sy, cnt * sxx - sx * sx)
    intercept = (sy - slope * sx) / cnt
    return df.withColumn("predicted", intercept + slope * (x + F.lit(lead_seconds)))


def predict_linear_exact(
    df: DataFrame,
    n: int,
    lead_seconds: float,
    anchor_us: int = 1704067200_000_000,
    keys: Sequence[str] = KEY,
    order_col: str = "event_id",
) -> DataFrame:
    """Distributed-exact predict-linear: OLS sums in INTEGER space.

    The double-sum version of OLS suffers catastrophic cancellation in
    n·Σx² − (Σx)² when x is a raw unix time (~1.7e9): the subtraction
    eats ~10 of double's 16 digits, so the result depends on summation
    round-off — i.e. on partitioning. This variant is bit-reproducible
    at any partitioning: x = whole seconds since anchor (exact BIGINT,
    ~1e6-scale), y = metric quantized to 1e-2 (exact BIGINT). Every
    sum, product, and the cancellation itself then stays below 2^53 —
    exactly representable in double — so the only rounding anywhere is
    the final division. Granularity tradeoff (whole seconds, metric
    cents) is documented operator contract.
    """
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("time_us"), F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    anchor_s = anchor_us // 1_000_000
    x = F.expr("time_us DIV 1000000") - F.lit(anchor_s)
    y = F.round(F.col("metric") * 100.0).cast("long")
    cnt = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w).cast("double")
    sy = F.sum(y).over(w).cast("double")
    sxy = F.sum(x * y).over(w).cast("double")
    sxx = F.sum(x * x).over(w).cast("double")
    slope = F.try_divide(cnt * sxy - sx * sy, cnt * sxx - sx * sx)
    intercept = (sy - slope * sx) / cnt
    pred_c = intercept + slope * (x.cast("double") + F.lit(float(lead_seconds)))
    return df.withColumn("predicted", pred_c / F.lit(100.0))


def project(
    df: DataFrame,
    preds: Sequence[str | Column],
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Fixed basis of N predicates → one row with the latest matching
    event's metric per slot (streams.clj:2032-2101).
    ``F.max(F.when(pred, struct(time, id, metric)))`` per slot — single
    aggregation, no join."""
    aggs = []
    for i, p in enumerate(preds):
        pred = compile_query(p) if isinstance(p, str) else p
        aggs.append(
            F.max(
                F.when(
                    pred,
                    F.struct(
                        F.col(time_col).alias("t"),
                        F.col(order_col).alias("o"),
                        F.col("metric").alias("m"),
                    ),
                )
            )
            .getField("m")
            .alias(f"slot{i}")
        )
    return df.agg(*aggs)


def coalesce_snapshot(
    df: DataFrame, time_col: str = "time", order_col: str = "event_id"
) -> DataFrame:
    """Batch form of coalesce (streams.clj:1209-1241): the remembered
    latest event per [service, host] — identical to the index without
    tombstone handling."""
    w = Window.partitionBy("host", "service").orderBy(
        F.col(time_col).desc(), F.col(order_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fill_in(
    df: DataFrame,
    interval: float,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Synthesize filler rows on every ``interval`` grid point of
    silence between consecutive events per key (streams.clj:683-751).
    sequence() + explode — fully distributed gap fill; ``filled``
    marks synthesized rows, which carry the previous metric
    (fill-in-last semantics)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(time_col), F.col(order_col)
    )
    nxt = F.lead(time_col).over(w)
    base = df.withColumn("__next", nxt)
    grid = F.sequence(
        F.lit(0).cast("long"),
        F.when(
            F.col("__next").isNotNull(),
            F.greatest(
                F.floor((F.col("__next") - F.col(time_col) - 1e-9) / F.lit(interval)),
                F.lit(0).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        base.select(
            *keys,
            F.col("metric"),
            F.col(time_col),
            F.explode(grid).alias("__i"),
        )
        .select(
            *keys,
            "metric",
            (F.col(time_col) + F.col("__i") * F.lit(interval)).alias(time_col),
            (F.col("__i") > 0).alias("filled"),
        )
    )


interpolate_constant = fill_in  # streams.clj:753-774 — same grid-fill shape


def holt_forecast(
    df: DataFrame,
    h_steps: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    last_n: int = 100,
    keys: Sequence[str] = KEY,
    time_col: str = "time",
    order_col: str = "event_id",
) -> DataFrame:
    """Holt's linear exponential smoothing per key — the classic next
    step beyond predict-linear's OLS (streams.clj:2103-2162 predicts
    by regression; Holt tracks level+trend recursively, weighting
    recent observations): level' = α·x + (1-α)·(level+trend),
    trend' = β·(level'-level) + (1-β)·trend, forecast = level' +
    trend'·h where h counts OBSERVATION STEPS (the honest unit on an
    irregular series — a per-second trend would pretend the gaps are
    uniform). α/β are dyadic rationals by default, so every update is
    exact-in-double and both engines fold identically.

    A recursive filter has no window-function form (the recursion is
    nonlinear in position) — it IS expressible as a sequential fold
    over the key's ordered tail: collect the last ``last_n``
    (time, metric) pairs per key (state bounded by last_n, NOT stream
    length — the same contract as moving-event-window) and F.aggregate
    the recursion in one pass. One shuffle on the key."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(time_col).desc(), F.col(order_col).desc()
    )
    tail = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= last_n)
        .drop("__rn")
    )
    series = tail.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(time_col).alias("t"), F.col(order_col).alias("o"), F.col("metric").alias("x")))
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    a, b = float(alpha), float(beta)
    # state: (level, trend, started) — the first observation seeds the
    # level, the second seeds the trend (standard initialization)
    init = F.struct(
        F.lit(0.0).alias("l"), F.lit(0.0).alias("b"), F.lit(0).alias("k")
    )

    def step(acc, e):
        x = e["x"]
        first = acc["k"] == 0
        second = acc["k"] == 1
        l_new = (
            F.when(first, x)
            .when(second, F.lit(a) * x + F.lit(1 - a) * acc["l"])
            .otherwise(F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"]))
        )
        b_new = (
            F.when(first, F.lit(0.0))
            .when(second, x - acc["l"])
            .otherwise(
                F.lit(b) * (l_new - acc["l"]) + F.lit(1 - b) * acc["b"]
            )
        )
        return F.struct(
            l_new.alias("l"), b_new.alias("b"), (acc["k"] + 1).alias("k")
        )

    st = F.aggregate(F.col("xs"), init, step)
    return series.select(
        *keys,
        "n_obs",
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"] * F.lit(float(h_steps))).alias("forecast"),
    )
