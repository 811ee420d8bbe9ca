"""Folds — aggregations over windows/groups (SURVEY.md §2.5).

Reference ``src/riemann/folds.clj``: each fold takes a seq of events
and returns one aggregated event. Here each fold is an aggregate
Column builder usable in ``groupBy(...).agg(...)`` — map-side partial
aggregation (combine) comes free, which is what makes these linear at
100 TB: the shuffle carries one partial per (executor, group), not the
raw rows.

Determinism note: floating sums over a shuffle are order-dependent.
The ``d*`` variants route through exact DECIMAL arithmetic and cast
back to DOUBLE at the end — bit-identical across engines and across
partitionings, which is what the DuckDB-oracle gate (and any
re-run-at-scale reproducibility story) needs. Use the plain variants
when raw speed matters and last-ulp drift is acceptable.

folds.clj mapping: sum:92-101 product:103-113 difference:115-126
quotient:128-154 mean:156-164 median:186-189 mode:166-184
minimum/maximum/extremum:191-210 std-dev:212-221 count:223-229
sorted-sample:16-49 fold:60-90.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale 6: captures every exact value this engine sums through _d
#: (metrics ≤2dp, their squares ≤4dp, prices ≤2dp) while keeping the
#: decimal→double boundary safe up to group sums of 2^53/1e6 ≈ 9e9 —
#: above that both engines' conversions stop being correctly rounded
#: and cross-engine bit-equality dies (see msum for the full story)
_DEC = "decimal(38,6)"


def _d(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC)


def dsum(col: str | Column = "metric") -> Column:
    """Exact (order-independent) sum → DOUBLE."""
    return F.sum(_d(col)).cast("double")


def dmean(col: str | Column = "metric") -> Column:
    """Exact-sum mean: CAST(sum_decimal AS DOUBLE)/count — one IEEE
    division, engine-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_d(c)).cast("double") / F.count(c)


def dstddev_pop(col: str | Column = "metric") -> Column:
    """Population stddev (reference divides by n, folds.clj:212-221)
    via exact sums: sqrt(E[x²] − E[x]²)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    s = F.sum(_d(c)).cast("double")
    s2 = F.sum(_d(c * c)).cast("double")
    return F.sqrt(s2 / n - (s / n) * (s / n))


def dvariance_pop(col: str | Column = "metric") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    s = F.sum(_d(c)).cast("double")
    s2 = F.sum(_d(c * c)).cast("double")
    return s2 / n - (s / n) * (s / n)


def msum(col: str | Column, decimals: int) -> Column:
    """Money-style exact sum: quantize to 10^-decimals integers, sum in
    unbounded decimal, one double division at the end.

    Use when the measure has a known decimal granularity (prices,
    discounts, quantities). Advantage over ``dsum``: every value that
    crosses the decimal→double boundary stays below 2^53, where BOTH
    Spark's (BigDecimal) and DuckDB's (int128) conversions are exact —
    ``dsum`` results above 2^53·10^-6 can differ between engines in
    the last ulp. Deterministic at any partitioning and any scale."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**decimals)
    return (
        F.sum(F.round(c * F.lit(scale)).cast("long").cast("decimal(38,0)"))
        .cast("double")
        / F.lit(scale)
    )


def fsum(col: str | Column = "metric") -> Column:
    return F.sum(col)


def fmean(col: str | Column = "metric") -> Column:
    return F.avg(col)


def fmin(col: str | Column = "metric") -> Column:
    return F.min(col)


def fmax(col: str | Column = "metric") -> Column:
    return F.max(col)


def fcount() -> Column:
    return F.count(F.lit(1))


def fmedian(col: str | Column = "metric") -> Column:
    """Exact interpolated median (reference sorted-sample at p=0.5 picks
    the floor-index element; we use the SQL-standard interpolation that
    both Spark `percentile` and DuckDB `quantile_cont` implement)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(0.5))


def fpercentile(col: str | Column, p: float) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(p))


def fproduct(col: str | Column = "metric") -> Column:
    """Product of metrics (folds.clj:103-113). exp(Σ ln x) keeps it an
    aggregate with partial combine; callers round for cross-engine
    compare (log-sum order drift ~1e-13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.sum(F.log(c)))


def fmode(col: str | Column = "metric") -> Column:
    """Deterministic mode: most frequent value, ties → smallest value
    (folds.clj:166-184). Computed over the collected group vector
    (riemann's folds always see small window vectors); for mode over
    huge groups use a two-level groupBy instead."""
    c = F.col(col) if isinstance(col, str) else col
    lst = F.collect_list(c)
    pairs = F.transform(
        F.array_distinct(lst),
        lambda v: F.struct(
            F.size(F.filter(lst, lambda x: x == v)).alias("n"),
            (-v).alias("negv"),
            v.alias("v"),
        ),
    )
    return F.array_max(pairs).getField("v")


def fmodes(col: str | Column = "metric") -> Column:
    """modes fold (folds.clj:170-179): ALL values tied at the highest
    occurrence count, as a sorted array (the reference yields them in
    frequency-map order; sorting is the deterministic equivalent)."""
    c = F.col(col) if isinstance(col, str) else col
    lst = F.collect_list(c)
    counts = F.transform(
        F.array_distinct(lst),
        lambda v: F.struct(
            F.size(F.filter(lst, lambda x: x == v)).alias("n"), v.alias("v")
        ),
    )
    top = F.array_max(counts).getField("n")
    return F.array_sort(
        F.transform(F.filter(counts, lambda p: p.getField("n") == top),
                    lambda p: p.getField("v"))
    )


def _first_by_order(
    col: str | Column, time_col: str = "time", order_col: str = "event_id"
) -> Column:
    """Earliest value by (time, id): lexicographic struct-min — a
    deterministic arg-min usable inside any aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.min(
        F.struct(F.col(time_col).alias("t"), F.col(order_col).alias("o"), c.alias("v"))
    ).getField("v")


def fdifference(
    col: str | Column = "metric", time_col: str = "time", order_col: str = "event_id"
) -> Column:
    """difference fold (folds.clj:115-126): first − Σ(rest), i.e.
    2·first − Σ(all). Exact decimal sum + deterministic first."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.lit(2).cast("double") * _first_by_order(c, time_col, order_col)
        - F.sum(_d(c)).cast("double")
    )


def fquotient(
    col: str | Column = "metric", time_col: str = "time", order_col: str = "event_id"
) -> Column:
    """quotient fold (folds.clj:128-154): first ÷ Π(rest).

    Magnitude via exp(2·ln|first| − Σ ln|x|), sign via the parity of
    the group's negative count (sign(first)/sign(Πrest) ==
    (−1)^#negatives — division and multiplication share sign algebra),
    so NEGATIVE metrics divide exactly like the reference's rational
    arithmetic (folds_test.clj quotient-test: (2,−3) → −2/3). A zero
    anywhere in the REST is the reference's ArithmeticException →
    null metric ("Can't divide by zero"); a zero FIRST over a nonzero
    rest is plain 0."""
    c = F.col(col) if isinstance(col, str) else col
    first = _first_by_order(c, time_col, order_col)
    n_zero = F.sum(F.when(c == 0, 1).otherwise(0))
    zero_in_rest = (n_zero - F.when(first == 0, 1).otherwise(0)) > 0
    sign = F.when(F.sum(F.when(c < 0, 1).otherwise(0)) % 2 == 1, -1.0).otherwise(1.0)
    mag = F.exp(F.lit(2.0) * F.log(F.abs(first)) - F.sum(F.log(F.abs(c))))
    return (
        F.when(zero_in_rest, F.lit(None).cast("double"))
        .when(first == 0, F.lit(0.0))
        .otherwise(sign * mag)
    )


def fquotient_sloppy(
    col: str | Column = "metric", time_col: str = "time", order_col: str = "event_id"
) -> Column:
    """quotient-sloppy (folds.clj:147-154): like quotient, but ANY
    zero metric in the group short-circuits to 0 — "considers
    0/0 = 0. Useful for relative rates, when you want the ratio of
    two constant values to be zero"."""
    c = F.col(col) if isinstance(col, str) else col
    any_zero = F.max(F.when(c == 0, 1).otherwise(0)) == 1
    return F.when(any_zero, F.lit(0.0)).otherwise(
        fquotient(c, time_col, order_col)
    )


def sorted_sample_points(col: str | Column, points: list[float]) -> Column:
    """Percentile sample at given points → array<double>.

    Reference ``sorted-sample-extract`` (folds.clj:16-49) returns the
    element at floor(n*p) clamped; interpolated percentile is the
    Spark-native generalization (documented deviation — exact element
    selection is available through the throttle/rank pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.array(*[F.lit(p) for p in points]))


def fold_metrics(col: str | Column, init: float, merge) -> Column:
    """Generic fold over collected metrics (folds.clj:60-90):
    ``F.aggregate`` over a collect_list — sequential semantics, for
    order-sensitive user folds. Use sparingly: collect_list
    materializes the group."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(F.collect_list(c), F.lit(init).cast("double"), merge)
