"""Cardinality sketches for 100 TB distinct-counting.

KMV (k-minimum-values) estimator — Bar-Yossef et al. 2002, the basis
of the theta-sketch family (Druid/DataSketches): hash every value to
[0,1), keep the k smallest hashes; if the kth-smallest is R, the
distinct count ≈ (k−1)/R (k uniform order statistics ⇒ E[R] ≈ k/n).

Two properties make it the right sketch here rather than HLL:

- **mergeable + tiny**: the k smallest of a union is computable from
  per-partition k-smallest — in Spark that is exactly
  ``orderBy(h).limit(k)`` → TakeOrderedAndProject (local k-heaps, one
  k-row merge, no global sort, no full shuffle) — so the same code is
  the 1000-executor plan.
- **cross-engine bit-exact**: md5 is identical everywhere; the first
  13 hex chars are a 52-bit integer, exactly representable in a
  double; dividing by 2^52 is a power-of-two scale (exact); the final
  (k−1)/R is one correctly-rounded division. HLL's bias corrections
  need ln(), whose last ulp is libm-specific — KMV has no
  transcendental anywhere, so a DuckDB oracle matches to the bit.

Error ~ 1/√(k−2): k=1024 ⇒ ~3%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
_TWO52 = float(1 << 52)


def hash_fraction(col: Column) -> Column:
    """md5(value) → [0,1): first 13 hex chars as a 52-bit integer
    (exact in a double), scaled by 2^-52."""
    h = F.substring(F.md5(col.cast("string")), 1, 13)
    return (F.conv(h, 16, 10).cast("long") / F.lit(_TWO52)).alias("h")


def kmv_minima(df: DataFrame, value: Column, k: int) -> DataFrame:
    """The k smallest hash fractions of the DISTINCT values.

    Duplicate values hash identically, so distinct-ing the hash (a
    map-side-combinable aggregate) dedups before the take; the take
    itself is TakeOrderedAndProject."""
    return (
        df.select(hash_fraction(value))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(df: DataFrame, value: Column, k: int = 1024) -> DataFrame:
    """One-row frame: (est_distinct, kth_min, k). If fewer than k
    distinct values exist, the sketch is exact (count of minima)."""
    minima = kmv_minima(df, value, k)
    return minima.agg(
        F.count(F.lit(1)).alias("n_minima"),
        F.max("h").alias("kth_min"),
    ).select(
        F.when(
            F.col("n_minima") < k, F.col("n_minima").cast("double")
        )
        .otherwise((F.lit(float(k - 1))) / F.col("kth_min"))
        .alias("est_distinct"),
        "kth_min",
        F.lit(k).alias("k"),
    )
