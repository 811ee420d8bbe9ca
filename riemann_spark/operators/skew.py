"""Skew-mitigation utilities for hot keys.

Riemann's per-key fan-out never sees skew (one process); at 100 TB a
hot [host, service] key (one chatty service emitting 1000× the median)
turns its shuffle partition into a straggler. Two standard remedies,
both preserving exact aggregate semantics:

- AQE skew-join splitting: on by default in session.py — handles the
  JOIN side automatically.
- ``salted_agg``: two-phase aggregation for algebraic aggregates —
  phase 1 groups on (key, salt) spreading a hot key over N partitions,
  phase 2 merges the partials. Correct for any combinable aggregate
  (sum/count/min/max/decimal sums); riemann's fold family is
  combinable except order-sensitive ones (difference/quotient — those
  use the struct-min trick which IS combinable too).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
    salt_source: str | Column = "event_id",
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs: alias → aggregate over raw rows (phase 1).
    merge_aggs:   alias → aggregate over the phase-1 partial columns
                  (phase 2; reference the phase-1 aliases).

    The salt is a deterministic hash of ``salt_source`` (not random —
    keeps reruns reproducible) modulo n_salts.

    Example — skew-proof sum/count per key::

        salted_agg(ev, ["host", "service"],
                   {"s": F.sum(F.col("metric")), "n": F.count(F.lit(1))},
                   {"s": F.sum(F.col("s")),      "n": F.sum(F.col("n"))})
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salt = F.pmod(F.xxhash64(src), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return phase1.groupBy(*[F.col(k) for k in keys]).agg(
        *[c.alias(a) for a, c in merge_aggs.items()]
    )


def spread_for_python(df: DataFrame) -> DataFrame:
    """Widen under-partitioned input ahead of a Python-bound stage.

    ``mapInPandas`` parallelism equals the input partition count: a
    single-file local read (1 split) runs the whole Python codec on
    one core while 31 idle. At cluster scale the source has far more
    splits than cores and the spread is skipped. The shuffle moves
    only the columns the stage selected (prune before calling).

    r15: delegates to ``dedup._spread``'s two-branch width probe —
    the old ``df.rdd.getNumPartitions()`` probe converted the plan
    through the Python-serializer path and cost a profiled ~0.26s of
    py4j/codegen PER CALL (×2 per codec roundtrip build); the shared
    branch probes partition count JVM-side, and only when the session
    has seen a lake-sized source at all (small corpora spread
    probe-free — a mistaken shuffle there moves <1 GiB by
    construction)."""
    if df.isStreaming:
        return df  # micro-batch partitioning is the source's concern
    from riemann_spark.functions.dedup import _spread

    return _spread(df)
