"""Mergeable sketches for 100 TB set problems: KMV and HLL for
distinct-counting, a Bloom filter for membership.

Each is chosen for a different scale trade-off:

**KMV** (k-minimum-values, Bar-Yossef et al. 2002 — the theta-sketch
family): hash every value to [0,1), keep the k smallest hashes; if
the kth-smallest is R, distinct ≈ (k−1)/R. In Spark the k-smallest-of
-union is ``orderBy(h).limit(k)`` → TakeOrderedAndProject (local
k-heaps, one k-row merge). Cross-engine bit-exact: md5 is identical
everywhere, the 52-bit hash fraction is a power-of-two scale, and the
final division is one correctly-rounded op — no transcendentals.
Error ~ 1/√(k−2): k=1024 ⇒ ~3%.

**HLL** (HyperLogLog, Flajolet et al. 2007 — what Spark's own
``approx_count_distinct`` runs as HLL++): m registers, register r
keeps the max leading-zero-run rank ρ of the hashes routed to it.
Unlike KMV it needs no distinct() pre-pass (max is idempotent —
duplicates are absorbed for free) and the sketch is a FIXED m-row
register table: merging two corpora's sketches is an elementwise max,
i.e. ``groupBy(register).max(rho)`` — the cheapest possible repeated
incremental merge, which is why HLL is the industry standard for
stored per-partition sketches. For one-shot production counting use
the built-in ``approx_count_distinct``; this explicit register
algebra is for sketches that must be STORED, merged across runs, or
verified cross-engine.

Determinism note (why the oracle matches): every per-value step is
integer-exact (md5 → 52-bit int, shift/mask for the register, a
shift-smear + bit_count for the rank — no log2 anywhere), and the
register sum Σ 2^(-ρ_r) is computed as an INTEGER sum of
2^(43-ρ_r) (≤ 1024·2^43 < 2^53, exact in 64 bits, order-independent
— a double sum would round differently per partition order). Only
the final α·m²/S estimate and the small-range ln() correction are
floating point, rounded to 6dp on both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
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


# ------------------------------------------------------------------ #
# HyperLogLog

_HLL_B = 10          # register-index bits → m = 1024 registers
_HLL_M = 1 << _HLL_B
_HLL_LOW = 52 - _HLL_B   # 42 rank bits below the register index
#: bias constant α_m for m ≥ 128 (Flajolet et al. 2007, fig. 3)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_registers(df: DataFrame, value: Column) -> DataFrame:
    """(register, rho) table — the HLL sketch as data.

    register = top b bits of the 52-bit md5 fraction; ρ = position of
    the first 1-bit in the remaining 42 (1-based; all-zero → 43),
    computed as 43 − bit_length via a shift-smear + bit_count (pure
    integer ops, identical in any engine — no float log2). The
    groupBy(register).max partial-aggregates map-side, so each
    partition ships ≤ m rows regardless of input size; merging
    sketches from different corpora is the same max over the union."""
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 13), 16, 10).cast("long")
    low = h.bitwiseAND(F.lit((1 << _HLL_LOW) - 1))
    # smear low's MSB down, then bit_count = bit_length(low)
    x = low
    for s in (1, 2, 4, 8, 16, 32):
        x = x.bitwiseOR(F.shiftright(x, s))
    rho = F.lit(_HLL_LOW + 1) - F.bit_count(x)
    return (
        df.select(
            F.shiftright(h, _HLL_LOW).alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(df: DataFrame, value: Column) -> DataFrame:
    """One-row frame (est_distinct, n_registers_hit, sum_scaled):
    α·m²/Σ2^(-ρ_r) with empty registers at ρ=0 and the small-range
    m·ln(m/V) correction. ``sum_scaled`` = Σ 2^(43-ρ) as the exact
    integer invariant (order-independent — see module docstring)."""
    regs = hll_registers(df, value)
    # python wrapper shiftleft() wants a literal count; SQL's doesn't
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_LOW + 1} - rho)")
    agg = regs.agg(
        F.count(F.lit(1)).alias("m_hit"),
        F.sum(scaled).alias("s_present"),
    )
    empty = F.lit(_HLL_M).cast("long") - F.col("m_hit")
    s_total = F.col("s_present") + empty * F.lit(1 << (_HLL_LOW + 1)).cast("long")
    e_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_LOW + 1))) / s_total
    small = (empty > 0) & (e_raw <= F.lit(2.5 * _HLL_M))
    corrected = F.when(
        small, F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / empty)
    ).otherwise(e_raw)
    return agg.select(
        F.round(corrected, 6).alias("est_distinct"),
        F.col("m_hit").cast("long").alias("n_registers_hit"),
        F.col("s_present").cast("long").alias("sum_scaled"),
    )


# ------------------------------------------------------------------ #
# Bloom filter

_BLOOM_BITS_LOG2 = 20       # m = 2^20 bits (~128 KiB as 32-bit words)
_BLOOM_K = 4                # hash functions = disjoint md5 hex chunks


def _bloom_positions(value: Column) -> list[Column]:
    """k bit positions in [0, 2^20) — four DISJOINT 5-hex-char (20-bit)
    chunks of md5(value). No arithmetic hash mixing (h1 + i·h2 would
    overflow DuckDB's checked BIGINT multiply); chunk independence
    comes from md5 itself. Integer-exact in any engine."""
    h = F.md5(value.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long")
        for i in range(_BLOOM_K)
    ]


def bloom_words(df: DataFrame, value: Column) -> DataFrame:
    """Build a Bloom filter over a value stream as a (word, bits)
    table: 32-bit words (BIGINT-safe — bit 31 max keeps every mask
    positive in engines with checked shifts), bit_or-merged.

    Scale: bit_or partial-aggregates map-side, so each partition ships
    ≤ 32K word rows no matter how many values it saw; merging two
    corpora's filters is the same bit_or over the union. The whole
    filter is ≤ 2^15 rows — broadcastable at ~128 KiB where the exact
    value set would be hundreds of MB. Size m for the expected
    distinct count: fpr ≈ (1 − e^(−k·n/m))^k; at n = 30K, m = 2^20,
    k = 4 → ~1e-4."""
    pos = F.explode(F.array(*_bloom_positions(value))).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame, value: Column, bloom: DataFrame, id_cols: list[str],
    out_col: str = "value",
) -> DataFrame:
    """Probe: the distinct ``(*id_cols, value)`` combinations of ``df``
    whose ``value`` hits all k bloom positions, as columns
    ``(*id_cols, out_col)``.  SET semantics, not row semantics: other
    columns are dropped and duplicate (id, value) rows collapse (the
    per-key groupBy that ANDs the k probe bits is also a distinct).
    Join the result back to ``df`` on (id_cols, value) when the full
    surviving rows are needed.

    The bloom table broadcasts; each probe row explodes to k
    (word, mask) lookups, left-joins the filter, and survives iff
    every mask bit is set (a missing word row = all-zero bits). One
    broadcast join, no shuffle of the probed stream."""
    if out_col in id_cols:
        raise ValueError(f"out_col {out_col!r} collides with an id column")
    pos = F.explode(F.array(*_bloom_positions(F.col(out_col)))).alias("pos")
    probes = df.select(*id_cols, value.alias(out_col)).select(
        *id_cols,
        out_col,
        pos,
    ).select(
        *id_cols,
        out_col,
        F.shiftright(F.col("pos"), 5).alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word", "left")
        .groupBy(*id_cols, out_col)
        .agg(
            F.min(
                (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).cast("int")
            ).alias("__all_hit")
        )
    )
    return hit.filter(F.col("__all_hit") == 1).drop("__all_hit")


def bloom_dense_bytes(df: DataFrame, value: Column) -> bytes:
    """Collect ``bloom_words`` into the dense driver-side form: a
    128 KiB byte blob covering the full 2^20-bit filter (bit p = bit
    ``p & 7`` of byte ``p >> 3``). ONE binary Literal a STATELESS
    streaming projection can embed, where the (word, bits) table
    would force a stream-static join + re-aggregation (a stateful
    plan). The representation matters twice over: an array literal
    this size becomes a 32k-child CreateArray whose analysis cost
    dwarfs the query, and a STRING literal probes in O(position)
    (UTF8String counts code points) — binary substring is byte-
    addressed O(1). Rebuild when the reference set changes; it is a
    constant of the query, like a broadcast model table."""
    return bloom_dense_pack(bloom_words(df, value).collect())


def bloom_dense_pack(rows) -> bytes:
    """Pack collected (word, bits) rows into the 128 KiB dense form —
    factored out of bloom_dense_bytes so a STORED (word, bits) table
    (the contamination gate's serving state, r15) packs through the
    identical code path and yields identical bytes."""
    try:
        import numpy as np

        # bit p = bit (p & 7) of byte (p >> 3) is exactly the
        # little-endian uint32 byte layout of the (word, bits) table:
        # word w's byte 4w+k holds bits 8k..8k+7, LSB-first
        dense = np.zeros(1 << 15, dtype="<u4")
        if rows:
            dense[np.fromiter((r.word for r in rows), dtype=np.int64)] = (
                np.fromiter((r.bits for r in rows), dtype=np.int64).astype("<u4")
            )
        return dense.tobytes()
    except ImportError:  # pure-python fallback, same bytes
        blob = bytearray(1 << 17)
        for r in rows:
            word, bits = int(r.word), int(r.bits)
            for b in range(32):
                if bits >> b & 1:
                    p = word * 32 + b
                    blob[p >> 3] |= 1 << (p & 7)
        return bytes(blob)


def bloom_hit_from_md5(h: Column, dense: bytes) -> Column:
    """Membership test given the value's md5 hex — true iff all
    ``_BLOOM_K`` chunk positions are set in the dense filter. ``h``
    is referenced 2k times, so pass a BOUND value (a lambda variable
    or a materialized column), never an ``F.md5(...)`` expression —
    Catalyst copies expression arguments verbatim and does not CSE
    across higher-order functions (the minhash_band_rows lesson;
    tests pin one md5 in the gate plans)."""
    bloom = F.lit(dense)
    hit = None
    for i in range(_BLOOM_K):
        p = F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long")
        byte_val = F.conv(
            F.hex(F.substring(bloom, (F.shiftright(p, 3) + 1).cast("int"), 1)),
            16, 10,
        ).cast("int")
        bit = F.getbit(byte_val, p % 8) == 1
        hit = bit if hit is None else (hit & bit)
    return hit


def bloom_hits_in_array(values: Column, dense: bytes) -> Column:
    """Count of array elements whose ``_BLOOM_K`` positions are all
    set — ONE md5 per element (hashes materialized by an inner
    transform, then probed through the bound lambda variable), as a
    pure expression: join-free, shuffle-free, append-mode safe. THE
    building block for ingest-time gating of a 100 TB stream."""
    return F.aggregate(
        F.transform(values, lambda s: F.md5(s.cast("string"))),
        F.lit(0).cast("long"),
        lambda acc, h: acc + bloom_hit_from_md5(h, dense).cast("long"),
    )


def bloom_contains_expr(value: Column, dense: bytes) -> Column:
    """Scalar membership test over the dense hex literal — same
    membership set as ``bloom_might_contain``'s join form (identical
    positions), but join-free. The md5 is bound through a
    single-element transform so it evaluates once."""
    return (
        F.get(
            F.transform(
                F.array(F.md5(value.cast("string"))),
                lambda h: bloom_hit_from_md5(h, dense),
            ),
            0,
        )
    )


# ----------------------------------------------------- count-min sketch

def cms_table(
    df: DataFrame, value: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows of ``width`` counters; every occurrence of a
    value increments one counter per row; a value's estimate is the MIN
    of its ``depth`` counters (overestimates only, by at most
    eN/width with probability 1-exp(-depth)).

    The sketch table is AT MOST depth x width rows no matter how many
    input rows flow in — the frequency analogue of the HLL/KMV bound:
    shuffle volume and final state are fixed by the sketch parameters,
    never by the data. Hash j of v = 32-bit chunk of md5(j || v) mod
    width — same disjoint-chunk family as MinHash/Bloom here, and
    bit-identical in any engine.

    Returns (j, b, c): counter value c for hash-row j, bucket b."""
    bkts = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(str(j)), value)), 1, 8), 16, 10
            ).cast("long")
            % width
        ).alias("b")
        for j in range(depth)
    ]
    pairs = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(j).alias("j"), b) for j, b in enumerate(bkts)])
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.j").alias("j"), F.col("p.b").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_estimate(
    keys: DataFrame, key: Column, sketch: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: attach est =
    min over the ``depth`` counters the key hashes into. The sketch
    (<= depth x width rows) broadcasts — one of the few broadcasts
    that is CORRECT at 100 TB, because its size is a sketch parameter,
    not a data property."""
    bkts = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(str(j)), key)), 1, 8), 16, 10
            ).cast("long")
            % width
        )
        for j in range(depth)
    ]
    kb = keys.select(
        "*",
        F.explode(
            F.array(*[F.struct(F.lit(j).alias("j"), b.alias("b")) for j, b in enumerate(bkts)])
        ).alias("p"),
    ).select("*", F.col("p.j").alias("j"), F.col("p.b").alias("b")).drop("p")
    others = [c for c in keys.columns]
    return (
        kb.join(F.broadcast(sketch), ["j", "b"])
        .groupBy(*others)
        .agg(F.min("c").alias("est"))
    )


# ------------------------------------------- histogram quantile sketch

def hist_table(
    df: DataFrame,
    value: Column,
    keys: list[str],
    n_buckets: int = 256,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """Fixed-grid histogram sketch: per key, at most ``n_buckets``
    (bucket, count) rows regardless of input size. The mergeable,
    bounded-state percentile structure — two histograms over the same
    grid merge by adding counts, so partial aggregation, shuffle
    volume, and streaming state are all capped by the grid, never the
    data (the quantile analogue of HLL registers / CMS counters).
    Values outside [lo, hi) clamp into the edge buckets.

    The bucket index is floor((v-lo) * n / (hi-lo)) — one multiply,
    one divide, one floor: identical IEEE ops in any engine, so the
    sketch is bit-reproducible (unlike t-digest, whose centroids
    depend on merge order, or GK, whose summary is engine-specific)."""
    b = F.floor((value - F.lit(lo)) * F.lit(float(n_buckets)) / F.lit(hi - lo))
    b = F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b)).cast("int")
    return (
        df.select(*keys, b.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    keys: list[str],
    qs: list[float],
    n_buckets: int = 256,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """Quantile estimates from a hist_table sketch: per key and per q,
    the upper edge of the bucket holding the ceil(q*total)-th value
    (1-based; q=0 maps to the 1st). Error is bounded by one grid step
    — the histogram trade: fixed error in VALUE space for state
    independent of data size. Integer thresholds and cumulative
    counts, so both engines agree exactly.

    Shape: one window cum-sum over <= n_buckets rows per key, explode
    the q list, keep the first qualifying bucket via min()."""
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    step = (hi - lo) / float(n_buckets)
    qarr = F.explode(F.array(*[F.lit(float(p)) for p in qs])).alias("q")
    hit = cum.select(*keys, "bucket", "cum", "total", qarr).filter(
        F.col("cum") >= F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("total")))
    )
    return hit.groupBy(*keys, "q").agg(
        (F.lit(lo) + (F.min("bucket") + 1) * F.lit(step)).alias("est")
    )
