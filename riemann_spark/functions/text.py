"""Text analysis over the documents table — all built-in Column work
(JVM-side, codegen'd), no Python UDFs in the hot path.

Operators: tokenization, token/char counts, punctuation & stopword
ratios, a composite quality score, stopword-vote language ID, and an
md5 normalization fingerprint. Every expression is chosen to have an
exact DuckDB mirror (integer counts, single divisions, md5) so the
oracle gate is bit-deterministic.

At 100 TB: these are pure per-row projections — no shuffle at all;
they fuse with the parquet scan and any downstream filter prunes
columns down to `text` only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# language → stopword votes (tiny embedded profiles; real deployments
# would broadcast a bigger lexicon table and join)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


#: GPT-2-style pre-tokenizer, ASCII-simplified: contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs, residual
#: whitespace. No lookaheads — identical leftmost-first semantics in
#: Java regex (Spark) and RE2 (DuckDB), so counts oracle-match.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: str | Column = "text") -> Column:
    """LLM-style token-count estimate: matches of the BPE pre-split
    pattern (the unit real byte-pair encoders subdivide). Pure regexp
    count — JVM-side, no vocab, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_SPLIT_PATTERN))


#: Rabin-Karp parameters: base 31, Mersenne-ish modulus keeps every
#: intermediate < 2^36 — exact in int64 on any engine.
ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007

#: Synthetic-duplicate id offset: curation fixtures re-salt upsampled
#: copies as doc_id + UPSAMPLE_ID_OFFSET; anything unmapping a salted
#: id back to its base doc must use THIS constant (never a literal) so
#: Spark builders and SQL oracles cannot drift.
UPSAMPLE_ID_OFFSET = 1_000_000


def token_value(tok: Column) -> Column:
    """Deterministic 32-bit integer per token: first 8 hex chars of
    md5 — identical in Spark, DuckDB, and hashlib."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def rolling_fingerprint(col: str | Column = "text") -> Column:
    """Order-sensitive document fingerprint: left-fold polynomial
    rolling hash h = (h·31 + md5_32(token)) mod 1e9+7 over whitespace
    tokens. Unlike the md5 normalization fingerprint (content
    identity), this is the Rabin-Karp shape incremental/windowed
    fingerprinting builds on."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLLING_BASE + token_value(t)) % ROLLING_MOD,
    )


def char_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_count(col: str | Column = "text") -> Column:
    """Characters that are not alphanumeric/whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))


def stopword_count(col: str | Column = "text", stopwords: list[str] | None = None) -> Column:
    sw = stopwords if stopwords is not None else EN_STOPWORDS
    lit_sw = F.array(*[F.lit(w) for w in sw])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(lit_sw, t)))


def mean_token_len(col: str | Column = "text") -> Column:
    """Σ len(token) / n_tokens — integer sums, one division."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks)


def quality_score(col: str | Column = "text") -> Column:
    """Composite [0,1]-ish quality heuristic: rewards stopword density
    and moderate token length, penalizes punctuation density. Linear
    combination of exact ratios — deterministic."""
    n_tok = token_count(col).cast("double")
    stop_ratio = stopword_count(col) / n_tok
    punct_ratio = punct_count(col) / char_count(col).cast("double")
    len_term = mean_token_len(col) / F.lit(10.0)
    return (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * F.least(len_term, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )


def lang_votes(col: str | Column = "text") -> dict[str, Column]:
    """Stopword-vote counts per language."""
    return {
        lang: stopword_count(col, sw).alias(f"votes_{lang}")
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: str | Column = "text") -> Column:
    """argmax of stopword votes, ties broken by fixed language order
    (en > de > es > fr); 'und' (undetermined) when no votes at all."""
    votes = {lang: stopword_count(col, sw) for lang, sw in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    best = F.lit("und")
    best_v = F.lit(0)
    # process in declaration order with strict >, so the FIRST language
    # to reach the max vote wins ties: en > de > es > fr
    for lang in langs:
        v = votes[lang]
        cond = v > best_v
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_v = F.when(cond, v).otherwise(best_v)
    return best


def fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased
    text — the exact-dedup key. md5 is identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def add_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Convenience: attach the full feature set as columns."""
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("mean_token_len", mean_token_len(col))
        .withColumn("punct_ratio", punct_count(col) / char_count(col).cast("double"))
        .withColumn("stop_ratio", stopword_count(col) / token_count(col).cast("double"))
        .withColumn("quality", quality_score(col))
        .withColumn("lang_pred", lang_id(col))
        .withColumn("fingerprint", fingerprint(col))
    )


# ---------------------------------------------------------------- #
# repetition / split / scrub — training-data curation tier

def repetition_cols() -> tuple[Column, Column]:
    """The (dup_word_frac, top2_char_frac) expressions over columns
    ``t`` (token array), ``n_tokens``, ``n_distinct``, ``n_chars`` —
    the pure-projection core of ``repetition_metrics``, exposed so
    pipelines that already carry those columns (curation_pipeline)
    can fuse the signals into their own projection with no join.

    top2_char_frac is computed WITHOUT an explode/groupBy: a 2-gram's
    corpus-free count within one document equals its run length in
    the doc's SORTED gram array, so max(count × gram length) is one
    sequential fold over array_sort(grams) — same integers as the
    old explode + count + max plan (oracle-checked), zero shuffle
    (r14 §1.2 step 1: the former count shuffled one row per 2-gram
    occurrence corpus-wide and joined back per doc)."""
    grams = F.when(
        F.col("n_tokens") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - 2),
            lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.lit(0).cast("long")
    top2_chars = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                * F.length(g).cast("long"),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    dup_word_frac = F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens")
    top2_char_frac = top2_chars / F.col("n_chars")
    return dup_word_frac, top2_char_frac


def repetition_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1):
    heavily repeated content marks low-quality/generated text.

    - ``dup_word_frac``: 1 − distinct/total tokens.
    - ``top2_char_frac``: chars occupied by the most-covering 2-gram
      (max over 2-grams of count × gram length) / doc chars —
      tie-deterministic by construction (max over a single integer).

    Shape (r14): a pure per-row projection — the per-doc 2-gram
    counts come from run lengths over the sorted gram array
    (``repetition_cols``), so there is NO explode, NO corpus-wide
    (doc, gram) shuffle and NO join-back; at 100 TB the signals
    stream with the scan. The old plan shuffled one row per 2-gram
    occurrence and scanned the corpus twice."""
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars"),
        toks.alias("t"),
    )
    dup_word_frac, top2_char_frac = repetition_cols()
    return base.select(
        "doc",
        dup_word_frac.alias("dup_word_frac"),
        top2_char_frac.alias("top2_char_frac"),
    )


# anchored to simple character classes so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(col: str | Column = "text") -> Column:
    """Mask emails / IPv4s / phone-shaped numbers — the standard
    pre-training scrub pass, entirely in JVM regexp_replace (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def hash_split(id_col: str | Column = "doc_id", train: int = 230, valid: int = 243) -> Column:
    """Deterministic train/valid/test assignment by md5(id) prefix.

    Buckets on the first two hex chars (256 buckets): < ``train``
    (default 230 ≈ 89.8%) → train, < ``valid`` (default 243 ≈ 5.1%)
    → valid, else test. Pure projection — membership is stable under
    any repartitioning, resharding, or engine, which is the property a
    held-out split must have at 100 TB (lexicographic compare on
    fixed-width lowercase hex, identical in Spark and DuckDB)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    b = F.substring(F.md5(c.cast("string")), 1, 2)
    return (
        F.when(b < F.lit(format(train, "02x")), "train")
        .when(b < F.lit(format(valid, "02x")), "valid")
        .otherwise("test")
    )


# ------------------------------------------------------------------ #
# corpus-level statistics (DataFrame → DataFrame)

def _token_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) with one row per token OCCURRENCE (not distinct)."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )


def tf_idf_top_terms(
    df: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-n characteristic terms per document by smoothed tf-idf
    (sklearn convention: idf = ln((N+1)/(df+1)) + 1, tf = count/len).

    Scale shape: one shuffle builds (doc, term) counts; the document-
    frequency table aggregates from it (vocab-sized, partial-agg'd
    map-side) and joins back ON TERM — a shuffle join, deliberately
    NOT broadcast (a 100 TB corpus's vocabulary is itself huge); the
    corpus size N is the only broadcast (one row). Ranking is a
    per-doc window on the ROUNDED score so ordering is engine-exact."""
    tt = _token_table(df, id_col, text_col)
    per_doc = tt.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("cnt"))
    doc_len = per_doc.groupBy("doc").agg(F.sum("cnt").alias("len"))
    df_t = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        per_doc.join(doc_len, "doc")
        .join(df_t, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt") / F.col("len"))
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc", "rank", "term", "tfidf")
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram language model — the classic cheap perplexity proxy for
    quality filtering (docs of rare/garbage tokens score very
    negative, formulaic boilerplate scores near the top).

    p(t) = count(t)/total over the whole corpus; score = Σ ln p / len.
    Same scale shape as tf-idf: token-table shuffle, vocab join on
    term (not broadcast), two one-row broadcasts for the totals.
    Rounded to 6dp: the Σ ln() is order-sensitive only below 1e-12."""
    tt = _token_table(df, id_col, text_col)
    counts = tt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("total"))
    return (
        tt.join(counts, "term")
        .join(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.round(
                F.sum(F.log(F.col("c") / F.col("total"))) / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
            F.count(F.lit(1)).alias("len"),
        )
    )


def hash_sample(rate: Column | float, id_col: str | Column = "doc_id") -> Column:
    """Deterministic keep/drop for (possibly per-stratum) sampling:
    md5(id) as a 52-bit fraction < rate. Stable under repartitioning
    and across engines (same property as hash_split); pass a CASE
    expression as ``rate`` for stratified designs. Pure projection."""
    from riemann_spark.functions.sketches import hash_fraction

    r = F.lit(rate) if isinstance(rate, float) else rate
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash_fraction(c) < r


def mix_upsample(
    df: DataFrame,
    weight: Column,
    id_col: str | Column = "doc_id",
) -> DataFrame:
    """Deterministic fractional upsampling for training-mix weights:
    a doc with weight w yields floor(w) copies plus one more iff its
    md5 fraction < frac(w) — so a source weighted 2.3 contributes
    each doc 2 or 3 times, 2.3x in expectation, and EXACTLY the same
    copies on every run/engine/partitioning (unlike rand()-based
    sampling). Output adds ``copy_idx``; pure projection + explode,
    no shuffle."""
    from riemann_spark.functions.sketches import hash_fraction

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    base = F.floor(weight).cast("long")
    extra = (hash_fraction(c) < (weight - F.floor(weight))).cast("long")
    n = (base + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def sequence_packing(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style document packing: concatenate each partition's docs
    in deterministic (id) order and split the token stream at
    ``budget``-token boundaries (docs straddle bins — the standard
    pre-training packing, no padding waste). Emits per doc: its bin,
    token offset within the bin, and token count.

    One window cumsum per partition key — each key's packing is an
    independent sorted prefix-sum, so the plan is a single Exchange
    on ``part_col`` (the 100 TB layout: one pack stream per source
    shard)."""
    n_tok = token_count(text_col).cast("long")
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("__n_tok").over(w), F.lit(0)).alias("__off")
    return (
        df.select(part_col, id_col, n_tok.alias("__n_tok"))
        .withColumn("__off", offset)
        .select(
            part_col,
            id_col,
            (F.col("__off") / budget).cast("long").alias("bin"),
            (F.col("__off") % budget).alias("bin_offset"),
            F.col("__n_tok").alias("n_tokens"),
        )
    )


def segment_dedup_keep_first(
    df: DataFrame,
    seg_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep-first duplicated-segment removal: where ``segment_dedup``
    cuts EVERY occurrence of an over-represented chunk, this keeps the
    canonical first occurrence — min (doc id, position) across the
    corpus — and cuts only the repeats, so no content is lost entirely
    (the RefinedWeb/MassiveText dedup posture: one copy survives).

    Shape: posexplode segments; the canonical owner per segment is a
    groupBy(seg) min_by aggregate (map-side combinable, one row per
    distinct segment into the shuffle — same skew argument as
    segment_dedup: never a window partitioned by content); join back,
    keep rows matching the canonical (doc,pos) or unique; rebuild per
    doc. Returns (id, clean_text, n_segs, n_dropped)."""
    seg = df.select(
        F.col(id_col), F.posexplode(segments(text_col, seg_tokens)).alias("pos", "seg")
    )
    canon = seg.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_at")
    )
    seg = seg.join(canon, "seg").withColumn(
        "__keep",
        (F.col("first_at")[id_col] == F.col(id_col))
        & (F.col("first_at")["pos"] == F.col("pos")),
    )
    kept = F.when(F.col("__keep"), F.struct("pos", "seg"))
    return seg.groupBy(id_col).agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["seg"])
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_segs"),
        F.sum(F.when(F.col("__keep"), 0).otherwise(1)).cast("long").alias("n_dropped"),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    (shard, pos) — shard by md5-prefix bucket, position by md5 order
    within the shard. The pre-training data-layout primitive: the
    order is pseudo-random w.r.t. any content attribute, yet EXACTLY
    reproducible across runs, engines, and repartitionings (no
    rand(), no monotonically_increasing_id partition dependence).

    Scale shape: one Exchange on shard (uniform by construction — the
    shard comes from a 32-bit md5 prefix, so modulo bias is <=
    n_shards/2^32 and thousands of output shards stay balanced), one
    sort per shard; at 100 TB this is the write-side layout job
    (shard = output file), and the sort is within-partition only."""
    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.select(F.col(id_col), shard, h.alias("__h"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def mix_temperature(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based mixing weights (the multilingual-sampling
    rule of arXiv:1901.07291 §3.1, standard for corpus mixing):
    p_s ∝ n_s^α flattens source imbalance — α=1 is proportional,
    α→0 uniform. Returns per source: n_docs, the raw and tempered
    sampling probabilities, and the boost factor (p_temp/p_raw) to
    feed ``mix_upsample``.

    Two tiny aggregates (per-source counts, then a one-row broadcast
    of the normalizers) — key-cardinality-sized at any corpus size.
    Probabilities rounded to 6dp: pow(x, α) is the one expression
    here with engine-dependent last-ulp behavior."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("pow_total"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("p_raw"),
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                / F.col("pow_total"),
                6,
            ).alias("p_temp"),
            F.round(
                (
                    F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                    / F.col("pow_total")
                )
                / (F.col("n_docs") / F.col("n_total")),
                6,
            ).alias("boost"),
        )
    )


def segments(col: str | Column = "text", seg_tokens: int = 10) -> Column:
    """Non-overlapping token chunks of ``seg_tokens`` — the dedup unit
    for corpora without line structure (a paragraph/line proxy; C4 and
    CCNet dedup at exactly this granularity when line breaks exist).
    The token array is bound through a single-element transform (the
    dedup._gram_array discipline) so the regex split runs once per
    row, not once per segment."""
    c = tokens(col)

    def _segs(toks: Column) -> Column:
        n_segs = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
        return F.transform(
            F.sequence(F.lit(1), n_segs),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - 1) * seg_tokens + 1, seg_tokens)
            ),
        )

    return F.get(F.transform(F.array(c), _segs), 0)


def segment_dedup(
    df: DataFrame,
    seg_tokens: int = 10,
    max_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus-level duplicated-segment removal (CCNet line dedup,
    arXiv:1911.00359 §3.1, over token-chunk segments): any segment
    occurring more than ``max_df`` times ACROSS THE CORPUS is cut from
    every document holding it; surviving segments reassemble in
    original order. Returns (id, clean_text, n_segs, n_dropped) —
    docs whose every segment was duplicated stay, with empty text.

    Shape: posexplode segments, then the corpus-wide occurrence count
    as groupBy(seg) + join back — NOT a window partitioned by the
    segment: the hot key here IS the duplicated content being counted
    (viral boilerplate can occur millions of times), and a window
    would materialize every occurrence in one partition, while the
    groupBy partial-aggregates map-side (one row per distinct segment
    reaches the shuffle) and AQE's skew-join splits the join's hot
    partitions. One more shuffle on doc id to reassemble — the
    rebuild aggregates sort_array(struct(pos, seg)) per doc, payload
    bounded by document length. No driver state.

    ``carry_cols`` rides extra per-doc columns (scores, labels)
    through the explode and reassembly (F.first — constant within a
    doc), so a caller that needs them back avoids a second corpus
    scan + recompute + join (r14 §15; curation_pipeline_cls)."""
    seg = (
        df.select(
            F.col(id_col),
            *carry_cols,
            F.posexplode(segments(text_col, seg_tokens)).alias("pos", "seg"),
        )
    )
    counts = seg.groupBy("seg").agg(F.count(F.lit(1)).alias("n_occ"))
    seg = seg.join(counts, "seg")
    kept = F.when(F.col("n_occ") <= max_df, F.struct("pos", "seg"))
    return (
        seg.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["seg"]
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum(F.when(F.col("n_occ") > max_df, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            *[F.first(c).alias(c) for c in carry_cols],
        )
    )


def hashed_linear_score(
    col: str | Column = "text", dim: int = 1024, salt: str = "w"
) -> Column:
    """fastText-style hashed linear classifier inference (Joulin et
    al., arXiv:1607.01759: bag of hashed features x learned weight
    vector): each token hashes to one of ``dim`` buckets, the bucket's
    weight comes from the weight table, and the document score is the
    mean bucket weight — exactly the inference shape of a production
    quality classifier, as a pure projection (zero shuffle, zero UDF,
    fused with the scan).

    The weight table here is deterministic-pseudorandom in [-1, 1)
    (md5 of salt||bucket, 52-bit fraction) standing in for trained
    parameters; a real model drops in by replacing ``_weight`` with a
    literal array lookup — the plan does not change. The per-doc sum
    is a sequential left fold (F.aggregate), bit-reproducible and
    engine-portable — a shuffle-summed double would be neither."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    two52 = float(1 << 52)

    def _weight(tok: Column) -> Column:
        bucket = token_value(tok) % dim
        frac = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), bucket.cast("string"))), 1, 13),
                16,
                10,
            ).cast("long")
            / F.lit(two52)
        )
        return frac * 2.0 - 1.0

    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + _weight(t)
    )
    return total / F.size(toks)


# ------------------------------------------------------------------ #
# BPE tokenizer (trained merges, corpus-derived)

def bpe_char_seq(col: str | Column) -> Column:
    """Word → sentinel-delimited symbol sequence: ``'abc'`` →
    ``' a b c '``. The leading/trailing spaces make a merge a LITERAL
    left-to-right replace of ``' p1 p2 '`` with ``' p1p2 '`` — the
    sentinel prevents mid-symbol matches ('xa b' never matches pair
    (a,b)), and consecutive pairs share separators exactly the way
    non-overlapping replace consumes them ('a a a' merges to 'aa a',
    the BPE left-to-right scan). replace() semantics are identical in
    Spark and DuckDB, so trained merges replay bit-exactly in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(" "), F.trim(F.regexp_replace(c, "(.)", "$1 ")), F.lit(" "))


def _bpe_merge_col(seq: Column, p1: str, p2: str) -> Column:
    return F.replace(seq, F.lit(f" {p1} {p2} "), F.lit(f" {p1}{p2} "))


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    sample_fraction: float | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus (Sennrich et al.
    arXiv:1508.07909 alg. 1): repeatedly count adjacent symbol pairs
    across all word occurrences and merge the most frequent, ties
    broken lexicographically so training is deterministic across
    engines and partitionings.

    Spark shape mirrors the keyed-Lloyd trainer (similarity.py): each
    iteration is one distributed pair-count aggregation; only the
    single winning pair (one row — model-sized) ever reaches the
    driver. The word table persists across iterations; iteration k
    applies the k learned literal replaces inside the scan.

    Cost model: training is ONE full aggregation job PER MERGE —
    faithful alg. 1, but a 32k-merge vocabulary at 100 TB means 32k
    sequential scans of the persisted word table. The scale-safe form
    (and standard practice — tokenizers are trained on a subcorpus)
    is ``sample_fraction``: a DETERMINISTIC md5-hash sample of
    documents (not rows-at-random, so retraining reproduces the same
    vocabulary) bounds the persisted table to fraction·corpus while
    the learned merges still tokenize the FULL corpus via
    bpe_trained_token_count. Statistics, not membership: pair
    frequencies concentrate, so a few GB of sampled text train the
    same early merges the full corpus would."""
    if sample_fraction is not None and sample_fraction < 1.0:
        buckets = 1_000_000
        df = df.filter(
            F.conv(F.substring(F.md5(F.col(text_col)), 1, 13), 16, 10)
            .cast("long")
            .__mod__(buckets)
            < int(sample_fraction * buckets)
        )
    words = df.select(F.explode(tokens(text_col)).alias("w")).persist()
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            seq = bpe_char_seq("w")
            for p1, p2 in merges:
                seq = _bpe_merge_col(seq, p1, p2)
            arr = F.split(F.trim(seq), " ")
            n = F.size(arr)
            pairs = F.zip_with(
                F.slice(arr, 1, n - 1),
                F.slice(arr, 2, n - 1),
                lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
            )
            top = (
                words.select(F.explode(pairs).alias("p"))
                .groupBy("p.p1", "p.p2")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy(F.desc("c"), "p1", "p2")
                .limit(1)
                .collect()
            )
            if not top:
                break
            merges.append((top[0].p1, top[0].p2))
        return merges
    finally:
        words.unpersist()


def bpe_trained_token_count(
    col: str | Column, merges: list[tuple[str, str]]
) -> Column:
    """Total BPE tokens per document under a trained merge list: each
    whitespace word is segmented by replaying the merges (chained
    literal replaces — pure Column work fused into the scan), then the
    per-word symbol counts sum. No UDF, no shuffle."""

    def seg_count(w: Column) -> Column:
        seq = bpe_char_seq(w)
        for p1, p2 in merges:
            seq = _bpe_merge_col(seq, p1, p2)
        return F.size(F.split(F.trim(seq), " "))

    toks = tokens(col)
    return F.aggregate(
        F.transform(toks, seg_count), F.lit(0), lambda acc, x: acc + x
    ).cast("long")


# ------------------------------------------------------------------ #
# DSIR-style importance weighting (hashed n-gram domain selection)

def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.
    arXiv:2302.03169): score every document by how target-domain-like
    it is under hashed-bigram unigram models — weight(x) = Σ over x's
    bigram occurrences of ln p_target(b) − ln p_raw(b), with add-one
    smoothing over ``n_buckets`` hash buckets. Positive weight =
    more target-like than the raw pool; resample/top-k on it.

    Scale shape: one bigram explode feeds BOTH model estimates
    (count aggregations over a fixed 1024-bucket key space — tiny,
    broadcast back) and the per-doc scoring rollup (one doc-keyed
    shuffle). The models are parameter-sized regardless of corpus
    size, exactly like the sketch family. All-integer counts; the
    only floats are the final ln() terms, rounded for the oracle."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bt = df.select(
        F.col(id_col).alias("doc"),
        target_pred.alias("is_target"),
        F.explode(bigrams).alias("bg"),
    ).withColumn("b", token_value(F.col("bg")) % n_buckets)
    raw_counts = bt.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_counts = (
        bt.filter("is_target").groupBy("b").agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    totals = bt.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("is_target").cast("long")).alias("n_tgt"),
    )
    model = (
        raw_counts.join(tgt_counts, "b", "left")
        .na.fill({"c_tgt": 0})
        .join(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("c_tgt") + 1).cast("double") / (F.col("n_tgt") + n_buckets))
                - F.log((F.col("c_raw") + 1).cast("double") / (F.col("n_raw") + n_buckets))
            ).alias("log_ratio"),
        )
    )
    per_doc = (
        bt.join(F.broadcast(model), "b")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum("log_ratio"), 6).alias("weight"),
        )
    )
    return per_doc


def sample_fixed_k(
    df: DataFrame,
    k: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    safety: float = 4.0,
) -> DataFrame:
    """EXACTLY-k-per-key deterministic sample (eval-set carving: "take
    k docs per source"): rank docs within each key by md5(id) order
    and keep rank <= k — stable under any repartitioning/engine, no
    rand().

    Scale shape: a bare window partitioned by ``key_col`` is the skew
    trap (one partition per source = the whole source through one
    task), so the rank only runs over a HASH-PREFILTERED candidate
    set: per-key counts (key-cardinality aggregate, broadcast back)
    bound the md5-fraction threshold at safety*k/n, so the window
    partition holds ~safety*k rows per key regardless of corpus size.
    P(a key with n >> k yields < k candidates) is negligible at
    safety=4 (Chernoff); keys with n <= safety*k skip the prefilter
    entirely (threshold clamps to 1)."""
    from riemann_spark.functions.sketches import hash_fraction

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    thresh = F.least(F.lit(1.0), F.lit(float(safety * k)) / F.col("__n"))
    cand = (
        df.join(F.broadcast(counts), key_col)
        .filter(hash_fraction(F.col(id_col)) < thresh)
        .drop("__n")
    )
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def chunk_sliding(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-length chunking with stride overlap — the step that
    turns variable-length documents into fixed-window training
    examples (window tokens per chunk, window-stride tokens of
    overlap so no boundary context is lost). Chunk starts are
    0, stride, 2*stride, ... while start < n_tokens; the tail chunk
    may be short. Returns one row per chunk:
    (id, chunk_id, start, n_chunk_tokens, chunk_fp).

    Shape: ONE tokenization, then explode over the start sequence —
    a pure narrow projection (no shuffle at all); output volume is
    ~n_tokens/stride rows per doc. The chunk itself leaves the plan
    only as an md5 fingerprint, so rows stay small; a materializing
    variant would carry concat_ws(' ', slice) instead."""
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))
        ).alias("start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, window)
    return t.select(
        F.col(id_col),
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


def boilerplate_report(
    df: DataFrame,
    seg_tokens: int = 10,
    min_df_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-SOURCE boilerplate detection (the RefinedWeb/C4 line-dedup
    posture scoped to a single source, arXiv:2306.01116 §G.1): a
    segment occurring in >= ``min_df_docs`` DISTINCT documents OF THE
    SAME SOURCE is template boilerplate (nav bars, footers, license
    headers — content that repeats within a site but is legitimate
    across sites). Returns one row per doc:
    (id, source, n_segs, n_boiler_segs, tokens_kept).

    Shape: posexplode token segments; the per-(source, segment)
    document-frequency is a groupBy with map-side partial distinct —
    NOT a window over the segment (the hot key is exactly the viral
    boilerplate being counted); join back and roll up per doc. The
    per-doc aggregate's payload is bounded by document length."""
    seg = df.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(segments(text_col, seg_tokens)).alias("seg"),
    )
    dfreq = seg.groupBy(source_col, "seg").agg(
        F.countDistinct(id_col).alias("__df")
    )
    boiler = F.col("__df") >= min_df_docs
    seg_n = F.size(F.split(F.col("seg"), " "))
    return (
        seg.join(dfreq, [source_col, "seg"])
        .groupBy(id_col, source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum(boiler.cast("long")).cast("long").alias("n_boiler_segs"),
            F.sum(F.when(~boiler, seg_n).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
    )


def gopher_flags(d: DataFrame, *keep: str) -> DataFrame:
    """The Gopher quality-rule projection (Rae et al. 2021 §A1.1) —
    works on any frame with (doc_id, text), batch or streaming: word
    count bounds, mean-word-length bounds, symbol-to-word ratio
    (#/ellipsis), alphabetic-word fraction, minimum stopword
    evidence, plus the combined ``gopher_pass``. Pure projection over
    ONE tokenization — composing it in front of ingest-time dedup or
    contamination gates costs one fused projection in the same
    stage (zero shuffle, no state). ``keep`` names extra columns to
    pass through (e.g. "text" when gates downstream re-read it) —
    a streaming topology can't join two derivations of the same
    stream, so pass-through is how the gates stay one projection."""
    toks = tokens("text")
    n_words = F.size(toks)
    mean_len = mean_token_len("text")
    n_hash = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    n_ell = F.floor(
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / 3
    )
    symbol_ratio = (n_hash + n_ell) / n_words.cast("double")
    alpha_frac = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ) / n_words.cast("double")
    n_stop = stopword_count("text")
    ok_words = (n_words >= 20) & (n_words <= 100000)
    ok_mean = (mean_len >= 3.0) & (mean_len <= 10.0)
    ok_sym = symbol_ratio <= 0.1
    ok_alpha = alpha_frac >= 0.8
    ok_stop = n_stop >= 2
    return d.select(
        "doc_id",
        *keep,
        ok_words.alias("ok_words"),
        ok_mean.alias("ok_mean_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_sym & ok_alpha & ok_stop).alias("gopher_pass"),
    )


def winnowing(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide
    a window of w consecutive gram hashes, and in each window select
    the RIGHTMOST minimal hash. Guarantees: any shared run of at
    least k+w-1 tokens produces at least one shared fingerprint
    (theorem 1), and expected density is 2/(w+1) — the
    position-robust document fingerprint that plain chunk hashing
    (which breaks on any 1-token shift) is not. Returns one row per
    selected fingerprint: (id, pos, fp) where pos is the 0-based gram
    start and fp the 52-bit md5-derived gram hash.

    Shape: pure narrow projection — ONE tokenization, one gram-hash
    array materialized per row (bound through a prior select so the
    window fold reads the array instead of re-deriving md5 per
    window: Catalyst does not CSE across higher-order functions),
    then an O(m·w) fold and an explode. Zero shuffle; output volume
    ~2m/(w+1) rows per doc. Docs shorter than k tokens contribute a
    single whole-doc gram."""
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    gl = F.least(F.lit(k), n)  # gram length (whole doc when n < k)
    m = F.greatest(n - k + 1, F.lit(1))
    gram_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, gl))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    d = d.select(
        id_col,
        F.transform(F.sequence(F.lit(0), m - 1), gram_hash).alias("__hs"),
    )
    mm = F.size(F.col("__hs"))
    wl = F.least(F.lit(w), mm)  # window length (all grams when m < w)
    pick = lambda j: F.aggregate(  # rightmost minimal hash  # noqa: E731
        F.sequence(j, j + wl - 1),
        F.struct(
            F.lit(1 << 62).cast("long").alias("h"),
            F.lit(-1).cast("long").alias("p"),
        ),
        lambda acc, p: F.when(
            F.element_at(F.col("__hs"), p.cast("int") + 1) <= acc["h"],
            F.struct(
                F.element_at(F.col("__hs"), p.cast("int") + 1).alias("h"),
                p.cast("long").alias("p"),
            ),
        ).otherwise(acc),
    )
    sel = F.array_distinct(
        F.transform(F.sequence(F.lit(0), mm - wl), pick)
    )
    return d.select(id_col, F.explode(sel).alias("__s")).select(
        id_col,
        F.col("__s.p").alias("pos"),
        F.col("__s.h").alias("fp"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-level Shannon entropy in bits/char — the
    compression-ratio quality proxy (low-entropy docs are repetitive
    boilerplate/padding; near-log2(charset) docs are random noise;
    natural text sits ~4.0-4.5). Returns
    (id, n_chars, n_distinct_chars, entropy_bits, ideal_bytes) where
    ideal_bytes = ceil(n·H/8) is the entropy-coding lower bound an
    actual compressor approaches.

    Shape: pure projection, zero shuffle. The char array is SORTED and
    the p·ln p terms accumulate over its runs in that order — the
    IDENTICAL IEEE sequence the round-6 sorted-distinct fold (and the
    unchanged DuckDB oracle) produces, since both visit charset
    members in sorted order and add one term each. One pass
    (O(n log n) sort + O(n) fold) replaces the round-6
    O(distinct × n) per-distinct-char rescan (VERDICT r6 wrong #2);
    the final value is rounded to 1e-6 to absorb last-ulp ln()
    differences across engines."""
    c = F.col(text_col)
    chars = F.split(c, "")
    d = df.select(
        F.col(id_col),
        F.array_sort(chars).alias("__ss"),
        F.length(c).cast("long").alias("n_chars"),
        F.size(F.array_distinct(chars)).cast("long").alias("n_distinct_chars"),
    )
    nn = F.col("n_chars").cast("double")

    def term(run):  # (run/n)·ln(run/n), the same expression tree per run
        p = run.cast("double") / nn
        return p * F.log(p)

    # run-length fold: state (prev char, run length, accumulated sum).
    # A run closes when the next char differs; the last run closes in
    # the finish lambda. Term order == sorted charset order.
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("acc"),
    )
    folded = F.aggregate(
        F.col("__ss"),
        zero,
        lambda a, ch: F.when(
            a["run"] == F.lit(0),
            F.struct(
                ch.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                a["acc"].alias("acc"),
            ),
        )
        .when(
            ch == a["prev"],
            F.struct(
                a["prev"].alias("prev"),
                (a["run"] + F.lit(1)).alias("run"),
                a["acc"].alias("acc"),
            ),
        )
        .otherwise(
            F.struct(
                ch.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (a["acc"] + term(a["run"])).alias("acc"),
            )
        ),
        lambda a: a["acc"]
        + F.when(a["run"] > F.lit(0), term(a["run"])).otherwise(F.lit(0.0)),
    )
    ent = -folded / float(math.log(2.0))
    # ideal_bytes derives from the ROUNDED entropy: once round-6 agrees
    # across engines the remaining arithmetic (and its ceil) is
    # bit-identical IEEE — a ceil over the raw ln()-sum would not be.
    e6 = F.round(ent, 6)
    return d.select(
        id_col,
        "n_chars",
        "n_distinct_chars",
        e6.alias("entropy_bits"),
        F.ceil(F.col("n_chars") * e6 / 8).cast("long").alias("ideal_bytes"),
    )


def greedy_pack(
    df: DataFrame,
    budget: int,
    n_shards: int = 16,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: Column | None = None,
) -> DataFrame:
    """Non-splitting first-fit packing: docs are laid into
    ``budget``-token bins WITHOUT straddling (the SFT/finetune
    posture where an example must stay contiguous, unlike
    sequence_packing's pre-training stream split). Scan docs in
    deterministic id order; a doc that no longer fits closes the bin;
    docs longer than budget are truncated to one full bin. Emits per
    doc: (part, shard, id, bin, bin_offset, n_packed, truncated) —
    the padding waste is bin count · budget − Σ n_packed, the number
    an SFT data loader actually pays.

    The packing recurrence (fill' = fill+n unless it overflows) is
    non-associative, so no window cumsum expresses it; this is the
    legitimate applyInPandas tier (SURVEY §4): one Arrow-batched
    sequential scan per (part, shard) group. Groups are bounded by
    construction — the md5 shard splits each source into n_shards
    independent pack streams (the same layout shuffle_shards ships),
    so group size is corpus_size/(sources·n_shards) and the scan
    parallelizes across the cluster regardless of corpus scale.

    ``count_col`` overrides the length measure (default: whitespace
    token_count). Pass ``bpe_token_count(text_col)`` for
    TOKENIZER-AWARE packing — bins then hold what the model actually
    consumes, so budget maps 1:1 to context length instead of
    undershooting by the whitespace/BPE fertility ratio."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|pack")))
    rows = df.select(
        F.col(part_col).alias("part"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
            "shard"
        ),
        F.col(id_col).alias("doc_id"),
        (
            count_col if count_col is not None else token_count(text_col)
        ).cast("long").alias("n_tok"),
    )
    schema = (
        "part string, shard long, doc_id long, bin long, "
        "bin_offset long, n_packed long, truncated boolean"
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id")
        out = []
        bin_id, fill = 0, 0
        for r in pdf.itertuples(index=False):
            n_eff = min(int(r.n_tok), budget)
            if fill + n_eff > budget and fill > 0:
                bin_id += 1
                fill = 0
            out.append(
                (
                    r.part,
                    int(r.shard),
                    int(r.doc_id),
                    bin_id,
                    fill,
                    n_eff,
                    int(r.n_tok) > budget,
                )
            )
            fill += n_eff
            if fill >= budget:
                bin_id += 1
                fill = 0
        import pandas as _pd

        return _pd.DataFrame(
            out,
            columns=[
                "part",
                "shard",
                "doc_id",
                "bin",
                "bin_offset",
                "n_packed",
                "truncated",
            ],
        )

    return rows.groupBy("part", "shard").applyInPandas(pack, schema)


def canonical_fingerprint(col: str | Column = "text") -> Column:
    """md5 of the casefolded, punctuation-stripped, whitespace-
    collapsed text: the normalization-invariant exact-dedup key.

    Raw-hash dedup (functions/dedup.py exact_duplicates) misses the
    enormous class of trivially-edited duplicates - case changes,
    punctuation/markup residue, reflowed whitespace. Folding to
    [a-z0-9]+ islands joined by single spaces before hashing catches
    those while never merging texts whose alphanumeric content
    differs. Pure projection, fuses with the scan."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")))


def url_normalize(col: str | Column) -> Column:
    """Canonical URL dedup key — the CommonCrawl curation posture
    where the FIRST dedup pass is by normalized URL, long before any
    content hash is computed (it needs no text at all, so it prunes
    refetches/mirrors at the index stage). Normalization, in order:
    lowercase; strip fragment (#...); strip query string (?...);
    strip the scheme (http:// et al.); strip one leading 'www.';
    strip trailing slashes. What survives — host + path — is the
    dedup identity: scheme flips, tracking params, fragments and the
    www. alias never split a page into distinct keys, while distinct
    paths never merge. Pure projection, fuses with the scan."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(c)
    u = F.regexp_replace(u, "#.*$", "")
    u = F.regexp_replace(u, r"\?.*$", "")
    u = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    return F.regexp_replace(u, "/+$", "")


def url_domain(col: str | Column) -> Column:
    """Host part of a NORMALIZED url (everything before the first
    '/') — the rollup key for per-domain curation stats."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, "^[^/]*", 0)


def _bigram_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, t1, bg) with one row per adjacent-token OCCURRENCE:
    t1 = head token, bg = 'head tail'. Docs under 2 tokens yield no
    rows (sequence(0, -1) would DESCEND - the explicit empty branch
    mirrors the shingles() guard and the oracle's CASE)."""
    t = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__toks"))
    pairs = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - 2),
            lambda i: F.struct(
                F.element_at("__toks", i + 1).alias("t1"),
                F.concat_ws(
                    " ",
                    F.element_at("__toks", i + 1),
                    F.element_at("__toks", i + 2),
                ).alias("bg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<t1:string,bg:string>>"))
    return t.select("doc", F.explode(pairs).alias("p")).select("doc", "p.t1", "p.bg")


def bigram_lm_scores(
    df: DataFrame,
    train_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one
    (Laplace) smoothed bigram LM trained on a REFERENCE slice of the
    corpus - the CCNet recipe (Wenzek et al. 2020: rank CommonCrawl
    by the perplexity of a LM trained on a clean reference), with the
    LM degraded to bigrams so both engines replay it exactly.

    p(t2|t1) = (c(t1 t2) + 1) / (c1(t1) + V): bigram and head counts
    from the reference slice only; V = reference distinct-token
    vocabulary (one-row broadcast). Unseen bigrams/heads coalesce to
    0, landing on the Laplace floor. Docs shorter than 2 tokens have
    no bigrams and no output row.

    Shape: bigram tables are pure projections (no self-join); the two
    count joins shuffle on the bigram / head keys (NOT broadcast - a
    web-scale vocabulary is corpus-sized); the score is a sum of
    ln() over exact rationals rounded 6dp - the unigram_lm_scores
    determinism contract."""
    bg = _bigram_table(df, id_col, text_col)
    tr = df.filter(train_pred)
    tbg = _bigram_table(tr, id_col, text_col)
    c12 = tbg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tbg.groupBy("t1").agg(F.count(F.lit(1)).alias("c1"))
    v = _token_table(tr, id_col, text_col).agg(
        F.countDistinct("term").cast("double").alias("v")
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
    )
    return (
        bg.join(c12, "bg", "left")
        .join(c1, "t1", "left")
        .join(F.broadcast(v))
        .groupBy("doc")
        .agg(
            F.round(F.sum(F.log(p)) / F.count(F.lit(1)), 6).alias("mean_logprob"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        )
    )


def pii_counts(col: str | Column = "text") -> list[Column]:
    """Per-class PII hit counts (email / IPv4 / phone) as JVM
    regexp_count projections - the detection half of pii_scrub, for
    routing decisions (count > 0 -> scrub lane) and per-source PII-
    density reports. Same RE2/Java-agreeing patterns as the scrubber."""
    c = F.col(col) if isinstance(col, str) else col
    names = ["n_emails", "n_ips", "n_phones"]
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(n)
        for (pat, _), n in zip(PII_PATTERNS, names)
    ]


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4), fully
    deterministic: each consecutive 20-token block has one 3-token
    span masked (15% corruption rate) at an md5-derived offset, the
    input keeping a per-block sentinel <Xk> where the span was and
    the target emitting sentinel + span - the denoising-objective
    transform, reproducible across engines/runs/partitionings (no
    rand()). Offsets are a 52-bit hash int mod 18, integer-exact in
    both engines. Pure projection (nested array transforms, zero
    shuffle); output rows carry span counts plus input/target
    fingerprints."""
    toks = tokens(text_col)
    t = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("__n"),
    )
    n = F.col("__n")
    nb = ((n + 19) / 20).cast("long")
    did = F.col("doc_id").cast("string")

    def off(k):  # md5-derived span offset 0..17 for block k
        h13 = F.substring(
            F.md5(F.concat(did, F.lit("|sc"), k.cast("string"))), 1, 13
        )
        return F.conv(h13, 16, 10).cast("long") % 18

    def sentinel(k):
        return F.concat(F.lit("<X"), k.cast("string"), F.lit(">"))

    tk = F.col("__toks")

    def block_input(k):
        b, s = k * 20, off(k)
        pre = F.slice(tk, b + 1, s)
        post_len = F.greatest(F.lit(0), F.least(F.lit(20), n - b) - s - 3)
        post = F.slice(tk, b + s + 4, post_len)
        return F.concat(pre, F.array(sentinel(k)), post)

    def block_target(k):
        b, s = k * 20, off(k)
        c_len = F.least(F.lit(3), F.greatest(F.lit(0), F.least(F.lit(20), n - b) - s))
        return F.concat(F.array(sentinel(k)), F.slice(tk, b + s + 1, c_len))

    blocks = F.sequence(F.lit(0).cast("long"), nb - 1)
    inp = F.flatten(F.transform(blocks, block_input))
    tgt = F.flatten(F.transform(blocks, block_target))
    return t.select(
        "doc_id",
        n.alias("n_tokens"),
        nb.alias("n_spans"),
        (F.size(tgt).cast("long") - nb).alias("n_corrupted"),
        F.md5(F.concat_ws(" ", inp)).alias("input_fp"),
        F.md5(F.concat_ws(" ", tgt)).alias("target_fp"),
    )
