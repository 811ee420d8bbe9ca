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

from pyspark.sql import Column, DataFrame
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
