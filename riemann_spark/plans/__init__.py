"""Query catalog: named (Spark builder, DuckDB oracle SQL) pairs.

This is the correctness surface the driver checks (CORRECTNESS_r{N})
and the inventory the judge reads against SURVEY.md §2. Every oracle is
written to be *bit-deterministic* against the Spark result: exact
DECIMAL sums cast to DOUBLE, identical IEEE expression trees, md5 for
cross-engine hashing, power-of-two EWMA scaling, and explicit
(time, event_id) tie-breaks everywhere an ordering matters.
"""

from riemann_spark.plans.catalog import QUERIES, ORACLES
from riemann_spark.plans import catalog_ml  # merges into QUERIES/ORACLES

# The correctness driver samples the first 50 entries of queries() each
# round.  With >50 catalog entries, dict order decides which queries get
# an external driver row, so we rotate a curated priority prefix each
# round to cycle coverage through the whole catalog.  Round 3 front-loads
# the entries that have never had a driver row (rounds 1-2 gated the
# riemann-core set); everything else keeps its original catalog order
# behind them.  Names listed here but absent from the catalog are
# ignored, so the list is safe across catalog refactors.
_GATE_PRIORITY = [
    # ---- ROUND-7 WINDOW (positions 1-50) -------------------------------
    # Composition per VERDICT r6 directives #1/#2/#7: new round-7
    # catalog entries in FRONT (standing rotation rule), then the two
    # snapshot-commit stragglers that missed the r6 driver gate, then
    # apdex (expired-events semantics + oracle changed in r6 — its
    # last driver row is r01), then the committed staleness rotation
    # (the r02/r03 overflow block carried from the round-6 list).
    #
    # -- new round-7 catalog entries first: ------------------------------
    # (fourth..seventh batches — warehouse/funnel/retrieval/graph/
    # multimodal/span-dedup closers; 19 entries. With these in front,
    # the position-50 cut lands at fill_in: every NEW r7 entry plus
    # the two r6 stragglers plus apdex gate, and 7 of the directive's
    # 8 named rotation rows refresh behind them — tpch_q1 is the
    # first overflow (r02-hashed, bench-timed every round; new-entry
    # precedence is the standing rotation rule).)
    "scd2_state_history",
    "coverage_gaps",
    "bm25_topk",
    "rrf_fusion",
    "embedding_outliers",
    "streaming_scd2_drained",
    "per_source_quantile_filter",
    "kl_divergence_sources",
    "hits_scores",
    "image_resize_real",
    "duplicate_span_removal",
    "event_funnel",
    "streaming_funnel_drained",
    "watermark_sizing_report",
    "funnel_latency",
    "cohort_retention",
    "winnowing_keeplist",
    "topic_mixture",
    "quality_repetition_corr",
    "url_dedup",
    "domain_quality_rollup",
    "greedy_pack_tokens",
    "token_pack_efficiency",
    "streaming_ann_gate",
    "ann_gate_report",
    # -- round-7 second batch: -------------------------------------------
    "curriculum_order",
    "edit_distance_verify",
    "containment_dedup",
    "streaming_token_budget_drained",
    # -- round-7 third batch: --------------------------------------------
    "streaming_url_gate_drained",
    "streaming_drift_gate",
    "weighted_sample",
    "streaming_stable_drained",
    "incremental_dedup",
    "embedding_pca1",
    "burst_interval_join",
    "corpus_cube",
    "whitened_semantic_dedup",
    "zorder_layout",
    "domain_pagerank",
    # -- r6 snapshot-commit queries with no driver hash row yet: ---------
    "dedup_threshold_sweep",
    "dup_rate_by_source",
    # -- re-gate: semantics changed in r6 (expired-events fix): ----------
    "apdex",
    # -- committed rotation: r02-gated rows, staleness order -------------
    "stable_2h",
    "top10",
    "throttle",
    "clock_skew",
    "predict_linear",
    "project2",
    "fill_in",
    "tpch_q1",
    "revenue_top10",
    "tpch_q4",
    "tpch_q12",
    "tpch_q14",
    "tpch_q16",
    "regional_revenue",
    "fixed_time_window",
    "moving_time_window",
    "rollup",
    "ddt_real",
    "sorted_sample",
    "fold_product",
    "deps_suppression",
    "by_derived_key",
    "graphite_roundtrip",
    "protobuf_roundtrip",
    "json_roundtrip",
    "fold_difference",
    "streaming_index_snapshot",
    "filter_agg",
    # -- committed rotation: oldest r03 rows fill the remaining slots ----
    "streaming_window_folds_closed",
    "streaming_percentiles_closed",
    "streaming_count_windows",
    "streaming_trailing_window",
    "streaming_dedup_fingerprints",
    "streaming_changed_edges",
    "streaming_throttle_weekly",
    "streaming_apdex_closed",
    "streaming_sessions_closed",
    "fold_quotient",
    "fold_mode",
    "smapcat_tags",
    "sflatten_regroup",
    # ---- ROUND-8 OVERFLOW (positions 51+) ------------------------------
    # Additional round-7 entries added later this round go in FRONT
    # above (pushing this tail out); unlisted catalog rows follow in
    # catalog order. Recompute staleness from CORRECTNESS_r01-r07
    # next round.
]


def _reorder(d: dict) -> dict:
    prio = [n for n in _GATE_PRIORITY if n in d]
    rest = [n for n in d if n not in set(prio)]
    return {n: d[n] for n in prio + rest}


QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)

__all__ = ["QUERIES", "ORACLES"]
