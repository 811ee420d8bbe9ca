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
    # ---- ROUND-14 WINDOW (positions 1-50) ------------------------------
    # Per VERDICT r13 directive #1: (a) the staged ROUND-14 FRONT — the
    # round-13 addition ivfpq_geometry_report (the one catalog query
    # without a driver row; judge strict-checked green at both SFs) plus
    # the 26 remaining r07-hashed rows — then (b) the 6 rows whose plans
    # change THIS round (two-level/sampled IVF-PQ build + nprobe regime
    # per directives #2/#3; audit-only seeded tier per #4; stored
    # arrival fingerprints per #5), then (c) 17 of the 49 rows whose
    # latest driver hash is r08 — the stalest tier once (a) gates.
    # After r14 gates, the staleness floor is r08-except-32.
    # -- (a) the round-13 addition + the 26 remaining r07 rows: ----------
    "ivfpq_geometry_report",
    "image_resize_real",
    "kl_divergence_sources",
    "per_source_quantile_filter",
    "predict_linear",
    "project2",
    "quality_repetition_corr",
    "rrf_fusion",
    "scd2_state_history",
    "stable_2h",
    "streaming_ann_gate",
    "streaming_drift_gate",
    "streaming_funnel_drained",
    "streaming_scd2_drained",
    "streaming_stable_drained",
    "streaming_token_budget_drained",
    "streaming_url_gate_drained",
    "throttle",
    "token_pack_efficiency",
    "top10",
    "topic_mixture",
    "url_dedup",
    "watermark_sizing_report",
    "weighted_sample",
    "whitened_semantic_dedup",
    "winnowing_keeplist",
    "zorder_layout",
    # -- (b) the 6 rows whose plans change this round: --------------------
    "ann_recall_ivfpq",
    "knn_ivfpq",
    "knn_ivfpq_rerank",
    "incremental_cc_from_table",
    "incremental_cc_warmstart",
    "band_index_compaction",
    # -- (c) 17 of the 49 r08-hashed rows: --------------------------------
    "asof_enrich",
    "by_derived_key",
    "canonical_pipeline",
    "contamination",
    "contamination_bloom",
    "corpus_profile",
    "curation_pipeline",
    "ddt_real",
    "dedup_clusters",
    "dedup_embedding",
    "dedup_keep_list",
    "deps_algebra",
    "deps_suppression",
    "distinct_ngrams_hll",
    "distinct_ngrams_kmv",
    "embedding_drift_report",
    "embedding_quantize",
    # ---- ROUND-15 FRONT (positions 51+): the round-14 catalog addition
    # (strict-checked at sf0.001+sf0.01+sf0.1 via tools/check.py before
    # registration; driver row owed r15), then the remaining 32 r08 rows
    "ann_nprobe_sweep",
    "ewma_r01",
    "filter_agg",
    "fixed_time_window",
    "fold_difference",
    "fold_generic",
    "fold_mode",
    "fold_mode_hourly",
    "fold_product",
    "fold_quotient",
    "fold_quotient_take5",
    "gopher_gates",
    "graphite_roundtrip",
    "hash_split",
    "index_delete_cohort",
    "json_roundtrip",
    "moving_time_window",
    "protobuf_roundtrip",
    "rate_zero_fill",
    "regional_revenue",
    "retrieval_eval_report",
    "retrieval_eval_rrf",
    "revenue_top10",
    "rollup",
    "sorted_sample",
    "streaming_index_snapshot",
    "tpch_q1",
    "tpch_q12",
    "tpch_q14",
    "tpch_q16",
    "tpch_q4",
    "warmstart_savings_report",
    "window_folds",
]

_ROUND13_WINDOW_RETIRED = [
    # ---- retired ROUND-13 WINDOW + staged r14 front (historical record;
    # all 50 gated green in CORRECTNESS_r13) -----------------------------
    "moving_event_window",
    "ngram_novelty",
    "packing_efficiency",
    "percentiles_day",
    "perplexity_buckets",
    "psi_drift",
    "runs3",
    "soft_dedup_weights",
    "source_overlap_matrix",
    "span_corruption",
    "streaming_blocklist_gate",
    "streaming_bottomk_drained",
    "streaming_contamination_gate",
    "streaming_embedding_gate",
    "streaming_pii_gate",
    "streaming_quality_gate",
    "video_scene_cuts",
    "vocab_growth",
    "zipf_slope",
    "streaming_contamination_writeback_drained",
    "ann_recall_ivfpq",
    "knn_ivfpq",
    "knn_ivfpq_trained",
    "knn_ivfpq_rerank",
    "incremental_cc_from_table",
    "incremental_cc_warmstart",
    "ann_gate_report",
    "apdex",
    "bm25_topk",
    "burst_interval_join",
    "clock_skew",
    "cohort_retention",
    "containment_dedup",
    "corpus_cube",
    "coverage_gaps",
    "curriculum_order",
    "dedup_threshold_sweep",
    "domain_pagerank",
    "domain_quality_rollup",
    "dup_rate_by_source",
    "duplicate_span_removal",
    "edit_distance_verify",
    "embedding_outliers",
    "embedding_pca1",
    "event_funnel",
    "fill_in",
    "funnel_latency",
    "greedy_pack_tokens",
    "hits_scores",
    "incremental_dedup",
    "ivfpq_geometry_report",
    "image_resize_real",
    "kl_divergence_sources",
    "per_source_quantile_filter",
    "predict_linear",
    "project2",
    "quality_repetition_corr",
    "rrf_fusion",
    "scd2_state_history",
    "stable_2h",
    "streaming_ann_gate",
    "streaming_drift_gate",
    "streaming_funnel_drained",
    "streaming_scd2_drained",
    "streaming_stable_drained",
    "streaming_token_budget_drained",
    "streaming_url_gate_drained",
    "throttle",
    "token_pack_efficiency",
    "top10",
    "topic_mixture",
    "url_dedup",
    "watermark_sizing_report",
    "weighted_sample",
    "whitened_semantic_dedup",
    "winnowing_keeplist",
    "zorder_layout",
]

_ROUND12_WINDOW_RETIRED = [
    # ---- retired ROUND-12 WINDOW (kept for the historical record; all
    # 50 gated green in CORRECTNESS_r12): the 12 remaining r05-stale
    # rows, the 7 round-11 additions, 31 r06 rows -------------------------
    "streaming_rate_closed",
    "streaming_slo_burn_drained",
    "streaming_top_drained",
    "tagged_filter",
    "text_features",
    "top_suppliers_per_part",
    "tpch_q11",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "transform_fields",
    "where_filter",
    "knn_ivfpq_rerank",
    "band_index_compaction",
    "contamination_from_table",
    "streaming_index_drift_drained",
    "knn_ivfpq_trained",
    "streaming_contamination_gate_drained",
    "eval_index_writeback",
    "dedup_recall_report",
    "embedding_contamination",
    "winnowing_fingerprints",
    "winnowing_overlap",
    "ann_truncation_report",
    "audio_envelope_dedup",
    "audio_vad_segments",
    "bigram_lm_score",
    "blocklist_gate",
    "boilerplate_removal",
    "bottomk_sample",
    "canonical_dedup",
    "changed_state",
    "char_entropy",
    "chunk_sliding_window",
    "classifier_calibration",
    "cluster_aware_split",
    "contamination_gate_report",
    "counter_running",
    "ddt",
    "dedup_cluster_representatives",
    "dedup_clusters_verified",
    "ewma",
    "fim_transform",
    "fixed_event_window",
    "fuzzy_decontamination",
    "greedy_pack_bins",
    "image_dhash_keeplist",
    "image_dhash_neardup",
    "length_bucket_batches",
    "mixture_epoch_plan",
]

_ROUND11_WINDOW_RETIRED = [
    # ---- retired ROUND-11 WINDOW (kept for the historical record; all
    # 50 gated green in CORRECTNESS_r11) ---------------------------------
    # -- (a) the 12 never-externally-gated round-10 additions: -----------
    "knn_pq_from_table",
    "pq_code_maintenance",
    "dedup_tier_agreement",
    "classifier_uncertainty_sampling",
    "streaming_neardup_probe_drained",
    "knn_ivfpq",
    "mixture_anneal_schedule",
    "ann_recall_ivfpq",
    "simhash64_candidates",
    "tokenizer_fertility_drift",
    "streaming_fertility_gate_drained",
    "contamination_after_dedup",
    # -- (b) first 38 of the 50 r05-hashed rows: --------------------------
    "bpe_tokenize",
    "curation_funnel",
    "customers_without_orders",
    "dedup_embedding_keeplist",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_token_savings",
    "dsir_selection",
    "graphite_dead_letter",
    "holt_forecast",
    "index_expired",
    "index_latest",
    "index_search",
    "influx_line_roundtrip",
    "knn_hamming",
    "knn_ivf_kmeans",
    "lang_id",
    "mix_temperature",
    "multimodal_features",
    "prometheus_rw_roundtrip",
    "prometheus_text_roundtrip",
    "quality_score",
    "rate_per_hour",
    "salted_agg_by_state",
    "sample_per_source",
    "segment_dedup_keep_first",
    "shuffle_shards",
    "split_route",
    "streaming_anomaly_drained",
    "streaming_batch_drained",
    "streaming_coalesce_drained",
    "streaming_dedup_minhash_drained",
    "streaming_ewma_halflife",
    "streaming_fill_in_last_drained",
    "streaming_heavy_hitters_closed",
    "streaming_moving_time_drained",
    "streaming_percentiles_histogram_closed",
    "streaming_project_drained",
]

def _reorder(d: dict) -> dict:
    prio = [n for n in _GATE_PRIORITY if n in d]
    rest = [n for n in d if n not in set(prio)]
    return {n: d[n] for n in prio + rest}


QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)

__all__ = ["QUERIES", "ORACLES"]
