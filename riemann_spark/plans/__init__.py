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
    # ---- ROUND-9 WINDOW (positions 1-50) -------------------------------
    # Per VERDICT r8 directive #1: (a) the 8 queries that have NEVER
    # had an external driver row take the first slots, (b) then the 27
    # remaining r03-hashed rows, (c) new r9 catalog entries, (d) the
    # oldest r04-hashed rows fill whatever slots remain. Staleness was
    # recomputed from CORRECTNESS_r01-r08 this round (script in the
    # commit message); after r9 gates, the floor moves to r04.
    # -- (a) never-gated (verified via tools/check.py r8, driver-owed):
    "quality_calibration_report",
    "mad_outliers",
    "retrieval_eval_multiquery",
    "session_funnel",
    "streaming_mad_gate",
    "cusum_alerts",
    "streaming_cusum_drained",
    "holt_winters_forecast",
    # -- (b) all 27 r03-hashed rows: --------------------------------------
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "mix_upsample",
    "multimodal_frames",
    "multimodal_real_decode",
    "opentsdb_roundtrip",
    "pii_scrub",
    "repetition_filter",
    "sflatten_regroup",
    "simhash",
    "simhash_candidates",
    "smapcat_tags",
    "sreduce_runmax",
    "stratified_sample",
    "streaming_apdex_closed",
    "streaming_changed_edges",
    "streaming_count_windows",
    "streaming_dedup_fingerprints",
    "streaming_percentiles_closed",
    "streaming_sessions_closed",
    "streaming_throttle_weekly",
    "streaming_trailing_window",
    "streaming_window_folds_closed",
    "tfidf_top_terms",
    "token_stats",
    "unigram_lm_score",
    # -- (c) new round-9 catalog entries: ----------------------------------
    "incremental_cc_from_table",
    "fingerprint_df_report",
    "quality_classifier_train",
    "hard_negative_mining",
    "streaming_retrain_trigger_drained",
    "classifier_train_gate",
    "streaming_classifier_gate_drained",
    "knn_ivf_from_table",
    "ivf_cell_balance_report",
    # -- (d) oldest r04-hashed rows fill the remaining slots: --------------
    "ann_recall_report",
    "anomaly_zscore",
    "attribute_search",
    "audio_features",
    "config_topology",
    "contamination_report",
    "curation_pipeline_cls",
    "dedup_cluster_sizes",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    # ---- ROUND-10 FRONT (positions 51+): remaining r04 rows ------------
    "dedup_pair_provenance",
    "doc_fingerprint",
    "events_heatmap",
    "flap_rate",
    "heavy_hitters_cms",
    "image_features",
    "kafka_codec_roundtrip",
    "knn_ivf_nprobe",
    "knn_pq",
    "knn_pq_rerank",
    "knn_pq_trained",
    "moving_median",
    "multimodal_jpeg_decode",
    "multimodal_video_frames",
    "percentiles_histogram",
    "percentiles_histogram_global",
    "quality_classifier",
    "retention_rollup",
    "segment_dedup",
    "semantic_dedup",
    "sequence_packing",
    "sessionize",
    "slo_burn_rate",
    "source_quality_matrix",
    "substring_dedup",
    "token_budget",
    "token_fertility",
    "tpch_q10",
    "tpch_q13",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
]

def _reorder(d: dict) -> dict:
    prio = [n for n in _GATE_PRIORITY if n in d]
    rest = [n for n in d if n not in set(prio)]
    return {n: d[n] for n in prio + rest}


QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)

__all__ = ["QUERIES", "ORACLES"]
