"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``foxsec_pipeline_spark.plans.catalog``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from foxsec_pipeline_spark.plans.catalog import registry  # noqa: E402

# The driver records exactly the FIRST 50 rows of queries()
# (registration-order prefix; counted against CORRECTNESS_r01..r07).
# Round-8 ordering per the r7 verdict (VERDICT.md "Next round" item 1):
#   1. The 18 stalest-evidence rows lead, BEFORE any new r8 queries:
#      the 16 queries whose last green driver row is r2 (missed the
#      r7 prefix by 16 slots) plus the two whose implementation
#      changed AFTER their r6 driver row (kcenter_coreset_picks via
#      similarity.py's pre-sample enforcement, multimodal_phash_dedup
#      via multimodal.py's real DCT/decode) — the only
#      evidence-predates-code rows in the catalog.
#   2. NEW round-8 queries next (never driver-checked).
#   3. Then the rest of the catalog, stalest last-green row first
#      (r3 -> r4 -> r6 -> r7), computed from CORRECTNESS_r0*.json.
_STALE_PRIORITY_R8 = [
    # 16 last-green-in-r2 rows (r7 verdict's explicit list)
    "etd_finding_matcher", "aws_behavior_match",
    "amo_addon_matcher", "amo_multi_submit", "amo_cloud_submission",
    "amo_fxa_ban_pattern", "amo_report_restriction",
    "source_login_failure_dist", "content_server_variance",
    "customs_activity_monitor", "login_failure_at_risk_account",
    "customs_alert_fanout", "customs_prefilter_split", "alert_pipeline",
    "violation_projection", "notify_merge",
    # code changed after their last (r6) driver row
    "kcenter_coreset_picks", "multimodal_phash_dedup",
]

# NEW in round 8 — never driver-checked; appended as each query lands
# with its oracle + plan assertion + SCALE.md entry. Keep <= 22 so the
# 50-row prefix still re-greens >= 25 stale rows (18 above + the tail
# of _STALE_R3 below). account_creation_dist and
# record_linkage_blocking changed code this round (density-aware hot
# guards) — account_creation_dist sits in the r3-stale prefix tail
# already; record_linkage_blocking is re-listed here so its r8 row
# postdates the change.
_NEW_R8: list[str] = [
    "c4_quality_rules", "contamination_overlap_fraction",
    "priority_sample_weighted", "embedding_norm_outliers",
    "ann_range_search", "password_spray_detection",
    "dormant_reactivation_burst", "latency_p95_slo",
    "error_budget_burn", "multimodal_frame_sample",
    "mmr_diversified_topk", "knn_label_vote",
    "part_supplier_variety", "latency_p95_regression",
    "multimodal_audio_energy", "user_feature_snapshot",
    "record_linkage_blocking",
]

# Last green driver row r2 (remaining 27 of the old 43 re-greened in
# r7; these 27 are now r7-fresh and live in _FRESH_R7 below).
_STALE_R2: list[str] = []

# Last green driver row r3 (47 entries).
_STALE_R3 = [
    "status_code_rate_analysis", "endpoint_abuse_analysis",
    "alert_summary_delta", "account_creation_dist", "assume_role_correlate",
    "private_relay_forward", "password_reset_abuse", "account_enumeration",
    "customs_pipeline", "dedup_ngram_jaccard", "dedup_simhash",
    "ann_cosine_ivf", "ann_cosine_pq", "embedding_int8_quantize",
    "gopher_topngram", "dedup_embedding_cosine", "part_supplier_stats",
    "supplier_return_candidates", "kmeans_codebook", "passage_dedup",
    "ngram_corpus_stats", "shipping_priority", "customer_order_distribution",
    "dedup_simhash_pairs", "tfidf_top_terms", "postprocessing_pipeline",
    "small_lot_revenue", "dormant_customer_balance", "funnel_conversion",
    "retention_cohorts", "timeseries_resample", "min_cost_supplier",
    "nation_volume_shipping", "nation_market_share", "product_type_profit",
    "returned_item_customers", "important_parts_value", "promo_revenue_ratio",
    "top_revenue_supplier", "disjunctive_quantity_revenue",
    "waiting_orders_suppliers", "asof_join_purchase",
    "interval_error_click_count", "rolling_user_value", "scd2_user_segment",
    "robust_outlier_mad", "last_touch_attribution",
]

# Last green driver row r4 (45 entries).
_STALE_R4 = [
    "hard_limit_analysis", "error_rate_analysis", "detect_nat",
    "endpoint_sequence_abuse", "session_analysis", "alert_summary_sliding",
    "source_correlation", "event_filter_dsl", "cidr_exclusion",
    "geo_velocity", "levenshtein_similarity", "ua_blocklist",
    "alert_suppression", "authprofile_parse_filters", "global_stats",
    "crit_object_analyze", "identity_resolution", "customs_features",
    "multi_ip_login", "watchlist_match", "guardduty_finding_matcher",
    "addon_multi_match", "fxa_alias_abuse", "pioneer_exfil_sessions",
    "customs_summary", "email_normalize", "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "sequence_packing", "user_event_pivot",
    "value_deciles", "training_data_pipeline", "bloom_decontaminate",
    "containment_dedup", "doc_language_mix", "cdc_merge_upserts",
    "window_dedup_latest", "approx_quantile_sketch", "value_histogram",
    "order_rollup_revenue", "url_normalize_stats", "sessionize_clickstream",
    "pivot_event_matrix", "parse_normalize",
]

# Green in round 6 (kcenter_coreset_picks / multimodal_phash_dedup
# moved up to _STALE_PRIORITY_R8 — code changed after their r6 row).
_FRESH_R6 = [
    "threshold_analysis", "rag_chunk_passages", "exact_substring_dedup",
    "countmin_heavy_hitters", "epoch_mixture_plan", "bpe_train_merges",
    "bpe_token_counts", "winnowing_fingerprints", "inverted_index_stats",
    "winnowing_plagiarism_pairs", "prefix_jaccard_join",
    "gini_token_diversity", "vocab_growth_curve", "source_rank_normalize",
    "ann_cosine_lsh", "embedding_cluster_summary", "semdedup",
    "sketch_distinct_users", "dataset_split_assign", "mixture_budget_sample",
    "split_leakage_check", "rrf_hybrid_fusion",
    "suspicious_ip_cooccurrence",
    "data_quality_checks", "skew_diagnosis", "zorder_layout_stats",
    "hourly_trend_slopes", "ivm_incremental_agg", "frequent_itemsets",
    "changepoint_mean_shift", "snapshot_diff", "markov_transitions",
    "copurchase_triangles", "sliding_distinct_hll_merge",
    "pareto_frontier_parts", "weighted_median_price", "theil_sen_trend",
    "copurchase_pagerank", "benford_first_digit", "ks_drift_orders",
    "hll_intersection_overlap", "beacon_detection", "copurchase_link_jaccard",
    "reputation_decay", "top_session_paths", "transition_dwell_times",
    "large_order_customers", "scd2_point_in_time_join",
]

# Green in round 7 (freshest evidence; deepest backlog region).
_FRESH_R7 = [
    "corpus_drift", "oov_rate_filter", "seasonal_anomaly",
    "shared_state_at_risk", "reservoir_sample_per_key",
    "lm_typicality_filter", "consistent_hash_assignment",
    "autocorrelation_lags",
    "ngram_novelty_score", "dsir_importance_weights",
    "bm25_topk_retrieval", "kcore_decomposition", "cluster_canonical_docs",
    "tokenizer_fertility", "session_overlap_pairs",
    "new_vs_returning_users", "category_lift_matrix",
    "telemetry_gap_detection", "khop_reachability",
    "record_linkage_sorted_neighborhood",
    "text_stats", "text_quality",
    "alert_summary_rollup", "auth_state_decision", "session_limit_analysis",
    "per_endpoint_error_rate", "threshold_with_nat_exclusion",
    "salted_hard_limit", "authprofile_pipeline", "status_comparator",
    "source_login_failure", "dedup_clusters", "ann_cosine_lsh_multiprobe",
    "token_count_bpe", "text_repetition", "regional_revenue",
    "stratified_sample", "decontaminate", "pii_scrub",
    "quality_filter_pipeline", "language_id", "doc_fingerprint",
    "multimodal_metadata", "pricing_summary", "segment_revenue",
    "priority_semijoin", "topk_per_group", "events_dim_join",
    "xff_client_select",
]

# The 50-row prefix is: 18 priority stale rows + N new r8 queries +
# (32 - N) of the stalest r3 rows. Keep N <= 22 so the prefix
# re-greens >= 25 stale rows (18 + >= 10).
_VERIFY_FIRST = [
    *_STALE_PRIORITY_R8, *_NEW_R8,
    *_STALE_R2, *_STALE_R3, *_STALE_R4, *_FRESH_R6, *_FRESH_R7,
]


def _ordered():
    reg = registry()
    missing = [n for n in _VERIFY_FIRST if n not in reg]
    assert not missing, f"_VERIFY_FIRST references unknown queries: {missing}"
    rest = [n for n in reg if n not in set(_VERIFY_FIRST)]
    return {n: reg[n] for n in [*_VERIFY_FIRST, *rest]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: session analysis —
    the heart of the reference's heuristics (per-key session windows
    with inactivity gap) as one declarative Spark plan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ parquet timestamps are cast to TIMESTAMP under the SESSION
    # timezone (load_tables); pin UTC so a driver-built session matches
    # the DuckDB oracle's naive-UTC reading regardless of machine tz
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spec = registry()["session_analysis"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries
    fall back to the driver's rows-only check)."""
    return {
        name: spec.oracle.strip()
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
