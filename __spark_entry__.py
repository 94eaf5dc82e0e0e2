"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``autosinapi_spark.plans`` — the query registry holds
one entry per implemented operator from SURVEY.md §2 plus the
LLM-pipeline extensions, each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    # All query modules register on import.
    from autosinapi_spark.plans import registry
    import autosinapi_spark.plans.queries  # noqa: F401
    import autosinapi_spark.plans.bom_queries  # noqa: F401
    import autosinapi_spark.plans.text_queries  # noqa: F401
    import autosinapi_spark.plans.similarity_queries  # noqa: F401
    import autosinapi_spark.plans.sink_queries  # noqa: F401
    import autosinapi_spark.plans.coercion_queries  # noqa: F401
    import autosinapi_spark.plans.near_dedup_queries  # noqa: F401
    import autosinapi_spark.plans.sinapi_queries  # noqa: F401
    import autosinapi_spark.plans.multimodal_queries  # noqa: F401
    import autosinapi_spark.plans.sql_queries  # noqa: F401
    import autosinapi_spark.plans.skew_queries  # noqa: F401
    import autosinapi_spark.plans.asof_queries  # noqa: F401
    import autosinapi_spark.plans.range_queries  # noqa: F401
    import autosinapi_spark.plans.curation_queries  # noqa: F401
    import autosinapi_spark.plans.session_queries  # noqa: F401
    import autosinapi_spark.plans.graph_queries  # noqa: F401
    import autosinapi_spark.plans.corpus_queries  # noqa: F401
    import autosinapi_spark.plans.linalg_queries  # noqa: F401
    import autosinapi_spark.plans.graph_analytics_queries  # noqa: F401
    import autosinapi_spark.plans.olap_queries  # noqa: F401
    import autosinapi_spark.plans.tpch_gap_queries  # noqa: F401
    import autosinapi_spark.plans.streaming_queries  # noqa: F401
    import autosinapi_spark.plans.behavior_queries  # noqa: F401
    import autosinapi_spark.plans.staged_r9  # noqa: F401

    return _prioritized(registry.REGISTRY)


# The round driver's correctness run covers a bounded prefix of the
# registry (r04 stopped at the first 50 of 81 entries), so ordering is
# the only lever that decides which queries get a hard oracle-parity
# signal. Front-load (a) queries that have never had a driver row,
# (b) queries whose code changed this round, then (c) long-green rows
# as filler. Anything not listed keeps registration order at the end.
_PRIORITY: tuple[str, ...] = (
    # ---- r9 front window (first 50 = the driver's correctness window;
    # composition enforced by tools/rotation_check.py; docs/R9_PLAN.md) ----
    # (a) the 20 queries flipped from plans/staged_r9 — never
    # driver-checked (built + oracle-tested + scale-measured in r8)
    "ann_recall_eval",
    "association_rules_2item",
    "bpe_train_merges",
    "chi2_independence_ppm",
    "collocation_pmi_bigrams",
    "compaction_bin_packing",
    "cusum_changepoints",
    "data_quality_expectations",
    "dp_noisy_counts",
    "histogram_quantile_cents",
    "hll_distinct_flags",
    "holt_trend_forecast",
    "incremental_agg_maintenance",
    "join_size_cms_estimate",
    "mad_outlier_flags",
    "ols_trend_fit",
    "personalized_pagerank_nation",
    "sssp_weighted_distances",
    "streaming_kmv_distinct",
    "systematic_weighted_sample",
    # (b) the 6 manual promotions demoted in late r8 (shared-helper
    # rule carry-over; 3 are r5-green, 3 r7-green)
    "sinapi_cost_lookup_q1",
    "item_cooccurrence_triangles",
    "snapshot_diff_cdc",
    "asof_next_quote",
    "sinapi_unpivot_precos",
    "user_status_sync",
    # (b2) r9 changed-code + new: derive_lsh_params now mirrors the
    # oracle's FLOOR(log2+0.5) literally (helper-level edit — the
    # fingerprint can't see it, so its two consumers are promoted by
    # hand per the rotation rule); hybrid_search_rrf was refactored
    # onto the shared _rrf_arms/_rrf_fuse helpers that its new
    # quality harness hybrid_pooled_recall_eval (never checked)
    # also consumes
    "ann_lsh_topk_auto",
    "near_dedup_embedding",
    "hybrid_search_rrf",
    "hybrid_pooled_recall_eval",
    # semdedup_embeddings: rewritten late r9 onto corpus-derived
    # product cells (the r9 full-registry sweep measured the pinned
    # K=32 codebook at 13.3x wall for 10x data; the fix pins cluster
    # occupancy instead — 3.1x measured). Changed code => in-window.
    # It takes the slot ann_ivf_topk held until its late-r9
    # deregistration (flat O(N^1.5) assignment, 20.2x in the same
    # sweep — now the second measured contrast row next to
    # ann_ivf_pq_topk; ann_imi_topk is the registered IVF-family path)
    "semdedup_embeddings",
    # (c) stale fill — the 19 oldest r5-green rows that fit (the five
    # displaced by (b2) — near_dedup_minhash, pii_redact_documents,
    # missing_parts_placeholder, near_dedup_incremental,
    # media_frame_sample — lead the tail pool and MUST take r10
    # window slots: they hit the staleness bound then; see
    # docs/R10_PLAN.md)
    "asof_latest_quote",
    "bm25_doc_ranking",
    "bom_cost_rollup",
    "bom_explode",
    "bom_explode_auto_roots",
    "corpus_shuffle_shards",
    "decontaminate_ngram_overlap",
    "dedup_cluster_resolution",
    "dedup_lines_c4",
    "doc_length_quantiles",
    "doc_mixed_language",
    "doc_repetition_filter",
    "doc_similarity_topk",
    "embedding_pq_codes",
    "event_rate_anomalies",
    "heavy_hitter_tokens",
    "media_binary_stats",
    "media_decode_stats",
    "media_feature_extract",
    # ---- tail: refresh pool, oldest green first (r5 remainder, then
    # r6/r7/r8 cohorts) so a wider driver window always refreshes the
    # stalest rows next; order regenerated mechanically at the r9 flip ----
    "media_frame_sample",
    "missing_parts_placeholder",
    "near_dedup_incremental",
    "near_dedup_minhash",
    "pii_redact_documents",
    "range_join_windows",
    "skew_salted_join",
    "split_train_holdout",
    "sql_text_item_history",
    "stratified_sample_documents",
    "temperature_mix_sources",
    "tfidf_top_terms",
    "url_domain_stats",
    "bracket_revenue_disjunctive",
    "chunk_documents_stride",
    "cluster_balanced_sample",
    "cms_token_frequency",
    "corpus_curation_report",
    "customer_order_distribution",
    "dedup_cluster_keep_best",
    "dedup_substring_spans",
    "doc_feature_hashing",
    "dormant_rich_customers",
    "dsir_gumbel_resample",
    "dsir_importance_weights",
    "embedding_quantize_int8",
    "entity_resolution_parts",
    "event_transition_matrix",
    "funnel_conversion",
    "gopher_quality_flags",
    "grouping_sets_revenue",
    "incremental_rollup_merge",
    "kmeans_cluster_assign",
    "large_volume_customers",
    "nation_market_share",
    "order_priority_late",
    "pack_documents_bins",
    "price_change_analysis",
    "profile_approx_stats",
    "regional_supplier_volume",
    "rolling_active_users",
    "session_window_native",
    "sessionize_events",
    "sink_scd2_history",
    "small_qty_order_revenue",
    "source_token_kl",
    "streaming_ingest_accept",
    "streaming_join_attribution",
    "streaming_window_late_data",
    "suppliers_kept_waiting",
    "top_supplier_revenue",
    "top_unshipped_orders",
    "user_retention_cohorts",
    "ann_bruteforce_topk",
    "ann_pq_adc_topk",
    "bpe_pair_merge_counts",
    "coercion_ptbr_roundtrip",
    "cost_lookup",
    "cube_revenue",
    "doc_bigram_logprob",
    "doc_unigram_logprob",
    "dominant_share_suppliers",
    "dup_overlap_by_source",
    "embedding_covariance",
    "embedding_covariance_hd",
    "embedding_outlier_zscore",
    "embedding_pca_project",
    "embedding_pca_top2",
    "events_gap_fill",
    "hard_negative_mining",
    "inverted_index_postings",
    "item_price_history",
    "kcore_item_graph",
    "min_cost_supplier_per_part",
    "nation_pair_trade_volume",
    "part_revenue_concentration",
    "perplexity_buckets",
    "pricing_summary",
    "product_profit_by_nation",
    "promo_revenue_share",
    "proportional_allocation_sample",
    "returned_item_top_customers",
    "rollup_revenue",
    "sink_append_nodup",
    "sink_replace_period",
    "sink_truncate_reload",
    "sink_upsert_catalog",
    "source_oov_rate",
    "source_zipf_fit",
    "streaming_session_replay",
    "supplier_count_by_part_attrs",
    "user_growth_curve",
    "ann_imi_pq_topk",
    "ann_imi_topk",
    "ann_lsh_topk",
    "ann_sq8_topk",
    "asof_nearest_quote",
    "bfs_khop_distances",
    "customer_revenue_moving_avg",
    "decontaminate_bloom_prefilter",
    "dedup_first_item_per_order",
    "distinct_kmv_orders",
    "doc_bpe_token_count",
    "doc_char_entropy",
    "doc_fingerprint",
    "doc_lang_id",
    "doc_ngram_profile",
    "doc_quality_score",
    "doc_simhash",
    "doc_token_count",
    "doc_winnow_fingerprint",
    "embedding_label_centroids",
    "events_json_extract",
    "exact_dedup_documents",
    "filter_parent_rows",
    "hourly_event_stats",
    "inverted_index_positional",
    "inverted_index_postings_full",
    "item_cooccurrence_pagerank",
    "item_cooccurrence_triangles_oriented",
    "item_price_ewma",
    "key_domain_union",
    "kmv_set_overlap",
    "label_propagation_communities",
    "latest_event_per_user",
    "mmr_diverse_sample",
    "monthly_order_revenue",
    "near_dedup_ngram_jaccard",
    "normalize_text_codes",
    "orphan_check_facts",
    "phrase_match_positional",
    "pivot_qty_by_status",
    "skyline_pareto_parts",
    "sliding_event_stats",
    "union_view_itens",
    "unpivot_qty_by_status",
    "zorder_layout_keys",
    "zorder_skipping_stats",
)


def _prioritized(reg: dict) -> dict:
    # duplicates would silently distort the rotation order (dict
    # construction keeps only the first occurrence) — fail loud instead
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY names"
    ordered = {n: reg[n] for n in _PRIORITY if n in reg}
    ordered.update((n, s) for n, s in reg.items() if n not in ordered)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    reg = _registry()
    return reg["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
