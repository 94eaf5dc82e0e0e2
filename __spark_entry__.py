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

    return _prioritized(registry.REGISTRY)


# The round driver's correctness run covers a bounded prefix of the
# registry (r04 stopped at the first 50 of 81 entries), so ordering is
# the only lever that decides which queries get a hard oracle-parity
# signal. Front-load (a) queries that have never had a driver row,
# (b) queries whose code changed this round, then (c) long-green rows
# as filler. Anything not listed keeps registration order at the end.
_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked (no r03/r04 row)
    "sessionize_events",
    "bm25_doc_ranking",
    "doc_bigram_logprob",
    "doc_unigram_logprob",
    "dedup_substring_spans",
    "dedup_cluster_resolution",
    "dedup_lines_c4",
    "decontaminate_ngram_overlap",
    "pack_documents_bins",
    "stratified_sample_documents",
    "doc_repetition_filter",
    "doc_length_quantiles",
    "corpus_curation_report",
    "temperature_mix_sources",
    "tfidf_top_terms",
    "pii_redact_documents",
    "url_domain_stats",
    "corpus_shuffle_shards",
    "heavy_hitter_tokens",
    "doc_mixed_language",
    "profile_approx_stats",
    # new in round 5 — need their first driver rows
    "split_train_holdout",
    "dup_overlap_by_source",
    "embedding_pq_codes",
    "ann_pq_adc_topk",
    "doc_feature_hashing",
    "event_rate_anomalies",
    "doc_similarity_topk",
    # (a') green in r03 only, outside the r04 window
    "asof_latest_quote",
    "range_join_windows",
    "skew_salted_join",
    "sinapi_unpivot_precos",
    "sinapi_cost_lookup_q1",
    "sql_text_item_history",
    "media_binary_stats",
    "media_decode_stats",
    "media_feature_extract",
    "media_frame_sample",
    # (b) code changed / broken last round
    "latest_event_per_user",
    "embedding_quantize_int8",
    "near_dedup_incremental",
    "near_dedup_embedding",
    "near_dedup_minhash",
    # (c) long-green §2 anchors as filler up to the window
    "pricing_summary",
    "cost_lookup",
    "bom_explode",
    "bom_cost_rollup",
    "bom_explode_auto_roots",
    "user_status_sync",
    "missing_parts_placeholder",
    "monthly_order_revenue",
    "union_view_itens",
    "dedup_first_item_per_order",
    "unpivot_qty_by_status",
    "exact_dedup_documents",
    "hourly_event_stats",
    "customer_revenue_moving_avg",
)


def _prioritized(reg: dict) -> dict:
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
