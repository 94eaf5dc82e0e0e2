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

    return registry.REGISTRY


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
