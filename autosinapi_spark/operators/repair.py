"""Referential-integrity operators: placeholder repair + FK validation.

Reference semantics:

- J1/J2 missing-code detection — codes present in structure but absent
  from the catalog (Python set difference,
  ``/root/reference/autosinapi/etl_pipeline.py:293-296,313-322``)
  -> left-anti join.
- J3 placeholder enrichment — missing codes get template descriptions
  (``INSUMO_DESCONHECIDO_{codigo}``) and a default unit
  (``etl_pipeline.py:300-335``; templates ``config.py:37-39``)
  -> left join + coalesce.
- J7 FK validation — Postgres FKs become explicit orphan checks.

Scale notes: the anti/left joins are on narrow key columns; the
catalog side is small relative to facts, so Catalyst broadcast-joins it
(AQE converts automatically below the threshold). No driver-side sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def missing_keys(
    referencing: DataFrame,
    ref_key: str,
    catalog: DataFrame,
    cat_key: str,
) -> DataFrame:
    """Distinct keys referenced but absent from the catalog (J1/J2/U4)."""
    return (
        referencing.select(F.col(ref_key).alias(cat_key))
        .where(F.col(cat_key).isNotNull())
        .distinct()
        .join(broadcast(catalog.select(cat_key)), cat_key, "left_anti")
    )


def placeholder_rows(
    missing: DataFrame,
    key: str,
    detail: DataFrame | None,
    desc_col: str,
    desc_template: str,
    default_unit: str = "UN",
    unit_col: str | None = None,
) -> DataFrame:
    """Build catalog placeholder rows for missing keys (J3).

    Joins an optional detail source for real descriptions and falls
    back to ``desc_template % key`` (coalesce), mirroring
    ``get_detail``'s two-level fallback (etl_pipeline.py:326-329).
    """
    if detail is not None:
        cols = [key, desc_col] + ([unit_col] if unit_col else [])
        enriched = missing.join(
            broadcast(detail.select(*cols).dropDuplicates([key])), key, "left"
        )
    else:
        enriched = missing.withColumn(desc_col, F.lit(None).cast("string"))
        if unit_col:
            enriched = enriched.withColumn(unit_col, F.lit(None).cast("string"))
    out = enriched.withColumn(
        "descricao",
        F.coalesce(F.col(desc_col), F.format_string(desc_template, F.col(key))),
    ).withColumn(
        "unidade",
        F.coalesce(F.col(unit_col), F.lit(default_unit))
        if unit_col
        else F.lit(default_unit),
    )
    return out.select(key, "descricao", "unidade")


def orphan_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """FK validation (J7): rows in fact whose key is missing from dim.

    An empty result certifies the FK; run at load time (Spark has no
    constraints, SURVEY §4.3.5). NULL keys are NOT orphans — SQL FK
    semantics permit NULL references, and a bare left-anti would
    otherwise flag them (nulls never match a join).
    """
    return fact.where(F.col(fact_key).isNotNull()).join(
        broadcast(dim.select(F.col(dim_key).alias(fact_key))),
        fact_key,
        "left_anti",
    )
