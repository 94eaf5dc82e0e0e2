"""Window-based operators: latest-per-group and status sync.

Reference semantics:

- W1/A3 "latest maintenance event per item" —
  ``ROW_NUMBER() OVER (PARTITION BY item_codigo, tipo_item ORDER BY
  data_referencia DESC)`` then rn=1
  (``/root/reference/autosinapi/etl_pipeline.py:402-408``).
- J4 status sync — items whose latest event is a deactivation
  (``ILIKE '%DESATIVAÇÃO%'``) get status DESATIVADO, everything else
  ATIVO (``etl_pipeline.py:399-423``; keyword ``config.py:31``;
  statuses ``config.py:96``).

Scale notes: a single hash-partitioned window over the group keys —
one shuffle, no driver collection. For heavily skewed keys Spark's AQE
skew handling applies because the window input is a plain shuffle
exchange. ``max_by`` is used where only one attribute of the latest
row is needed (partial aggregation map-side, cheaper than a full
window sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the latest row per group (W1/A3).

    ``tiebreak_cols`` make the survivor deterministic when ``order_col``
    ties — required for oracle-comparable output.

    Implemented as ``max_by`` of the full-row struct over the
    (order, tiebreaks) struct — same rewrite as
    ``operators/dedup.dedup_keep_first``: the aggregate
    partial-combines map-side so same-group rows collapse before the
    exchange and no per-group sort runs; struct comparison's
    nulls-first field order makes max_by prefer non-null, matching
    the window's DESC NULLS LAST default.
    """
    val = F.struct(*df.columns)
    ordk = F.struct(F.col(order_col), *[F.col(c) for c in tiebreak_cols])
    return (
        df.groupBy(*group_cols)
        .agg(F.max_by(val, ordk).alias("__kept"))
        .select("__kept.*")
    )


def status_from_latest(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    deactivation_predicate: Column,
    tiebreak_cols: Sequence[str] = (),
    active: str = "ATIVO",
    inactive: str = "DESATIVADO",
) -> DataFrame:
    """Derive per-group lifecycle status from the latest event (J4+W1).

    Returns one row per group: group_cols + ``status``.
    """
    latest = latest_per_group(df, group_cols, order_col, tiebreak_cols)
    return latest.select(
        *group_cols,
        F.when(deactivation_predicate, F.lit(inactive))
        .otherwise(F.lit(active))
        .alias("status"),
    )
