"""Range-join query — binned interval containment, oracle-checked.

Every 20th event opens a 1-hour per-user window; the remaining events
join to every window containing their timestamp (sessionization /
validity-interval shape). The oracle is DuckDB's native range join
(IEJoin); the Spark side is the binned equi-join from
``operators/ranges.py`` — same rows, hash-partitionable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.ranges import binned_range_join
from .registry import register


@register(
    "range_join_windows",
    """
    WITH w AS (
      SELECT event_id AS janela_id, user_id, ts AS inicio,
             ts + INTERVAL 1 HOUR AS fim
      FROM events WHERE event_id % 20 = 0
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 20 <> 0
    )
    SELECT p.event_id, w.janela_id
    FROM p JOIN w
      ON p.user_id = w.user_id AND p.ts >= w.inicio AND p.ts < w.fim
    """,
    doc="Range join (custom operator): events into 1h validity windows "
    "via bin-bucketed equi-join — no nested loop; oracle = DuckDB "
    "native range join.",
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    windows = ev.where(F.col("event_id") % 20 == 0).select(
        F.col("event_id").alias("janela_id"),
        "user_id",
        F.col("ts").alias("inicio"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("fim"),
    )
    points = ev.where(F.col("event_id") % 20 != 0).select(
        "event_id", "user_id", "ts"
    )
    joined = binned_range_join(
        points, windows, ["user_id"], "ts", "inicio", "fim", bin_width_sec=3600
    )
    return joined.select("event_id", "janela_id")
