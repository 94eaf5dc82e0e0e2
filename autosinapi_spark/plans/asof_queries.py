"""As-of join query — oracle-checked against DuckDB's native ASOF JOIN.

Fixture framing: every 5th event acts as a per-user "quote" stream;
the remaining events each pick up the most recent quote value at or
before their timestamp (the quotes-to-trades shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.asof import asof_join
from ..operators.dedup import dedup_keep_first
from .registry import register


@register(
    "asof_latest_quote",
    """
    WITH q AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 5 = 0
      ) WHERE rn = 1
    ),
    e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 5 <> 0
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           q.value AS preco_asof
    FROM e ASOF LEFT JOIN q
      ON e.user_id = q.user_id AND e.ts >= q.ts
    """,
    doc="As-of join (custom operator Spark lacks): latest per-user "
    "quote at or before each event's timestamp, via the scalable "
    "union-window form; oracle = DuckDB native ASOF LEFT JOIN.",
)
def asof_latest_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    quotes = dedup_keep_first(
        ev.where(F.col("event_id") % 5 == 0).select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        ["event_id"],
        descending=True,
    ).select("user_id", "ts", "value")
    lefts = ev.where(F.col("event_id") % 5 != 0).select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(lefts, quotes, ["user_id"], "ts", ["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("preco_asof"),
    )


@register(
    "asof_next_quote",
    """
    WITH q AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 5 = 0
      ) WHERE rn = 1
    ),
    e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 5 <> 0
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           q.value AS preco_next
    FROM e ASOF LEFT JOIN q
      ON e.user_id = q.user_id AND e.ts <= q.ts
    """,
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): "
    "earliest per-user quote at or after each event's timestamp, via "
    "the mirrored union-window form (first non-null over "
    "current..unbounded-following); oracle = DuckDB ASOF LEFT JOIN "
    "with the <= condition.",
)
def asof_next_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-scheduled-value attachment per event.

    Scale shape: identical to ``asof_latest_quote`` — one hash
    shuffle on the key, linear within-partition window scan; never
    the quadratic theta-join formulation.
    """
    from ..operators.asof import asof_join_forward

    ev = load(spark, sf_dir, "events")
    quotes = dedup_keep_first(
        ev.where(F.col("event_id") % 5 == 0).select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        ["event_id"],
        descending=True,
    ).select("user_id", "ts", "value")
    lefts = ev.where(F.col("event_id") % 5 != 0).select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_forward(lefts, quotes, ["user_id"], "ts", ["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("preco_next"),
    )


@register(
    "asof_nearest_quote",
    """
    WITH q AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 5 = 0
      ) WHERE rn = 1
    ),
    e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 5 <> 0
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           CASE WHEN b.ts IS NOT NULL AND (f.ts IS NULL OR
                  (epoch_us(e.ts) - epoch_us(b.ts))
                    <= (epoch_us(f.ts) - epoch_us(e.ts)))
                THEN b.value ELSE f.value END AS preco_nearest
    FROM e
    ASOF LEFT JOIN q b ON e.user_id = b.user_id AND e.ts >= b.ts
    ASOF LEFT JOIN q f ON e.user_id = f.user_id AND e.ts <= f.ts
    """,
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): "
    "per-user quote minimizing |quote.ts - event.ts|, equal-distance "
    "ties backward — one union, two windows over one key shuffle; "
    "oracle = both DuckDB ASOF directions + exact integer-microsecond "
    "distance choice.",
)
def asof_nearest_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-quote attachment per event.

    Scale shape: same single hash shuffle on the key as the
    backward/forward operators; the two direction windows share the
    partitioning (two in-partition sorts, one exchange), the distance
    choice is row-local exact integer microseconds.
    """
    from ..operators.asof import asof_join_nearest

    ev = load(spark, sf_dir, "events")
    quotes = dedup_keep_first(
        ev.where(F.col("event_id") % 5 == 0).select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        ["event_id"],
        descending=True,
    ).select("user_id", "ts", "value")
    lefts = ev.where(F.col("event_id") % 5 != 0).select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_nearest(lefts, quotes, ["user_id"], "ts", ["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("preco_nearest"),
    )
