"""Watermark semantics as a hard signal (extension).

``streaming_window_late_data`` replays Structured Streaming's
watermark rule over two deterministic micro-batches of the events
table and emits the merged tumbling-window aggregate:

- batch 1 = the stream up to a batch boundary, EXCEPT a deterministic
  5% straggler slice (event_id % 20 == 0);
- batch 2 = everything else — the rest of the stream, the 12 hours
  just before the boundary (in-flight rows a real pipeline delivers
  in the next batch), and the stragglers, which arrive LATE;
- the watermark after batch 1 is max(event time in batch 1) minus the
  24-hour delay (exactly Spark's `withWatermark` bookkeeping:
  max-seen-event-time minus delay, applied to the NEXT batch);
- batch-2 rows older than the watermark are dropped (most
  stragglers); rows within the delay window are admitted (the
  in-flight band and the freshest stragglers).

This pins the semantics `streaming/incremental.windowed_event_stats`
relies on (its `withWatermark` drop rule) with a full DuckDB oracle —
the streaming engine itself can't run under the driver's batch
harness, but its admission arithmetic can, bit-for-bit. The unit test
asserts the fixture actually exercises BOTH paths (some stragglers
dropped, some admitted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import dsum, register, sql_dsum

_B1_END = "2024-01-15 12:00:00"  # batch-1 boundary, ~mid-stream over
# the 2024-01 fixture month; everything at/after it arrives in batch 2
# (in-flight rows inside the delay), while the 5% straggler slice of
# OLDER rows models arrivals late beyond the watermark
_STRAGGLER_MOD = 20
_DELAY_SQL = "INTERVAL 24 HOUR"
_DELAY_SPARK = "INTERVAL 24 HOURS"


def _late_oracle() -> str:
    return f"""
    WITH b1 AS (
      SELECT * FROM events
      WHERE ts < TIMESTAMP '{_B1_END}'
        AND event_id % {_STRAGGLER_MOD} <> 0
    ),
    b2 AS (
      SELECT * FROM events
      WHERE NOT (ts < TIMESTAMP '{_B1_END}'
                 AND event_id % {_STRAGGLER_MOD} <> 0)
    ),
    wm AS (SELECT MAX(ts) - {_DELAY_SQL} AS w FROM b1),
    kept2 AS (SELECT b2.* FROM b2, wm WHERE b2.ts >= wm.w),
    merged AS (
      SELECT * FROM b1 UNION ALL SELECT * FROM kept2
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hora,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'soma_valor')}
    FROM merged
    GROUP BY 1, 2
    """


@register(
    "streaming_window_late_data",
    _late_oracle(),
    doc="Watermark late-data replay: two deterministic micro-batches "
    "(stream up to a boundary minus a 5% straggler slice, then the "
    "rest), watermark = max batch-1 event time - 24 h, batch-2 rows "
    "older than the watermark dropped, admitted rows merged into the "
    "tumbling-window aggregate — Structured Streaming's withWatermark "
    "admission rule, batch-replayed with a full oracle (extension).",
)
def streaming_window_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged hourly window counts after the two-batch watermark replay.

    Scale shape: the watermark is a 1-row max aggregate broadcast
    into the batch-2 filter (exactly the scalar the streaming engine
    tracks in its state store); admission is a row-local predicate;
    the merged aggregate is the same partial-aggregated groupBy as
    ``hourly_event_stats``. State never holds rows — only the
    (window, type) running aggregates, which is what lets the
    streaming twin run unbounded.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    in_b1 = (F.col("ts") < F.lit(_B1_END).cast("timestamp")) & (
        F.col("event_id") % _STRAGGLER_MOD != 0
    )
    b1 = ev.where(in_b1)
    b2 = ev.where(~in_b1)
    wm = b1.agg(
        (F.max("ts") - F.expr(_DELAY_SPARK)).alias("w")
    )
    kept2 = (
        b2.crossJoin(F.broadcast(wm))
        .where(F.col("ts") >= F.col("w"))
        .drop("w")
    )
    merged = b1.unionByName(kept2)
    return merged.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
            "hora"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), "soma_valor"),
    )
