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
    # rebalance=False: row-local admission predicates + one map-side-
    # combining aggregate — the scan-rebalance exchange shuffles the
    # full table for no width gain (r14 verdict ask #3)
    ev = load(spark, sf_dir, "events", rebalance=False).select(
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


# --- stream-stream interval join (last-touch attribution) -------------

_ATTR_WINDOW_SQL = "INTERVAL 1 HOUR"
_ATTR_WINDOW_SPARK = "INTERVAL 1 HOURS"


def _attribution_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, ts FROM events
      WHERE event_type IN ('view', 'click')
    ),
    b1 AS (
      SELECT * FROM ev
      WHERE ts < TIMESTAMP '{_B1_END}'
        AND event_id % {_STRAGGLER_MOD} <> 0
    ),
    b2 AS (
      SELECT * FROM ev
      WHERE NOT (ts < TIMESTAMP '{_B1_END}'
                 AND event_id % {_STRAGGLER_MOD} <> 0)
    ),
    wm AS (
      SELECT LEAST(
               (SELECT MAX(ts) FROM b1 WHERE event_type = 'view'),
               (SELECT MAX(ts) FROM b1 WHERE event_type = 'click')
             ) - {_DELAY_SQL} AS w
    ),
    adm AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b2.* FROM b2, wm WHERE b2.ts >= wm.w
    ),
    pairs AS (
      SELECT c.event_id AS click_id, c.user_id,
             v.event_id AS view_id, v.ts AS v_ts, c.ts AS c_ts
      FROM adm c JOIN adm v
        ON v.user_id = c.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + {_ATTR_WINDOW_SQL}
      WHERE c.event_type = 'click' AND v.event_type = 'view'
    ),
    ranked AS (
      SELECT click_id, user_id, view_id, v_ts, c_ts,
             ROW_NUMBER() OVER (PARTITION BY click_id
                                ORDER BY v_ts DESC, view_id DESC) AS rn
      FROM pairs
    )
    SELECT click_id, user_id, view_id,
           (epoch_us(c_ts) - epoch_us(v_ts)) // 1000000 AS lag_sec
    FROM ranked WHERE rn = 1
    ORDER BY click_id
    """


@register(
    "streaming_join_attribution",
    _attribution_oracle(),
    doc="Stream-stream interval join replay: views and clicks as two "
    "watermarked streams (global watermark = min of the per-stream "
    "batch-1 maxima - 24 h, late arrivals dropped on BOTH sides), "
    "then each admitted click last-touch attributed to its latest "
    "same-user view within the preceding hour (extension; Structured "
    "Streaming's symmetric join-state admission rule plus the "
    "event-time interval condition, batch-replayed with a full "
    "oracle).",
)
def streaming_join_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch click attribution after the two-batch join replay.

    Scale shape: the global watermark is two 1-row max aggregates
    (exactly the per-input maxima Spark's streaming engine tracks;
    their min is the multi-input global watermark) broadcast into the
    batch-2 admission filters — state never materializes beyond those
    scalars here because the replay is batch.  The interval join
    itself is an EQUI-join on user_id with the time window as a
    residual predicate: per-user timelines are bounded, so the pair
    space is bucketed by user exactly like the real stream-stream
    join's keyed state, never a time-only range join.  Last-touch is
    max(struct(v_ts, view_id)) per click — a hash aggregate, not a
    sort window (the ``near_dedup_incremental`` argmax lesson).
    """
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click"))
        .select("event_id", "user_id", "event_type", "ts")
    )
    in_b1 = (F.col("ts") < F.lit(_B1_END).cast("timestamp")) & (
        F.col("event_id") % _STRAGGLER_MOD != 0
    )
    b1 = ev.where(in_b1)
    b2 = ev.where(~in_b1)
    wm = (
        b1.where(F.col("event_type") == "view")
        .agg(F.max("ts").alias("mv"))
        .crossJoin(
            F.broadcast(
                b1.where(F.col("event_type") == "click").agg(
                    F.max("ts").alias("mc")
                )
            )
        )
        .select(
            (F.least("mv", "mc") - F.expr(_DELAY_SPARK)).alias("w")
        )
    )
    adm = b1.unionByName(
        b2.crossJoin(F.broadcast(wm))
        .where(F.col("ts") >= F.col("w"))
        .drop("w")
    )
    views = adm.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    clicks = adm.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    pairs = clicks.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(_ATTR_WINDOW_SPARK)),
    )
    best = pairs.groupBy("click_id", "user_id", "c_ts").agg(
        F.max(F.struct("v_ts", "view_id")).alias("b")
    )
    return best.select(
        "click_id",
        "user_id",
        F.col("b.view_id").alias("view_id"),
        F.expr(
            "(unix_micros(c_ts) - unix_micros(b.v_ts)) div 1000000"
        ).alias("lag_sec"),
    ).orderBy("click_id")


# --- streaming session windows with watermark (replay) ----------------

_SESS_GAP = "30 minutes"
_SESS_GAP_US = 30 * 60 * 1_000_000


@register(
    "streaming_session_replay",
    f"""
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
    merged AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b2.* FROM b2, wm WHERE b2.ts >= wm.w
    ),
    ordered AS (
      SELECT user_id, value,
             epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM merged
    ),
    marked AS (
      SELECT user_id, value, ts_us,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us >= {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, value, ts_us,
             CAST(SUM(is_new) OVER
               (PARTITION BY user_id ORDER BY ts_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_SESS_GAP_US} AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Streaming session windows replayed over two watermarked "
    "micro-batches: batch-2 rows older than the watermark are "
    "dropped, admitted rows sessionize under the native "
    "session_window semantics. Sound because an append-mode session "
    "finalizes only once the watermark passes its END, so no "
    "admitted event (ts >= watermark) can ever merge into a "
    "finalized session — the streaming output over admitted rows "
    "equals one batch sessionization of them (extension).",
)
def streaming_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session state after the two-batch watermark replay.

    Scale shape: watermark = 1-row broadcast scalar; admission is a
    row-local predicate; then ONE native session_window aggregate
    over the admitted union (user-keyed exchange, sort-merged
    sessions — identical dataflow to `session_window_native`). In
    the true streaming deployment the same expression runs under
    `withWatermark(ts, ...)`, with per-user session state evicted as
    the watermark passes each session end.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    in_b1 = (F.col("ts") < F.lit(_B1_END).cast("timestamp")) & (
        F.col("event_id") % _STRAGGLER_MOD != 0
    )
    b1 = ev.where(in_b1)
    b2 = ev.where(~in_b1)
    wm = b1.agg((F.max("ts") - F.expr(_DELAY_SPARK)).alias("w"))
    kept2 = (
        b2.crossJoin(F.broadcast(wm))
        .where(F.col("ts") >= F.col("w"))
        .drop("w")
    )
    merged = b1.unionByName(kept2)
    sw = F.session_window(F.col("ts"), _SESS_GAP)
    return (
        merged.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
