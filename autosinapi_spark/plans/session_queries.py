"""Gap-based sessionization of the event stream (extension).

The batch shape of session windows: consecutive events of a user
belong to one session until a silence gap exceeds the timeout. The
streaming twin is ``F.session_window`` /
``applyInPandasWithState``; this expression-level form is the
oracle-checkable contract (identical window semantics in DuckDB).

Scale shape: one hash exchange on user_id, then two window
computations (lag + running sum) over the SAME partition/order — the
sort is paid once and reused; the per-session aggregate re-keys by
(user_id, session_seq), whose cardinality is bounded by events.
No global sort, no driver loop. Gap arithmetic is integer
microseconds (``unix_micros`` / ``epoch_us``) so both engines compare
exact values, never float epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .registry import dsum, register, sql_dsum

_GAP_US = 30 * 60 * 1_000_000  # 30-minute silence ends a session


@register(
    "sessionize_events",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, value, ts_us,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, event_id, value, ts_us,
             CAST(SUM(is_new) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us,
           {sql_dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30-min timeout): per-user session "
    "windows with per-session aggregates (extension; batch shape of "
    "streaming session windows).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "event_id",
        "value",
        ts_us.alias("ts_us"),
        F.lag(ts_us).over(order).alias("prev_us"),
    )
    marked = base.select(
        "user_id",
        "event_id",
        "value",
        "ts_us",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > _GAP_US),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "value",
        "ts_us",
        F.sum("is_new").over(run).alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        dsum(F.col("value"), "sum_value"),
    )


# --- native session_window operator (API parity) ----------------------


@register(
    "session_window_native",
    f"""
    WITH ordered AS (
      SELECT user_id, value,
             epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, value, ts_us,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us >= {_GAP_US}
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
           MAX(ts_us) + {_GAP_US} AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Sessionization via Spark's NATIVE session_window aggregation "
    "(dynamic-gap session windows in one groupBy — no manual "
    "lag/flag/prefix-sum). Note the native semantics the oracle "
    "mirrors: a gap of EXACTLY the timeout starts a new session "
    "(window ends are exclusive), and the emitted end is last event "
    "+ gap (extension; API-parity twin of `sessionize_events`).",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in operator form of `sessionize_events`.

    Scale shape: ONE user-keyed aggregate — Catalyst plans
    session_window as a sort-based merge within each user partition
    (the same single exchange as the manual form, minus the window
    machinery); at streaming deployment the identical expression
    runs under `withWatermark` with state eviction per closed
    session. Emitted bounds are epoch micros (bigint) so the hash is
    timezone-proof.
    """
    ev = load(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
