"""User-behavior analytics: cohort retention, funnel conversion, and
rolling active users.

Warehouse staples over the events stream that neither the rollup
family nor the session/window queries cover:

- **Cohort retention**: users grouped by the day of their first
  event; for each (cohort, day-offset) cell, how many of the cohort
  were still active.  The matrix every growth dashboard draws.
- **Funnel conversion**: strictly ORDERED step progression
  (view -> click -> purchase) where each step's first qualifying
  occurrence must follow the previous step's within a 24 h
  conversion window, reduced to per-step user counts with
  integer-ppm conversion from the funnel head.  Without the window
  the fixture's 30-day always-on users all reach every step; with
  it the funnel narrows for real (150 -> 60 -> 25 at sf0.01).
- **Rolling active users**: exact DAU and trailing-7-day WAU per
  day, computed by bounded window-day fan-out instead of a windowed
  COUNT(DISTINCT).

Ratios are emitted as integer parts-per-million (``* 1000000 div``),
never as rounded doubles: a cohort ratio lands exactly on scale-6
rounding boundaries whenever the cohort size divides 1e6, and the
two engines break those ties differently (the percent-rank lesson
from ``price_change_analysis``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

# --- cohort retention ------------------------------------------------


@register(
    "user_retention_cohorts",
    """
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(d) AS c FROM act GROUP BY user_id
    ),
    sized AS (
      SELECT c, COUNT(*) AS cohort_size FROM cohort GROUP BY c
    ),
    cells AS (
      SELECT co.c, date_diff('day', co.c, a.d) AS day_offset,
             COUNT(*) AS n_users
      FROM act a JOIN cohort co USING (user_id)
      GROUP BY co.c, date_diff('day', co.c, a.d)
    )
    SELECT ce.c AS cohort_day,
           ce.day_offset,
           ce.n_users,
           s.cohort_size,
           (ce.n_users * 1000000) // s.cohort_size AS retention_ppm
    FROM cells ce JOIN sized s USING (c)
    ORDER BY cohort_day, day_offset
    """,
    doc="Cohort retention matrix: users bucketed by first-activity "
    "day, per-(cohort, day-offset) active-user counts with "
    "integer-ppm retention against the cohort size (extension; the "
    "classic growth-analytics query — day grain is the fixture "
    "adapter, the 30-day events window holds only one month).",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix from two user-keyed hash aggregates.

    Scale shape: events reduce FIRST to distinct (user, day) — a
    user-keyed hash aggregate whose output is |users| x |active
    days|, orders of magnitude below the event count — and every
    later step (first-day aggregate, cohort join, cell rollup) works
    on that frame, co-partitioned on user_id so the cohort join needs
    no second exchange.  Cohort sizes are a |cohorts|-row frame
    joined broadcast.  Offsets are exact integer day differences,
    and retention is integer ppm (see module docstring).
    """
    act = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("d").alias("c"))
    sized = cohort.groupBy("c").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        act.join(cohort, "user_id")
        .groupBy(
            "c",
            F.datediff("d", "c").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        cells.join(F.broadcast(sized), "c")
        .select(
            F.col("c").alias("cohort_day"),
            "day_offset",
            "n_users",
            "cohort_size",
            F.expr("(n_users * 1000000L) div cohort_size").alias(
                "retention_ppm"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


# --- ordered funnel conversion ---------------------------------------

_FUNNEL = ("view", "click", "purchase")
_FUNNEL_WINDOW_H = 24  # conversion window between consecutive steps


@register(
    "funnel_conversion",
    f"""
    WITH ev AS (
      SELECT user_id, event_type, ts FROM events
      WHERE event_type IN ('{_FUNNEL[0]}', '{_FUNNEL[1]}',
                           '{_FUNNEL[2]}')
    ),
    s1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = '{_FUNNEL[0]}' THEN ts END)
               AS t1
      FROM ev GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM ev e JOIN s1 USING (user_id)
      WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW_H} HOURS
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM ev e JOIN s2 USING (user_id)
      WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL {_FUNNEL_WINDOW_H} HOURS
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS step_no, '{_FUNNEL[0]}' AS step,
             COUNT(*) AS n_users
      FROM s1 WHERE t1 IS NOT NULL
      UNION ALL
      SELECT 2, '{_FUNNEL[1]}', COUNT(*) FROM s2
      UNION ALL
      SELECT 3, '{_FUNNEL[2]}', COUNT(*) FROM s3
    ),
    head AS (SELECT n_users AS n0 FROM counts WHERE step_no = 1)
    SELECT step_no, step, n_users,
           (n_users * 1000000) // head.n0 AS conv_ppm
    FROM counts CROSS JOIN head
    ORDER BY step_no
    """,
    doc="Ordered funnel conversion: view -> click -> purchase where "
    "each step's first qualifying occurrence must strictly follow "
    "the previous step's within a 24 h window, per-step user counts "
    "and integer-ppm conversion from the funnel head (extension; "
    "sequence- and window-constrained, not mere per-type presence).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel via cascaded conditional aggregates.

    Scale shape: events are filtered to the three funnel types at the
    scan, then each step is a user-keyed hash aggregate joined back
    to the (user, type, ts) projection.  Every join and aggregate in
    the cascade hashes on the same key (user_id): at bench scale the
    shrinking step frames auto-broadcast (the observed plan joins
    them broadcast, leaving the event side unshuffled); at fact
    scale they become shuffle joins whose exchanges all share the
    user_id partitioning, and the repeated event-side shuffle is one
    ReusedExchange.  Step frames shrink monotonically (every s2 user
    is an s1 user), so joins get cheaper down the funnel.  The final
    3-row union and the 1-row head frame are driver-trivial;
    conversion is integer ppm (see module docstring).  A k-step
    funnel is the same cascade k deep.
    """
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*_FUNNEL))
        .select("user_id", "event_type", "ts")
    )
    s1 = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == _FUNNEL[0], F.col("ts"))
        ).alias("t1")
    ).where(F.col("t1").isNotNull())
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    s2 = (
        ev.join(s1, "user_id")
        .where(
            (F.col("event_type") == _FUNNEL[1])
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .where(
            (F.col("event_type") == _FUNNEL[2])
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step_no"),
            F.lit(_FUNNEL[0]).alias("step"),
            "n_users",
        )
        .unionAll(
            s2.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("step_no"),
                F.lit(_FUNNEL[1]).alias("step"),
                "n_users",
            )
        )
        .unionAll(
            s3.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("step_no"),
                F.lit(_FUNNEL[2]).alias("step"),
                "n_users",
            )
        )
    )
    # head count straight from s1 (not by filtering `counts`: that
    # would re-execute the whole 3-branch union lineage a second time)
    head = s1.agg(F.count(F.lit(1)).alias("n0"))
    return (
        counts.crossJoin(F.broadcast(head))
        .select(
            "step_no",
            "step",
            "n_users",
            F.expr("(n_users * 1000000L) div n0").alias("conv_ppm"),
        )
        .orderBy("step_no")
    )


# --- rolling active users (DAU / WAU) --------------------------------

_WAU_DAYS = 7


@register(
    "rolling_active_users",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM act),
    dau AS (SELECT d, COUNT(*) AS dau FROM act GROUP BY d),
    contrib AS (
      SELECT DISTINCT a.user_id, u.wday
      FROM act a, bounds,
           LATERAL (
             SELECT unnest(generate_series(
               a.d, LEAST(a.d + INTERVAL {_WAU_DAYS - 1} DAY,
                          CAST(bounds.d1 AS TIMESTAMP)),
               INTERVAL 1 DAY)) AS wday) u
    ),
    wau AS (
      SELECT CAST(wday AS DATE) AS d, COUNT(*) AS wau
      FROM contrib GROUP BY CAST(wday AS DATE)
    )
    SELECT dau.d AS dia, dau.dau,
           wau.wau AS wau{_WAU_DAYS}
    FROM dau JOIN wau USING (d)
    ORDER BY dia
    """,
    doc=f"Rolling active users: exact daily actives (DAU) and "
    f"trailing-{_WAU_DAYS}-day actives (WAU) per day — each "
    f"(user, day) contributes to its next {_WAU_DAYS} window days, "
    "so the rolling DISTINCT needs no windowed set union "
    "(extension; the engagement counter next to the retention "
    "matrix).",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU + trailing-window WAU without windowed distincts.

    Scale shape: events reduce FIRST to distinct (user, day); a
    windowed COUNT(DISTINCT) over that frame would need a set union
    per window position, so instead each (user, day) row explodes to
    the <= 7 window days it contributes to (bounded fan-out), one
    more (user, wday) distinct collapses multi-active users, and a
    plain count per day finishes — three user-keyed/day-keyed hash
    aggregates, no window function, no state.  The day spine's upper
    bound broadcasts from a 1-row aggregate.
    """
    act = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    bounds = act.agg(F.max("d").alias("d1"))
    dau = act.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        act.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.least(
                        F.date_add(F.col("d"), _WAU_DAYS - 1),
                        F.col("d1"),
                    ),
                )
            ).alias("wday"),
        )
        .distinct()
    )
    wau = contrib.groupBy("wday").agg(
        F.count(F.lit(1)).alias(f"wau{_WAU_DAYS}")
    )
    return (
        dau.join(wau, dau["d"] == wau["wday"])
        .select(
            F.col("d").alias("dia"), "dau", f"wau{_WAU_DAYS}"
        )
        .orderBy("dia")
    )


# --- event-type Markov transition matrix ------------------------------


@register(
    "event_transition_matrix",
    """
    WITH s AS (
      SELECT event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           n * 1000000 // CAST(SUM(n) OVER (PARTITION BY event_type)
                               AS BIGINT) AS prob_ppm
    FROM c
    ORDER BY event_type, next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | type) as integer ppm — the "
    "behavioral-sequence model behind next-action priors and "
    "anomaly scoring (extension).",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user LEAD, then one (type, next)-keyed aggregate.

    Scale shape: the sequence pairing is a single user-partitioned
    window (the same exchange every behavioral query here reuses —
    ts+event_id ordering makes simultaneous events deterministic);
    transition counts partial-aggregate to |types|^2 rows, and the
    row-normalization window runs over that tiny matrix, not the
    event stream. Probabilities are integer parts-per-million via
    truncating division — no float rounding to straddle.
    """
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type").over(seq).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    c = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "n",
        F.floor(
            F.col("n") * 1000000 / F.sum("n").over(row)
        ).cast("bigint").alias("prob_ppm"),
    ).orderBy("event_type", "next_type")


# --- cumulative user growth curve -------------------------------------


@register(
    "user_growth_curve",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(epoch_us(date_trunc('hour', ts))) AS h_us
      FROM events GROUP BY user_id
    ),
    hourly AS (
      SELECT h_us, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY h_us
    )
    SELECT h_us, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY h_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS total_users
    FROM hourly
    ORDER BY h_us
    """,
    doc="Cumulative user growth: hourly first-seen signups and the "
    "running total known-user count — the product growth curve "
    "(extension; hour grain because the fixture spans days; epoch-"
    "micros bins keep the hash timezone-proof).",
)
def user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen reduction, then a date-spine running sum.

    Scale shape: the event stream reduces to one row per user (hash
    aggregate with map-side combine — the only fact-scale exchange),
    then to one row per HOUR; the running sum's global window runs
    over the hour spine (calendar-bounded at any corpus size), never
    over events. This is the one place an unpartitioned window is
    correct: its input cardinality is calendar-bounded.
    """
    from pyspark.sql.window import Window

    # rebalance=False: the first operation is a map-side-combining
    # groupBy — the scan-rebalance exchange in front of it shuffles
    # the full table for no width gain (r14 verdict ask #3)
    ev = load(spark, sf_dir, "events", rebalance=False)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.date_trunc("hour", F.col("ts")))).alias(
            "h_us"
        )
    )
    hourly = first_seen.groupBy("h_us").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("h_us").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        "h_us",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("total_users"),
    ).orderBy("h_us")
