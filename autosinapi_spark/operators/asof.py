"""As-of join — the classic time-series operator Spark SQL lacks.

For each left row, attach the most recent right-side value at or
before the left timestamp, per key (quotes-to-trades, latest price at
order time, config-at-event-time, ...).

Implementation is the scalable union-window form, NOT a non-equi
join:

1. tag both sides and union on (keys, ts);
2. one window per key ordered by (ts, side) carries the last non-null
   right-side payload forward (``last(..., ignorenulls=True)`` over
   an unbounded-preceding frame);
3. keep only left rows.

One hash shuffle on the keys, linear scan within partitions — the
same cost as a groupBy. A theta-join formulation
(``l.ts >= r.ts`` + window) explodes quadratically per key and is
exactly what this operator avoids; at 100 TB the union-window form
also AQE-splits skewed keys like any other window.

The right side must be unique per (keys, ts) for determinism — dedup
first (``dedup_keep_first``) exactly as a SQL ASOF JOIN demands.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE, _PAYLOAD_PREFIX = "__asof_side", "__asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """left rows + latest right ``value_cols`` with right.ts <= left.ts.

    Right rows at exactly left.ts match when ``allow_exact_match``
    (the SQL ``>=`` form; ``False`` gives strict ``>``). Unmatched
    left rows keep NULL values (LEFT ASOF semantics).
    """
    on = list(on)
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    # side ordering decides exact-ts ties: right-before-left => '<='
    right_side, left_side = (0, 1) if allow_exact_match else (1, 0)
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(right_side).alias(_SIDE),
        *[F.col(c).alias(_PAYLOAD_PREFIX + c) for c in value_cols],
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.lit(left_side).alias(_SIDE),
        *[F.lit(None).cast(t)
          .alias(_PAYLOAD_PREFIX + c)
          for c, t in zip(value_cols,
                          [dict(right.dtypes)[c] for c in value_cols])],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(_PAYLOAD_PREFIX + c, ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ],
    )
    return carried.where(F.col(_SIDE) == left_side).select(*l_cols, *value_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """left rows + the right ``value_cols`` minimizing |right.ts -
    left.ts| — pandas ``merge_asof(direction='nearest')`` semantics:
    equal-distance ties pick the BACKWARD candidate, and
    ``allow_exact_match=False`` excludes same-timestamp right rows
    from both directions.

    Still ONE union and ONE hash shuffle on the keys: the union
    carries two side-marker columns (the backward and forward windows
    need opposite same-timestamp tie orders, so each window sorts by
    its own (ts, side) — same partitioning, two in-partition sorts),
    the backward window carries the last candidate + its timestamp
    forward, the forward window mirrors, and the winner is chosen
    row-locally by exact integer-microsecond distance (timestamps) or
    numeric distance (numeric ts columns).
    """
    on = list(on)
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    rdt = dict(right.dtypes)
    ts_is_time = dict(left.dtypes)[ts_col].startswith("timestamp")

    def _num(col):
        # exact integer microseconds for timestamps (matches the
        # oracle's epoch_us arithmetic bit-for-bit); plain cast else
        return F.unix_micros(col) if ts_is_time else col.cast("double")

    # per-direction same-ts tie orders (see asof_join/asof_join_forward)
    b_right, b_left = (0, 1) if allow_exact_match else (1, 0)
    f_left, f_right = (0, 1) if allow_exact_match else (1, 0)
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(b_right).alias("__side_b"),
        F.lit(f_right).alias("__side_f"),
        _num(F.col(ts_col)).alias("__asof_tsn"),
        *[F.col(c).alias(_PAYLOAD_PREFIX + c) for c in value_cols],
    )
    l_cols = list(left.columns)
    l = left.select(
        *l_cols,
        F.lit(b_left).alias("__side_b"),
        F.lit(f_left).alias("__side_f"),
        F.lit(None)
        .cast("bigint" if ts_is_time else "double")
        .alias("__asof_tsn"),
        *[F.lit(None).cast(rdt[c]).alias(_PAYLOAD_PREFIX + c)
          for c in value_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w_b = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side_b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side_f").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "*",
        F.last("__asof_tsn", ignorenulls=True).over(w_b).alias("__b_tsn"),
        F.first("__asof_tsn", ignorenulls=True).over(w_f).alias("__f_tsn"),
        *[
            F.last(_PAYLOAD_PREFIX + c, ignorenulls=True)
            .over(w_b)
            .alias("__b_" + c)
            for c in value_cols
        ],
        *[
            F.first(_PAYLOAD_PREFIX + c, ignorenulls=True)
            .over(w_f)
            .alias("__f_" + c)
            for c in value_cols
        ],
    )
    lts = _num(F.col(ts_col))
    pick_b = F.col("__b_tsn").isNotNull() & (
        F.col("__f_tsn").isNull()
        | ((lts - F.col("__b_tsn")) <= (F.col("__f_tsn") - lts))
    )
    out_vals = [
        F.when(pick_b, F.col("__b_" + c))
        .otherwise(F.col("__f_" + c))
        .alias(c)
        for c in value_cols
    ]
    return carried.where(F.col("__side_b") == F.lit(b_left)).select(
        *l_cols, *out_vals
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """left rows + EARLIEST right ``value_cols`` with right.ts >=
    left.ts — pandas ``merge_asof(direction='forward')`` semantics
    (next scheduled price, next maintenance window, next review date).

    Mirror of :func:`asof_join`: same union, same single hash shuffle
    on the keys, but the window looks FORWARD
    (current-row..unbounded-following) and carries the first non-null
    payload. Exact-ts ties resolve by side order: with
    ``allow_exact_match`` the right row at the same timestamp sorts
    after the left row and is picked up; without, it sorts before and
    is excluded.
    """
    on = list(on)
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    # side ordering decides exact-ts ties: right-after-left => '>='
    left_side, right_side = (0, 1) if allow_exact_match else (1, 0)
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(right_side).alias(_SIDE),
        *[F.col(c).alias(_PAYLOAD_PREFIX + c) for c in value_cols],
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.lit(left_side).alias(_SIDE),
        *[F.lit(None).cast(t)
          .alias(_PAYLOAD_PREFIX + c)
          for c, t in zip(value_cols,
                          [dict(right.dtypes)[c] for c in value_cols])],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[
            F.first(_PAYLOAD_PREFIX + c, ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ],
    )
    return carried.where(F.col(_SIDE) == left_side).select(*l_cols, *value_cols)
