"""Binned range join — interval containment without a nested loop.

Spark executes a raw ``p.ts BETWEEN i.start AND i.end`` join as
BroadcastNestedLoop (O(points x intervals)) — a scale-killer. The
standard fix buckets time into fixed-width bins:

1. each point lands in exactly ONE bin;
2. each interval replicates into EVERY bin it overlaps
   (``explode(sequence(...))`` — cheap when bin width ~ interval
   width, so the blow-up factor is ~2);
3. equi-join on (keys, bin) — hash-partitionable — then the exact
   containment predicate filters bin-level false positives.

Because a point has exactly one bin, a matching (point, interval)
pair meets in exactly one bin — no dedup stage needed. Pick
``bin_width`` close to the typical interval length: wider wastes
filter work, narrower multiplies interval replication.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """points ⋈ intervals where start <= ts < end (per key), binned.

    Returns point columns + interval columns (minus start/end bin
    helpers); inner join only (the containment filter cannot preserve
    unmatched rows without a second anti-join pass).
    """
    if how != "inner":
        raise ValueError("binned_range_join supports inner joins")
    width_us = bin_width_sec * 1_000_000
    p = points.withColumn(
        _BIN, (F.unix_micros(F.col(ts_col)) / width_us).cast("long")
    )
    # empty/inverted intervals (end <= start) can never contain a
    # point, and an inverted pair would make F.sequence descend —
    # replicating one corrupt row into every bin between the two
    # timestamps. Dropping them up front matches inner-join semantics.
    i = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        _BIN,
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / width_us).cast("long"),
                ((F.unix_micros(F.col(end_col)) - 1) / width_us).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*on, _BIN]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop(_BIN)
