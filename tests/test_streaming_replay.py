"""streaming_window_late_data: the watermark replay must exercise
both admission paths, and its totals must reconcile with the batch
hourly aggregate minus exactly the dropped-late rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _parts(spark):
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.streaming_queries import (
        _B1_END,
        _DELAY_SPARK,
        _STRAGGLER_MOD,
    )

    ev = load(spark, SF_SMOKE, "events")
    in_b1 = (F.col("ts") < F.lit(_B1_END).cast("timestamp")) & (
        F.col("event_id") % _STRAGGLER_MOD != 0
    )
    b1, b2 = ev.where(in_b1), ev.where(~in_b1)
    wm = (
        b1.agg((F.max("ts") - F.expr(_DELAY_SPARK)).alias("w"))
        .collect()[0]
        .w
    )
    return ev, b1, b2, wm


def test_fixture_exercises_drop_and_admit(spark):
    from autosinapi_spark.plans.streaming_queries import _B1_END

    ev, b1, b2, wm = _parts(spark)
    dropped = b2.where(F.col("ts") < F.lit(wm))
    # late-but-inside-the-delay arrivals that a zero-delay stream
    # would have lost: pre-boundary rows admitted by the watermark
    admitted_late = b2.where(
        (F.col("ts") >= F.lit(wm))
        & (F.col("ts") < F.lit(_B1_END).cast("timestamp"))
    )
    assert dropped.count() > 0
    assert admitted_late.count() > 0


def test_replay_reconciles_with_batch_aggregate(spark):
    from autosinapi_spark.plans.streaming_queries import (
        streaming_window_late_data,
    )

    ev, b1, b2, wm = _parts(spark)
    n_dropped = b2.where(F.col("ts") < F.lit(wm)).count()

    out = streaming_window_late_data(spark, SF_SMOKE)
    total_kept = out.agg(F.sum("n")).collect()[0][0]
    assert total_kept == ev.count() - n_dropped
    # no emitted window may predate the earliest admitted event
    first_hour = (
        b1.unionByName(b2.where(F.col("ts") >= F.lit(wm)))
        .agg(
            F.date_format(
                F.date_trunc("hour", F.min("ts")), "yyyy-MM-dd HH:00"
            )
        )
        .collect()[0][0]
    )
    assert out.agg(F.min("hora")).collect()[0][0] >= first_hour
