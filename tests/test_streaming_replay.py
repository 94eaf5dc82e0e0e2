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


def test_stream_join_attribution_python_replay(spark):
    """Full Python recomputation: watermark admission on both sides,
    interval pairing, last-touch argmax."""
    from datetime import timedelta

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.streaming_queries import (
        _B1_END,
        _STRAGGLER_MOD,
        streaming_join_attribution,
    )

    got = {
        r.click_id: r
        for r in streaming_join_attribution(spark, SF_SMOKE).collect()
    }

    ev = [
        r
        for r in load(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
        if r.event_type in ("view", "click")
    ]
    from datetime import datetime

    b1_end = datetime.fromisoformat(_B1_END)
    in_b1 = lambda r: r.ts < b1_end and r.event_id % _STRAGGLER_MOD != 0
    b1 = [r for r in ev if in_b1(r)]
    wm = min(
        max(r.ts for r in b1 if r.event_type == "view"),
        max(r.ts for r in b1 if r.event_type == "click"),
    ) - timedelta(hours=24)
    adm = b1 + [r for r in ev if not in_b1(r) and r.ts >= wm]
    views = [r for r in adm if r.event_type == "view"]
    exp = {}
    for c in adm:
        if c.event_type != "click":
            continue
        cands = [
            v
            for v in views
            if v.user_id == c.user_id
            and c.ts > v.ts
            and c.ts <= v.ts + timedelta(hours=1)
        ]
        if cands:
            best = max(cands, key=lambda v: (v.ts, v.event_id))
            exp[c.event_id] = (
                c.user_id,
                best.event_id,
                int((c.ts - best.ts).total_seconds()),
            )

    assert set(got) == set(exp)
    for cid, (uid, vid, lag) in exp.items():
        r = got[cid]
        assert (r.user_id, r.view_id, r.lag_sec) == (uid, vid, lag)


def test_streaming_session_replay_drops_and_admits(spark):
    """The watermark must exercise BOTH paths, and the replay must
    differ from naive full-batch sessionization exactly by the
    dropped stragglers."""
    from autosinapi_spark.plans.session_queries import (
        session_window_native,
    )
    from autosinapi_spark.plans.streaming_queries import (
        streaming_session_replay,
    )

    replay = streaming_session_replay(spark, SF_SMOKE).collect()
    full = session_window_native(spark, SF_SMOKE).collect()

    n_replay = sum(r.n_events for r in replay)
    n_full = sum(r.n_events for r in full)
    # some events dropped as late...
    assert n_replay < n_full
    # ...but the bulk admitted (the straggler slice is ~5%)
    assert n_replay > 0.9 * n_full
    # every replay session is a (possibly trimmed) subset of a full
    # session: its span must nest inside one full-session span
    spans = {}
    for r in full:
        spans.setdefault(r.user_id, []).append(
            (r.session_start_us, r.session_end_us)
        )
    for r in replay:
        assert any(
            s <= r.session_start_us and r.session_end_us <= e
            for s, e in spans[r.user_id]
        )
