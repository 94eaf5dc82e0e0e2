"""Brute-force semantic checks for sessionization and BPE counting."""

from __future__ import annotations

import re

from autosinapi_spark.plans.session_queries import _GAP_US, sessionize_events
from autosinapi_spark.plans.text_queries import _BPE_RE, doc_bpe_token_count
from tests.conftest import SF_SMOKE


def test_sessionize_matches_python_scan(spark):
    """Replay the gap rule in Python per user and compare every
    session's (seq, n_events, start, end)."""
    from autosinapi_spark.catalog import load
    from pyspark.sql import functions as F

    ev = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.us, r.event_id)
    )
    expected = {}
    for r in rows:
        key = r.user_id
        sessions = expected.setdefault(key, [])
        if not sessions or r.us - sessions[-1]["end"] > _GAP_US:
            sessions.append({"n": 0, "start": r.us, "end": r.us})
        s = sessions[-1]
        s["n"] += 1
        s["end"] = r.us

    got = sessionize_events(spark, SF_SMOKE).collect()
    got_by_user = {}
    for r in got:
        got_by_user.setdefault(r.user_id, []).append(r)
    assert set(got_by_user) == set(expected)
    for user, sessions in expected.items():
        g = sorted(got_by_user[user], key=lambda r: r.session_seq)
        assert [r.session_seq for r in g] == list(
            range(1, len(sessions) + 1)
        )
        for spark_s, py_s in zip(g, sessions):
            assert spark_s.n_events == py_s["n"]
            assert spark_s.session_start_us == py_s["start"]
            assert spark_s.session_end_us == py_s["end"]
            assert (
                spark_s.duration_us == py_s["end"] - py_s["start"]
            )


def test_bpe_token_count_matches_python_re(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    pat = re.compile(_BPE_RE)
    expected = {
        r.doc_id: len(pat.findall(r.text))
        for r in docs
        if pat.findall(r.text)
    }
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in doc_bpe_token_count(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_events_gap_fill_python_replay(spark):
    """Spine completeness + LOCF semantics recomputed in Python from
    the raw events."""
    from collections import defaultdict
    from datetime import timedelta

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.queries import events_gap_fill
    from tests.conftest import SF_SMOKE

    rows = events_gap_fill(spark, SF_SMOKE).collect()

    ev = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    hourly_vals = defaultdict(list)
    for r in ev:
        hourly_vals[(r.event_type, r.ts.replace(
            minute=0, second=0, microsecond=0))].append(r.value)
    hours = sorted({h for (_t, h) in hourly_vals})
    h0, h1 = hours[0], hours[-1]
    types = sorted({t for (t, _h) in hourly_vals})
    n_hours = int((h1 - h0).total_seconds() // 3600) + 1

    # dense spine: every (type, hour) cell exists exactly once
    assert len(rows) == len(types) * n_hours
    got = {(r.event_type, r.hora): r for r in rows}
    assert len(got) == len(rows)

    for t in types:
        locf = 0.0
        h = h0
        while h <= h1:
            r = got[(t, h)]
            vals = hourly_vals.get((t, h))
            if vals:
                assert r.n == len(vals) and not r.is_gap
                # davg: exact-decimal mean rounded to 6
                locf = round(sum(vals) / len(vals), 6)
                # float-sum replay vs exact decimal sum: allow one
                # ulp of the 6-dp rounding boundary
                assert abs(r.valor_locf - locf) < 2e-6
            else:
                assert r.n == 0 and r.is_gap
                assert abs(r.valor_locf - locf) < 2e-6
            h += timedelta(hours=1)


def test_session_window_native_matches_manual_form(spark):
    """The native operator and the manual lag/prefix-sum form agree on
    every session except the documented boundary: a gap of EXACTLY
    the timeout splits natively but merges manually."""
    from autosinapi_spark.plans.session_queries import (
        _GAP_US,
        session_window_native,
        sessionize_events,
    )

    native = session_window_native(spark, SF_SMOKE).collect()
    manual = sessionize_events(spark, SF_SMOKE).collect()

    # native end = last event + gap
    n_sessions_native = len(native)
    n_sessions_manual = len(manual)
    assert n_sessions_native >= n_sessions_manual
    # event conservation
    assert sum(r.n_events for r in native) == sum(
        r.n_events for r in manual
    )
    # per-user session sets agree when no exact-gap boundary exists;
    # globally, every native session must nest inside a manual one
    manual_spans = {}
    for r in manual:
        manual_spans.setdefault(r.user_id, []).append(
            (r.session_start_us, r.session_end_us)
        )
    for r in native:
        start, end_ev = r.session_start_us, r.session_end_us - _GAP_US
        assert any(
            ms <= start and end_ev <= me
            for ms, me in manual_spans[r.user_id]
        ), (r.user_id, start, end_ev)
