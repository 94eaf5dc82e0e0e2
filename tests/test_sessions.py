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
