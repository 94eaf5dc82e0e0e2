"""Structured Streaming tests: incremental idempotent load, watermarked
windows, custom stateful operator — all via Trigger.AvailableNow /
bounded memory-sink runs so they terminate deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.streaming import (
    incremental_append_available_now,
    running_user_totals,
    windowed_event_stats,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    # micros timestamps, bounded slice for speed
    return load(spark, SF_SMOKE, "events").limit(2000).cache()


def test_incremental_append_is_idempotent_across_batches(spark, events, tmp_path):
    landing = tmp_path / "landing"
    table = str(tmp_path / "tabela")
    ckpt = str(tmp_path / "ckpt")
    schema = events.schema

    first = events.where(F.col("event_id") % 2 == 0)
    first.write.mode("overwrite").parquet(str(landing / "batch1"))
    incremental_append_available_now(
        spark, str(landing / "*"), table, ckpt, ["event_id"], schema
    )
    n1 = spark.read.parquet(table).count()
    assert n1 == first.count()

    # second delivery overlaps half of the first: only new PKs land
    second = events.where(F.col("event_id") % 3 == 0)
    second.write.mode("overwrite").parquet(str(landing / "batch2"))
    incremental_append_available_now(
        spark, str(landing / "*"), table, ckpt, ["event_id"], schema
    )
    out = spark.read.parquet(table)
    expected = events.where(
        (F.col("event_id") % 2 == 0) | (F.col("event_id") % 3 == 0)
    ).count()
    assert out.count() == expected
    assert out.select("event_id").distinct().count() == expected

    # re-run with nothing new: checkpoint skips seen files, no dups
    incremental_append_available_now(
        spark, str(landing / "*"), table, ckpt, ["event_id"], schema
    )
    assert spark.read.parquet(table).count() == expected


def test_windowed_stats_match_batch_groupby(spark, events, tmp_path):
    src = tmp_path / "events_src"
    events.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        windowed_event_stats(stream)
        .writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["inicio"], r["event_type"]): (r["n"], r["soma_valor"])
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    want = {
        (r["inicio"], r["event_type"]): (r["n"], r["soma_valor"])
        for r in windowed_event_stats(events).collect()
    }
    assert got == want and len(got) > 0


def test_running_user_totals_state(spark, events, tmp_path):
    src = tmp_path / "events_src2"
    events.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            "SELECT * FROM running_totals"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("total"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_within_watermark(spark, events, tmp_path):
    from autosinapi_spark.streaming import dedup_events_stream

    src = tmp_path / "events_dup"
    # deliver every event twice (at-least-once semantics)
    events.write.mode("overwrite").parquet(str(src / "a"))
    events.write.mode("overwrite").parquet(str(src / "b"))

    stream = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        dedup_events_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT event_id FROM dedup_stream")
    assert out.count() == events.count()  # every duplicate dropped
    assert out.distinct().count() == events.count()


@pytest.mark.parametrize("encoding", ["ntz_us", "nanos_long"])
def test_watermark_works_on_both_fixture_ts_encodings(
    spark, events, tmp_path, encoding
):
    """The driver's fixture parquet has shipped ``ts`` as both
    INT64-nanos and timestamp[us]-NTZ across rounds; the round-4 shift
    broke every watermark call site. Pin the repair recipe for BOTH
    encodings: declare the raw physical schema, route the stream
    through ``normalize_ts_columns``, and the watermarked agg must
    match the batch twin bit-for-bit."""
    from autosinapi_spark.catalog import normalize_ts_columns

    src = tmp_path / f"events_{encoding}"
    small = events.limit(500)
    if encoding == "ntz_us":
        raw = small.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    else:
        raw = small.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    raw.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(raw.schema).parquet(str(src))
    norm = normalize_ts_columns(stream, ["ts"])
    assert dict(norm.dtypes)["ts"] == "timestamp"
    q = (
        windowed_event_stats(norm)
        .writeStream.format("memory")
        .queryName(f"enc_{encoding}")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["inicio"], r["event_type"]): (r["n"], r["soma_valor"])
        for r in spark.sql(f"SELECT * FROM enc_{encoding}").collect()
    }
    want = {
        (r["inicio"], r["event_type"]): (r["n"], r["soma_valor"])
        for r in windowed_event_stats(small).collect()
    }
    assert got == want and len(got) > 0


def test_session_windows_match_batch_and_sessionize_query(
    spark, events, tmp_path
):
    from autosinapi_spark.plans.session_queries import _GAP_US
    from autosinapi_spark.streaming import sessionized_event_stats

    src = tmp_path / "events_sessions_src"
    events.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        sessionized_event_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_stats").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionized_event_stats(events).collect()
    }
    assert got == want and len(got) > 0

    # the exact-gap boundary (the one semantic divergence documented on
    # sessionized_event_stats) does not occur in the fixture slice, so
    # session COUNTS must agree with the batch sessionize query
    us = sorted(
        (r.user_id, r.us)
        for r in events.select(
            "user_id", F.unix_micros("ts").alias("us")
        ).collect()
    )
    assert all(
        not (a[0] == b[0] and b[1] - a[1] == _GAP_US)
        for a, b in zip(us, us[1:])
    )
    from collections import Counter

    got_counts = Counter(u for (u, _s) in got)
    want_counts: Counter = Counter()
    prev: dict = {}
    for u, t in us:  # same gap rule the batch sessionize query applies
        if u not in prev or t - prev[u] > _GAP_US:
            want_counts[u] += 1
        prev[u] = t
    assert dict(got_counts) == dict(want_counts)


def test_stream_stream_join_matches_batch_interval_join(
    spark, events, tmp_path
):
    """Real stream-stream interval join (two file streams, availableNow)
    equals the batch interval join over the same rows — single batch,
    so the watermark admits everything and the comparison is exact."""
    from autosinapi_spark.streaming.incremental import attributed_click_pairs

    views = events.where(F.col("event_type") == "view")
    clicks = events.where(F.col("event_type") == "click")
    vsrc, csrc = tmp_path / "views_src", tmp_path / "clicks_src"
    views.write.mode("overwrite").parquet(str(vsrc))
    clicks.write.mode("overwrite").parquet(str(csrc))

    vstream = spark.readStream.schema(events.schema).parquet(str(vsrc))
    cstream = spark.readStream.schema(events.schema).parquet(str(csrc))
    q = (
        attributed_click_pairs(vstream, cstream)
        .writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.click_id, r.view_id, r.lag_sec)
        for r in spark.sql("SELECT * FROM attr_pairs").collect()
    }
    want = {
        (r.user_id, r.click_id, r.view_id, r.lag_sec)
        for r in attributed_click_pairs(views, clicks).collect()
    }
    assert got == want and len(got) > 0


def test_burst_close_fires_on_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout state machine: a burst closes ONLY once the
    watermark (advanced by later batches) passes last_event + gap, and
    a key with fresh data re-arms instead of closing. Three
    AvailableNow runs over one checkpoint replay the batch sequence;
    Spark evaluates batch N's timeouts against the watermark as of
    the END of batch N-1, which the run boundaries make explicit."""
    from datetime import datetime

    from autosinapi_spark.streaming import burst_close_alerts

    landing = tmp_path / "landing"
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"

    def deliver(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / name))

    def run():
        stream = spark.readStream.schema(schema).parquet(
            str(landing / "*")
        )
        q = (
            burst_close_alerts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda h, m: datetime(2024, 1, 1, h, m)
    # batch 1: user 1 bursts (10:00, 10:05); user 2 one event (10:00)
    deliver(
        [(1, t(10, 0), 1.5), (1, t(10, 5), 2.5), (2, t(10, 0), 4.0)],
        "b1",
    )
    run()
    # the parquet sink writes (empty) part files per batch; the
    # contract is zero ROWS while the watermark is behind
    assert spark.read.parquet(out).count() == 0

    # batch 2: user 2 speaks again at 12:00 — re-arms its timeout and
    # drags the watermark to 11:50 (10 min delay), past user 1's
    # 10:35 deadline; the timeout itself fires NEXT batch
    deliver([(2, t(12, 0), 8.0)], "b2")
    run()

    # batch 3: any later event forces a batch evaluated against the
    # 11:50 watermark -> user 1's burst closes; user 2 re-armed 12:30
    deliver([(3, t(12, 30), 0.0)], "b3")
    run()

    rows = spark.read.parquet(out).collect()
    assert [
        (r.user_id, r.burst_start, r.burst_end, r.n_events, r.sum_value)
        for r in rows
    ] == [(1, t(10, 0), t(10, 5), 2, 4.0)]
