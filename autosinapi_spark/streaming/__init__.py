"""Structured Streaming operators (SURVEY §2.10 extension surface).

The reference is strictly batch; its "incremental" semantics is the
monthly re-run appending idempotently via ON CONFLICT DO NOTHING
(``database.py:193-197``). The Spark-native mapping is a
``Trigger.AvailableNow`` file-arrival stream over a landing zone with
the same K2 anti-join append inside ``foreachBatch`` — plus the
windowed/watermarked and custom-stateful operators a streaming
deployment of the extended engine needs.
"""

from .incremental import (
    dedup_events_stream,
    incremental_append_available_now,
    burst_close_alerts,
    running_user_totals,
    sessionized_event_stats,
    windowed_event_stats,
)
from .ingest import accept_batch, ingest_dedup_available_now

__all__ = [
    "incremental_append_available_now",
    "windowed_event_stats",
    "sessionized_event_stats",
    "burst_close_alerts",
    "running_user_totals",
    "dedup_events_stream",
    "accept_batch",
    "ingest_dedup_available_now",
]
