"""Structured Streaming operators (SURVEY §2.D)."""

from .ops import (
    incremental_bitmap_distinct,
    incremental_minhash_dedup,
    read_bitmap_distinct,
    run_late_data_audit,
    stage_arrival_batches,
    read_documents_stream,
    read_events_stream,
    read_latest_wins,
    run_available_now,
    stream_dedup_events,
    stream_minhash_dedup_banded,
    stream_minhash_dedup_docs,
    stream_ewma_anomalies,
    stream_sessionize_events,
    stream_upsert_aggregate,
    windowed_event_counts,
)

__all__ = [
    "incremental_bitmap_distinct",
    "read_bitmap_distinct",
    "read_documents_stream",
    "read_events_stream",
    "incremental_minhash_dedup",
    "read_latest_wins",
    "run_available_now",
    "run_late_data_audit",
    "stage_arrival_batches",
    "stream_dedup_events",
    "stream_minhash_dedup_banded",
    "stream_minhash_dedup_docs",
    "stream_ewma_anomalies",
    "stream_sessionize_events",
    "stream_upsert_aggregate",
    "windowed_event_counts",
]
