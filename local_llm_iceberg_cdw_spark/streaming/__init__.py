"""Structured Streaming jobs over the events schema."""

from .jobs import (
    dedup_events_stream,
    running_user_totals,
    stream_events_from_dir,
    tumbling_event_counts,
)

__all__ = [
    "dedup_events_stream",
    "running_user_totals",
    "stream_events_from_dir",
    "tumbling_event_counts",
]
