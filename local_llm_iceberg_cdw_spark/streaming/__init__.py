"""Structured Streaming jobs over the events schema."""

from .jobs import stream_events_from_dir, tumbling_event_counts, dedup_events_stream

__all__ = ["stream_events_from_dir", "tumbling_event_counts", "dedup_events_stream"]
