"""Structured Streaming surfaces for the extraction engine."""

from .stream import stream_extract, windowed_event_counts

__all__ = ["stream_extract", "windowed_event_counts"]
