from .ingest import stream_events_dedup

__all__ = ["stream_events_dedup"]
