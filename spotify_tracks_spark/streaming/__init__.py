from .ingest import stream_events_dedup
from .stateful import stream_sessionize
from .windowed import stream_events_windowed

__all__ = ["stream_events_dedup", "stream_events_windowed", "stream_sessionize"]
