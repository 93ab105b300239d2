from .twins import stream_events, tumbling_stream, dedup_stream, session_stream

__all__ = ["stream_events", "tumbling_stream", "dedup_stream", "session_stream"]
