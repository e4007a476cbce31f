from .score_stream import run_available_now, stream_events, stream_window_flags

__all__ = ["stream_events", "stream_window_flags", "run_available_now"]
