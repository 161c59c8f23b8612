"""Events surface: windowed aggregations with batch twins and Structured
Streaming variants (SURVEY §2.7 extension)."""

from .events import (  # noqa: F401
    session_windows_batch,
    sliding_window_batch,
    stream_tumbling_counts,
    tumbling_window_batch,
)
