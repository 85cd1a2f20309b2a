from .stream_ops import (  # noqa: F401
    sessionize,
    stream_windowed_counts,
    windowed_event_counts,
)
