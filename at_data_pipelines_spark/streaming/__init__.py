from .events import (  # noqa: F401
    read_events_stream,
    running_user_stats,
    sessionize_stream,
    stream_to_lakehouse,
    windowed_aggregation,
)
