from .windows import (  # noqa: F401
    read_events_stream,
    session_counts_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
