from .stateful import (  # noqa: F401
    foreach_batch_collector,
    high_water_marks,
    running_user_totals,
)
from .windows import (  # noqa: F401
    read_events_stream,
    session_counts_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
