from .events import (  # noqa: F401
    session_window_agg,
    sliding_window_counts,
    stream_events,
    stream_tumbling_counts,
    tumbling_window_agg,
    user_running_totals_stateful,
)
