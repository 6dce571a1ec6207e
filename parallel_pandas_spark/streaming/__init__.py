from .events import (  # noqa: F401
    run_stream_to_memory,
    session_window_agg,
    sliding_window_counts,
    stream_dedup,
    stream_events,
    stream_tumbling_counts,
    tumbling_window_agg,
    user_running_totals_stateful,
)
