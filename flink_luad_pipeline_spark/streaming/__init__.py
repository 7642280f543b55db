from .ops import (  # noqa: F401
    read_events_stream,
    run_available_now,
    session_window_agg,
    sliding_window_counts,
    stateful_user_totals,
    streaming_dedup_keys,
    tumbling_window_agg,
)
