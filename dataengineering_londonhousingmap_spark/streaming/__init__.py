from .incremental import (  # noqa: F401
    dedup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
)
