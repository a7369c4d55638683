from .jobs import (
    events_file_stream,
    run_events_stream_rollup,
    streaming_rollup,
    fan_out_two_sinks,
)

__all__ = [
    "events_file_stream",
    "run_events_stream_rollup",
    "streaming_rollup",
    "fan_out_two_sinks",
]
