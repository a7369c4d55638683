from .jobs import (
    events_file_stream,
    fan_out_two_sinks,
    run_events_stream_rollup,
    streaming_rollup,
)
from .stateful import ANOMALY_SCHEMA, STATE_SCHEMA, anomaly_detector

__all__ = [
    "events_file_stream",
    "fan_out_two_sinks",
    "run_events_stream_rollup",
    "streaming_rollup",
    "ANOMALY_SCHEMA",
    "STATE_SCHEMA",
    "anomaly_detector",
]
