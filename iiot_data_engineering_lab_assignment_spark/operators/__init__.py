from .aggregates import sensor_rollup, grouped_stats
from .windows import tumbling_rollup, sliding_rollup, session_rollup, analytic_over

__all__ = [
    "sensor_rollup",
    "grouped_stats",
    "tumbling_rollup",
    "sliding_rollup",
    "session_rollup",
    "analytic_over",
]
