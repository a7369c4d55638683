from .lifecycle import (
    write_partitioned,
    write_partitioned_by_date,
    apply_retention,
    compact,
)
from .orchestrator import NightlyFlow, StepResult

__all__ = [
    "write_partitioned",
    "write_partitioned_by_date",
    "apply_retention",
    "compact",
    "NightlyFlow",
    "StepResult",
]
