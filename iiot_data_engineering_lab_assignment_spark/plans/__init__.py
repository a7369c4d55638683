from .lifecycle import (
    write_partitioned,
    write_partitioned_by_date,
    apply_retention,
    compact,
    read_lake,
    upsert,
    incremental_rollup_refresh,
)
from .orchestrator import NightlyFlow, StepResult

__all__ = [
    "write_partitioned",
    "write_partitioned_by_date",
    "apply_retention",
    "compact",
    "read_lake",
    "upsert",
    "incremental_rollup_refresh",
    "NightlyFlow",
    "StepResult",
]
