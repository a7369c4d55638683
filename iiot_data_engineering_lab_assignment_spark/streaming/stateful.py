"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful operator is the windowed aggregation
(SURVEY.md section 2.8 T7 — state handled by the engine). This module
adds the CUSTOM-state capability Spark offers beyond that:
``applyInPandasWithState`` with per-key user-defined state, demonstrated
as a sensor anomaly detector — per (machine, sensor) running
mean/variance (Welford) with a z-score threshold, emitting one row per
anomalous reading.

State per key is O(1) (count, mean, M2) — bounded by key cardinality,
not input volume; a state timeout evicts idle keys. The same operator
shape covers sessionization, pattern detection, and online feature
normalization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["anomaly_detector", "ANOMALY_SCHEMA", "STATE_SCHEMA"]

ANOMALY_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("event_time", TimestampType(), True),
        StructField("value", DoubleType(), True),
        StructField("zscore", DoubleType(), True),
        StructField("n_seen", LongType(), True),
    ]
)

#: (count, mean, M2) — Welford's online variance accumulator.
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("mean", DoubleType(), True),
        StructField("m2", DoubleType(), True),
    ]
)


def _make_update(
    time_col: str,
    value_col: str,
    z_threshold: float,
    min_samples: int,
    idle_timeout_ms: int | None,
):
    """Build the per-key state-update function (module-level so tests can
    drive it with a stub GroupState without a running stream)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Timeout callback (no new data for this key within idle_timeout_ms):
        # actually EVICT — updating state here would re-arm the timer and the
        # key would live forever, with timeout micro-batches recurring.
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for t, v in zip(pdf[time_col], pdf[value_col]):
                # pd.isna, not `is None`: SQL NULL arrives as NaN in the
                # Arrow->pandas float column and would poison the running
                # mean/M2 forever
                if pd.isna(v):
                    continue
                if n >= min_samples:
                    var = m2 / (n - 1) if n > 1 else 0.0
                    std = var**0.5
                    if std > 0:
                        z = (v - mean) / std
                        if abs(z) >= z_threshold:
                            out_rows.append((key[0], t, float(v), float(z), n))
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["key", "event_time", "value", "zscore", "n_seen"]
            )

    return update


def anomaly_detector(
    readings: DataFrame,
    key_col: str = "key",
    time_col: str = "event_time",
    value_col: str = "value",
    z_threshold: float = 3.0,
    min_samples: int = 10,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key anomaly detection with custom state.

    Input: a (possibly streaming) DataFrame with (key, time, value).
    Output: rows whose |z-score| against the key's RUNNING distribution
    exceeds ``z_threshold`` (after ``min_samples`` warm-up).  Welford's
    algorithm keeps state numerically stable and O(1) per key.

    ``idle_timeout_ms`` evicts idle keys in long-running continuous jobs
    (ProcessingTimeTimeout).  Leave None for availableNow/batch replays:
    a processing-time timeout schedules extra timeout-handling
    micro-batches after the data is exhausted, which keeps an
    availableNow query alive indefinitely.
    """
    update = _make_update(time_col, value_col, z_threshold, min_samples, idle_timeout_ms)
    grouped = readings.selectExpr(
        f"{key_col} AS key", f"{time_col} AS event_time", f"{value_col} AS value"
    ).groupBy("key")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
