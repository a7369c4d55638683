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

__all__ = ["anomaly_detector", "sessionize", "make_sessionizer", "streaming_last_touch", "cusum_alarm", "streaming_debounce", "DEBOUNCE_SCHEMA", "DEBOUNCE_STATE_SCHEMA", "ANOMALY_SCHEMA", "STATE_SCHEMA", "SESSION_SCHEMA", "ATTRIBUTION_SCHEMA", "ATTRIBUTION_STATE_SCHEMA", "CUSUM_ALARM_SCHEMA", "CUSUM_STATE_SCHEMA"]

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


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API): session summarizer
# ---------------------------------------------------------------------------

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
    ]
)


def _fold_sessions(key, pdfs, state_tuple, gap_seconds):
    """Shared session fold: consume this batch's rows (sorted by event
    time), closing a session whenever the gap exceeds ``gap_seconds``.
    State is (start_us, last_us, n, sum) in epoch MICROSECONDS — integer
    state keeps the fold exact and timezone-free.
    Returns (closed_rows, new_state)."""
    start_us, last_us, n, s = state_tuple
    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_time")
        ts_us = (pdf["event_time"].astype("int64") // 1000).tolist()
        for t_us, v in zip(ts_us, pdf["value"]):
            if last_us is not None and t_us - last_us > gap_seconds * 1_000_000:
                closed.append((key[0], start_us, last_us, n, float(s)))
                start_us, last_us, n, s = None, None, 0, 0.0
            if start_us is None:
                start_us = t_us
            last_us = t_us
            n += 1
            s += float(v) if not pd.isna(v) else 0.0
    return closed, (start_us, last_us, n, float(s))


def _closed_frame(closed):
    out = pd.DataFrame(
        closed, columns=["key", "start_us", "end_us", "n_events", "sum_value"]
    )
    return pd.DataFrame(
        {
            "key": out["key"],
            "session_start": pd.to_datetime(out["start_us"], unit="us"),
            "session_end": pd.to_datetime(out["end_us"], unit="us"),
            "n_events": out["n_events"],
            "sum_value": out["sum_value"],
        }
    )


def make_sessionizer(gap_seconds: int = 300):
    """Build a StatefulProcessor that collapses per-key event streams into
    session summaries: a session CLOSES when the next event for the key
    arrives more than ``gap_seconds`` after the previous one, and the
    closed session is emitted as one row (start, end, count, sum).

    This is the Spark 4 ``transformWithState`` form of custom state (the
    typed-state successor to applyInPandasWithState): per-key ValueState
    holds the open session (4 scalars, O(1) per key).  Rows arrive in
    arbitrary order WITHIN a batch, so each batch's rows are sorted by
    event time before folding — cross-batch order is the stream's
    responsibility.

    Open sessions stay in state across batches and are NOT emitted (in
    production, register a processing-time timer to flush idle sessions;
    replay tests assert closed sessions only).

    ENVIRONMENT NOTE: this runtime's google.protobuf install is broken
    (`cannot import name 'descriptor'`), which crashes Spark's
    transform_with_state_driver_worker on init — so only the
    applyInPandasWithState backend of :func:`sessionize` is exercisable
    in tests here; the fold logic (_fold_sessions) is shared and tested
    through that backend.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState(
                "open_session", "start_us long, last_us long, n long, s double"
            )

        def handleInputRows(self, key, rows, timer_values):
            state = self._sess.get() if self._sess.exists() else (None, None, 0, 0.0)
            closed, new_state = _fold_sessions(key, rows, state, gap_seconds)
            self._sess.update(new_state)
            if closed:
                yield _closed_frame(closed)

        def close(self) -> None:
            pass

    return Sessionizer()


def sessionize(
    readings: DataFrame,
    key_col: str = "key",
    time_col: str = "event_time",
    value_col: str = "value",
    gap_seconds: int = 300,
    api: str = "applyInPandasWithState",
) -> DataFrame:
    """Gap-based sessionizer over a (streaming) DataFrame of (key, time,
    value); emits one row per CLOSED session (gap > gap_seconds).

    ``api`` picks the state backend: "applyInPandasWithState" (default —
    runs everywhere) or "transformWithState" (the Spark 4 typed-state
    API; requires a working protobuf install, see make_sessionizer).
    Both share the exact fold (_fold_sessions), so semantics are
    identical by construction.
    """
    grouped = readings.selectExpr(
        f"{key_col} AS key", f"{time_col} AS event_time", f"{value_col} AS value"
    ).groupBy("key")
    if api == "transformWithState":
        return grouped.transformWithStateInPandas(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    def update(key, pdfs, state: GroupState):
        st = state.get if state.exists else (None, None, 0, 0.0)
        closed, new_state = _fold_sessions(key, pdfs, st, gap_seconds)
        state.update(new_state)
        if closed:
            yield _closed_frame(closed)

    return grouped.applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType="start_us long, last_us long, n long, s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming last-touch attribution: per-user carry-forward state
# ---------------------------------------------------------------------------

ATTRIBUTION_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("purchase_ts", TimestampType(), True),
        StructField("click_id", LongType(), True),
        StructField("secs_since_click", LongType(), True),
    ]
)

#: (last_click_id, last_click_us) — the carry-forward attribution state.
ATTRIBUTION_STATE_SCHEMA = StructType(
    [
        StructField("last_click_id", LongType(), True),
        StructField("last_click_us", LongType(), True),
    ]
)


def streaming_last_touch(
    events: DataFrame,
    attribution_window_us: int = 21_600_000_000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch ``last_touch_attribution`` query:
    per-user O(1) state (latest click id + time) carried across
    micro-batches; every purchase row emits immediately with its
    attribution (NULL if the freshest click is older than the window).

    Within a micro-batch rows process in (ts, event_id) order, so a
    click and a purchase landing in the same batch attribute exactly as
    the batch query's window ordering.  ACROSS batches the state only
    moves forward: a click arriving in a LATER batch than a purchase it
    precedes in event time cannot retro-attribute — the same
    arrival-order caveat every carry-forward stateful operator has; the
    batch query is the backfill-correct form (run it over closed days).

    Input columns: event_id, user_id, ts, event_type.  State is two
    longs per user — bounded by user cardinality; ``idle_timeout_ms``
    evicts dormant users on continuous jobs (leave None for
    availableNow replays, as in anomaly_detector)."""
    win = int(attribution_window_us)
    timeout_ms = idle_timeout_ms

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_click_id, last_click_us = state.get
        else:
            last_click_id, last_click_us = None, None
        out = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            us = int(row.ts.value) // 1000  # pandas ns -> µs
            if row.event_type == "click":
                last_click_id, last_click_us = int(row.event_id), us
            elif row.event_type == "purchase":
                fresh = (
                    last_click_us is not None and us - last_click_us <= win
                )
                out.append(
                    (
                        int(row.event_id),
                        int(user_id),
                        row.ts,
                        int(last_click_id) if fresh else None,
                        (us - last_click_us) // 1_000_000 if fresh else None,
                    )
                )
        if last_click_us is not None:
            state.update((last_click_id, last_click_us))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "purchase_id",
                    "user_id",
                    "purchase_ts",
                    "click_id",
                    "secs_since_click",
                ],
            )

    grouped = events.select("event_id", "user_id", "ts", "event_type").groupBy(
        "user_id"
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=ATTRIBUTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM drift alarm (Page's test against a calibrated target)
# ---------------------------------------------------------------------------

CUSUM_ALARM_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("event_time", TimestampType(), True),
        StructField("cusum", DoubleType(), True),
        StructField("n_since_reset", LongType(), True),
    ]
)

#: (cusum_pos, n_since_reset) — Page's one-sided accumulator.
CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("c", DoubleType(), True),
        StructField("n", LongType(), True),
    ]
)


def cusum_alarm(
    readings: DataFrame,
    target: float,
    threshold: float,
    slack: float = 0.0,
    key_col: str = "key",
    time_col: str = "event_time",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming one-sided CUSUM (Page's test): per key, accumulate
    C_k = max(0, C_{k-1} + (x_k - target - slack)); when C crosses
    ``threshold``, emit an alarm row and RESET — the calibrated-target
    twin of the batch ``cusum_drift_per_user`` query (which measures
    drift against the realized mean over a closed window; this one
    detects it live against a known baseline, the form SPC charts and
    sensor-drift monitors actually deploy).

    State is two numbers per key.  Within a micro-batch rows process in
    (time, value) order; the alarm fires on the first crossing row, so
    detection latency is exact to the input row, not the batch.
    ``slack`` absorbs acceptable wander (the classic k parameter)."""
    tgt, h, k = float(target), float(threshold), float(slack)
    timeout_ms = idle_timeout_ms

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.hasTimedOut:
            state.remove()
            return
        c, n = state.get if state.exists else (0.0, 0)
        out = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["event_time", "value"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            c = max(0.0, c + (float(row.value) - tgt - k))
            n += 1
            if c > h:
                out.append((key_val, row.event_time, c, n))
                c, n = 0.0, 0
        state.update((c, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["key", "event_time", "cusum", "n_since_reset"]
            )

    # key casts to STRING to honor the generic key_col contract — the
    # output schema declares StringType, and a long key would otherwise
    # fail Arrow conversion on the first non-empty batch (review catch)
    grouped = readings.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"{time_col} AS event_time",
        f"{value_col} AS value",
    ).groupBy("key")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=CUSUM_ALARM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming alert debounce (cooldown relative to the last EMITTED alert)
# ---------------------------------------------------------------------------

DEBOUNCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("alert_ts", TimestampType(), True),
    ]
)

#: one long per key: microsecond timestamp of the last emitted alert.
DEBOUNCE_STATE_SCHEMA = StructType(
    [StructField("last_kept_us", LongType(), True)]
)


def streaming_debounce(
    events: DataFrame,
    cooldown_us: int = 21_600_000_000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch ``debounce_alerts`` query (registry):
    emit an alert only when >= cooldown has passed since the last
    EMITTED alert for that key — the recursive keep-set no window frame
    expresses, carried here as one long of state per user.

    Within a micro-batch rows process in (ts, event_id) order, so a
    time-ordered replay reproduces the batch recursive-CTE result
    row-for-row (pinned by tests/test_r9_ops.py).  Across batches state
    only moves forward — the standard carry-forward caveat; the batch
    query is the backfill-correct form.  Callers pre-filter to the
    alerting event type; input columns: event_id, user_id, ts."""
    cooldown = int(cooldown_us)
    timeout_ms = idle_timeout_ms

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            us = int(row.ts.value) // 1000  # pandas ns -> µs
            if last is None or us >= last + cooldown:
                out.append((int(user_id), int(row.event_id), row.ts))
                last = us
        if last is not None:
            state.update((int(last),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "alert_ts"]
            )

    grouped = events.select("event_id", "user_id", "ts").groupBy("user_id")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=DEBOUNCE_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
