"""Custom stateful streaming operator (applyInPandasWithState)."""

import tempfile
import uuid
from datetime import datetime, timedelta

import pytest

from iiot_data_engineering_lab_assignment_spark.streaming.stateful import anomaly_detector


def test_anomaly_detector_streaming(spark):
    """Feed a stream with a planted outlier; the detector flags exactly it,
    and per-key state persists across micro-batches."""
    src = tempfile.mkdtemp(prefix="anom_src_")
    name = f"anom_{uuid.uuid4().hex[:8]}"
    schema = "key string, event_time timestamp, value double"
    base = datetime(2024, 5, 1)

    # batch 1: 20 normal readings around 100 (warm-up)
    normal = [("m1", base + timedelta(seconds=i), 100.0 + (i % 5) * 0.5) for i in range(20)]
    # batch 2: one outlier + more normals (state carried from batch 1);
    # the NULL row must be skipped, not poison the running mean as NaN
    batch2 = [
        ("m1", base + timedelta(seconds=29), None),
        ("m1", base + timedelta(seconds=30), 100.5),
        ("m1", base + timedelta(seconds=31), 150.0),  # the anomaly
        ("m1", base + timedelta(seconds=32), 101.0),
        ("m2", base + timedelta(seconds=33), 5.0),  # different key, still warming up
    ]

    stream = spark.readStream.schema(schema).parquet(src)
    out = anomaly_detector(stream, "key", "event_time", "value", z_threshold=3.0, min_samples=10)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="anom_ckpt_"))
        .start()
    )
    try:
        spark.createDataFrame(normal, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table(name).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "m1"
    assert r["value"] == 150.0
    assert abs(r["zscore"]) >= 3.0
    assert r["n_seen"] >= 20  # state from batch 1 was live in batch 2


class _StubState:
    """Minimal GroupState double for driving the update fn off-stream."""

    def __init__(self, exists=False, value=None, timed_out=False):
        self._exists = exists
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_set = None

    @property
    def exists(self):
        return self._exists

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_callback_evicts_state():
    """ADVICE r1: on hasTimedOut the key must be REMOVED, not re-updated
    (re-updating re-arms the timer and the key lives forever)."""
    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import _make_update

    update = _make_update("event_time", "value", 3.0, 10, idle_timeout_ms=60_000)
    st = _StubState(exists=True, value=(5, 1.0, 0.5), timed_out=True)
    out = list(update(("k1",), iter([]), st))
    assert out == []
    assert st.removed
    assert st.updated is None  # no re-arm
    assert st.timeout_set is None


def test_data_batch_arms_timeout():
    """Normal data path still updates state and (re)arms the idle timer."""
    import pandas as pd

    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import _make_update

    update = _make_update("event_time", "value", 3.0, 10, idle_timeout_ms=60_000)
    st = _StubState(exists=False)
    pdf = pd.DataFrame(
        {"event_time": pd.to_datetime(["2024-05-01", "2024-05-02"]), "value": [1.0, 2.0]}
    )
    list(update(("k1",), iter([pdf]), st))
    assert st.updated is not None and st.updated[0] == 2
    assert st.timeout_set == 60_000
    assert not st.removed


@pytest.mark.parametrize(
    "api",
    [
        "applyInPandasWithState",
        pytest.param(
            "transformWithState",
            marks=pytest.mark.skip(
                reason="transformWithStateInPandas needs a working google.protobuf; "
                "this runtime's protobuf install is broken (cannot import "
                "'descriptor') and the state-server worker dies on init"
            ),
        ),
    ],
)
def test_gap_sessionizer_closed_sessions(spark, api):
    """Per-key gap sessionizer (both state backends share the fold): emits
    one row per CLOSED session (gap > 300s), within and across
    micro-batches.  The transformWithState param documents the Spark 4
    typed-state path, skipped only for this runtime's broken protobuf."""
    import tempfile
    import uuid
    from datetime import datetime

    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import sessionize

    src = tempfile.mkdtemp(prefix="sess_src_")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    schema = "key string, event_time timestamp, value double"
    t = lambda m, s=0: datetime(2024, 5, 1, 10, m, s)  # noqa: E731

    # m1: session closes across batches; m2: closes within one batch
    b1 = [("m1", t(0, 0), 1.0), ("m1", t(0, 30), 2.0),
          ("m2", t(0, 0), 9.0), ("m2", t(20, 0), 4.0)]
    b2 = [("m1", t(10, 0), 4.0)]
    b3 = [("m1", t(30, 0), 8.0)]

    stream = spark.readStream.schema(schema).parquet(src)
    out = sessionize(stream, gap_seconds=300, api=api)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_ckpt_"))
        .start()
    )
    try:
        for batch in (b1, b2, b3):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(spark.table(name).collect(), key=lambda r: (r["key"], r["session_start"]))
    got = [
        (r["key"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in rows
    ]
    assert got == [
        ("m1", t(0, 0), t(0, 30), 2, 3.0),   # closed by the 10:10 event
        ("m1", t(10, 0), t(10, 0), 1, 4.0),  # closed by the 10:30 event
        ("m2", t(0, 0), t(0, 0), 1, 9.0),    # closed in-batch by 10:20
    ]


def test_streaming_last_touch_carries_state_across_batches(spark):
    """A click in batch 1 attributes a purchase in batch 2 (state carry);
    a same-batch click->purchase attributes like the batch query; a
    >6h-stale click yields NULL attribution."""
    import tempfile
    import uuid
    from datetime import datetime

    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import (
        streaming_last_touch,
    )

    T = lambda h, m: datetime(2024, 3, 1, h, m, 0)  # noqa: E731
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    b1 = [
        (10, 1, T(9, 0), "click"),
        (11, 1, T(9, 30), "click"),
        (20, 2, T(1, 0), "click"),
        (30, 3, T(9, 5), "click"),
        (31, 3, T(9, 10), "purchase"),  # same-batch attribution
    ]
    b2 = [
        (12, 1, T(10, 0), "purchase"),  # cross-batch: latest click 9:30
        (21, 2, T(8, 0), "purchase"),   # 7h stale -> NULL
    ]
    src = tempfile.mkdtemp(prefix="slt_src_")
    name = f"slt_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_last_touch(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="slt_ckpt_"))
        .start()
    )
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["purchase_id"]: r for r in spark.table(name).collect()}
    assert set(rows) == {31, 12, 21}
    assert rows[31]["click_id"] == 30 and rows[31]["secs_since_click"] == 300
    assert rows[12]["click_id"] == 11 and rows[12]["secs_since_click"] == 1800
    assert rows[21]["click_id"] is None and rows[21]["secs_since_click"] is None


def test_streaming_last_touch_matches_batch_query_on_ordered_replay(spark):
    """Event-time-ordered replay (each micro-batch strictly later than
    the last) must reproduce the batch last_touch_attribution rows
    exactly — the carry-forward caveat only bites on disorder."""
    import tempfile
    import uuid

    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES
    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import (
        streaming_last_touch,
    )

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    cut = rows[len(rows) // 2][2]  # median ts: two time-ordered batches
    b1 = [r for r in rows if (r[2], r[0]) <= (cut, rows[len(rows) // 2][0])]
    b2 = [r for r in rows if (r[2], r[0]) > (cut, rows[len(rows) // 2][0])]
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    src = tempfile.mkdtemp(prefix="sltp_src_")
    name = f"sltp_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_last_touch(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sltp_ckpt_"))
        .start()
    )
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["purchase_id"]: (r["click_id"], r["secs_since_click"])
        for r in spark.table(name).collect()
    }
    want = {
        r["purchase_id"]: (r["click_id"], r["secs_since_click"])
        for r in QUERIES["last_touch_attribution"].fn(spark, sf).collect()
    }
    assert got == want


def test_cusum_alarm_fires_once_on_shift_and_resets(spark):
    """A +5 level shift against target 10 (slack 1, threshold 12)
    accumulates +4/step -> alarm on the 4th shifted reading, then the
    accumulator resets and re-arms; noise inside the slack band never
    fires; detection crosses micro-batch boundaries."""
    import tempfile
    import uuid
    from datetime import datetime, timedelta

    from iiot_data_engineering_lab_assignment_spark.streaming.stateful import (
        cusum_alarm,
    )

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    schema = "key string, event_time timestamp, value double"
    # batch 1: 5 in-band readings, then the shift starts with 2 readings
    b1 = [("s1", t0 + timedelta(minutes=i), 10.0 + (0.5 if i % 2 else -0.5)) for i in range(5)]
    b1 += [("s1", t0 + timedelta(minutes=5 + j), 15.0) for j in range(2)]
    # batch 2: two more shifted readings -> crossing happens HERE (state carry)
    b2 = [("s1", t0 + timedelta(minutes=7 + j), 15.0) for j in range(4)]
    # quiet key never alarms
    b1 += [("s2", t0 + timedelta(minutes=i), 10.0) for i in range(7)]
    b2 += [("s2", t0 + timedelta(minutes=7 + i), 10.0) for i in range(4)]

    src = tempfile.mkdtemp(prefix="cusum_alarm_src_")
    name = f"cusum_alarm_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        cusum_alarm(stream, target=10.0, threshold=12.0, slack=1.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cusum_alarm_ckpt_"))
        .start()
    )
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(spark.table(name).collect(), key=lambda r: r["event_time"])
    assert all(r["key"] == "s1" for r in rows)
    # +4 per shifted reading: crossing at the 4th shifted reading
    # (minute 8, second row of batch 2 -> state carried across batches);
    # after reset the remaining 2 shifted readings reach only 8 < 12
    assert len(rows) == 1
    assert rows[0]["event_time"] == t0 + timedelta(minutes=8)
    assert abs(rows[0]["cusum"] - 16.0) < 1e-9
    # 5 in-band + 2 shifted (b1) + 2 shifted (b2) rows precede the alarm
    assert rows[0]["n_since_reset"] == 9
