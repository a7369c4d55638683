"""Streaming output-mode breadth (VERDICT r1 item 8): append mode emits
exactly the watermark-CLOSED windows with final values; update mode emits
a delta row per changed window per micro-batch whose last value converges
to the batch rollup.  Both parities are asserted against the batch
windowed_rollup restricted appropriately.

The replay feeds three explicit micro-batches through a file source
(processAllAvailable between appends) because watermarks lag one batch:
a single availableNow batch can never close a window in append mode.
"""

import tempfile
import uuid
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.windows import windowed_rollup
from iiot_data_engineering_lab_assignment_spark.streaming.jobs import streaming_rollup

SCHEMA = "key string, ts timestamp, value double"
T = lambda m, s: datetime(2024, 5, 1, 10, m, s)  # noqa: E731

#: three micro-batches; windows are 1 minute, watermark 5 seconds.
BATCH_1 = [("m1", T(0, 10), 10.0), ("m1", T(0, 20), 30.0), ("m1", T(1, 5), 7.0)]
BATCH_2 = [("m1", T(1, 20), 9.0), ("m1", T(2, 30), 100.0)]
#: includes one event far behind the watermark (10:00:30 when the
#: watermark is 10:02:25) — must be dropped, not reopen the 10:00 window.
BATCH_3 = [("m1", T(3, 0), 50.0), ("m1", T(0, 30), 999.0)]


def _replay(spark, output_mode):
    """Feed the three batches through a parquet file stream; return the
    memory-sink rows accumulated under the given output mode."""
    src = tempfile.mkdtemp(prefix=f"modes_{output_mode}_src_")
    name = f"modes_{output_mode}_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_rollup(stream, "ts", "1 minute", "5 seconds", [])
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="modes_ckpt_"))
        .start()
    )
    try:
        for batch in (BATCH_1, BATCH_2, BATCH_3):
            spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).collect()


def _batch_oracle(spark):
    """Batch rollup over all NON-LATE events (the watermark drops the
    999.0 straggler before it reaches any window)."""
    rows = [r for r in BATCH_1 + BATCH_2 + BATCH_3 if r[2] != 999.0]
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["window_start"]: r
        for r in windowed_rollup(df, "ts", "1 minute", None, []).collect()
    }


def test_append_mode_emits_closed_windows_final(spark):
    """Append emits each window EXACTLY ONCE, after the watermark passes
    its end, with values equal to the batch rollup of that window."""
    rows = _replay(spark, "append")
    oracle = _batch_oracle(spark)
    # final watermark seen by batch 3 = max(batch 2) - 5s = 10:02:25, so
    # exactly the 10:00 and 10:01 windows are closed and emitted
    assert sorted(r["window_start"] for r in rows) == [T(0, 0), T(1, 0)]
    for r in rows:
        o = oracle[r["window_start"]]
        assert r["count_readings"] == o["count_readings"]
        assert r["avg_value"] == o["avg_value"]
        assert r["min_value"] == o["min_value"]
        assert r["max_value"] == o["max_value"]
    # the late 999.0 event did not resurrect the closed 10:00 window
    w00 = next(r for r in rows if r["window_start"] == T(0, 0))
    assert w00["max_value"] == 30.0 and w00["count_readings"] == 2


def test_update_mode_deltas_converge_to_batch(spark):
    """Update emits one row per CHANGED window per batch; the last update
    per window (count is monotone per window) equals the batch rollup."""
    rows = _replay(spark, "update")
    oracle = _batch_oracle(spark)
    # the 10:01 window changed in two different batches -> >1 update row
    per_window: dict = {}
    for r in rows:
        cur = per_window.get(r["window_start"])
        if cur is None or r["count_readings"] > cur["count_readings"]:
            per_window[r["window_start"]] = r
    assert len(rows) > len(per_window)  # at least one window updated twice
    assert sum(1 for r in rows if r["window_start"] == T(1, 0)) == 2
    # every window the stream saw (the late row never creates one)
    assert set(per_window) == set(oracle)
    for ws, r in per_window.items():
        o = oracle[ws]
        assert r["count_readings"] == o["count_readings"]
        assert r["avg_value"] == o["avg_value"]
        assert r["min_value"] == o["min_value"]
        assert r["max_value"] == o["max_value"]


def test_session_window_append_mode(spark):
    """Session windows under append mode: a session closes once the
    watermark passes (last event + gap); the emitted row covers the whole
    merged session."""
    src = tempfile.mkdtemp(prefix="modes_sess_src_")
    name = f"modes_sess_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    # session windows in streaming REQUIRE a grouping key (Spark rejects
    # global session aggregation), so group by the sensor key
    agg = streaming_rollup(stream, "ts", "1 minute", "5 seconds", ["key"], session_gap="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="modes_sess_ckpt_"))
        .start()
    )
    # session A: 10:00:00 + 10:00:30 (merges; ends 10:01:30); session B:
    # 10:06:00 (ends 10:07:00) closes A; batch 3's 10:08:00 pushes the
    # watermark to 10:07:55 which closes B too; the 10:08 session stays
    # open and is never emitted
    b1 = [("m1", T(0, 0), 1.0), ("m1", T(0, 30), 3.0)]
    b2 = [("m1", T(6, 0), 5.0)]
    b3 = [("m1", T(8, 0), 7.0)]
    try:
        for batch in (b1, b2, b3):
            spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(spark.table(name).collect(), key=lambda r: r["window_start"])
    assert [r["window_start"] for r in rows] == [T(0, 0), T(6, 0)]
    a, b = rows
    assert a["window_end"] == T(1, 30)  # last event + gap, merged session
    assert a["count_readings"] == 2
    assert a["min_value"] == 1.0 and a["max_value"] == 3.0
    assert b["window_end"] == T(7, 0) and b["count_readings"] == 1


def test_streaming_dedup_within_watermark(spark):
    """In-flight dedup: duplicate event_ids within the watermark horizon
    (same batch AND a redelivery in the next batch) are dropped; unique
    events all survive.  State is bounded by the watermark, not by total
    distinct keys (dropDuplicatesWithinWatermark)."""
    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import streaming_dedup

    src = tempfile.mkdtemp(prefix="sdedup_src_")
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    schema = "event_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup(stream, ["event_id"], "ts", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sdedup_ckpt_"))
        .start()
    )
    # batch 1 contains an in-batch duplicate of id 1; batch 2 redelivers
    # ids 1 and 2 (within the 1-minute horizon) and adds id 3
    b1 = [(1, T(0, 10), 1.0), (1, T(0, 10), 1.0), (2, T(0, 20), 2.0)]
    b2 = [(1, T(0, 10), 1.0), (2, T(0, 20), 2.0), (3, T(0, 40), 3.0)]
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """T4: a streaming query stopped and RESTARTED from its checkpoint
    neither loses nor duplicates data — source offsets come from the
    checkpoint, and the idempotent batch_id-keyed sink overwrites any
    partially-written batch."""
    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        idempotent_batch_writer,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, value double"
    writer = idempotent_batch_writer(sink)

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(lambda df, bid: writer(df, bid))
            .option("checkpointLocation", ckpt)
            .start()
        )

    b1 = [(i, T(0, i), float(i)) for i in range(10)]
    b2 = [(i, T(1, i - 10), float(i)) for i in range(10, 20)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # simulated shutdown between batches

    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    q = start()  # NEW query object, SAME checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(f"{sink}/batch_id=*")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == list(range(20))  # nothing lost, nothing duplicated


def test_cascade_multibatch_equals_batch_rollup(spark, tmp_path):
    """Chained window-on-window aggregation across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over three time-ordered files + a sentinel
    file): watermark and both stateful operators' state must progress
    across batches such that the appended output equals the direct batch
    5-minute rollup exactly — the cross-batch form of the single-batch
    parity the registry oracle checks."""
    from datetime import timedelta

    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        _run_to_memory,
        cascade_1m_to_5m,
    )

    base = datetime(2024, 3, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    rows = [
        (i, base + timedelta(seconds=20 * i), i % 3, ["click", "view"][i % 2], float(i), None)
        for i in range(90)  # 30 minutes of events at 20 s cadence
    ]
    src_dir = str(tmp_path / "stream_src")
    # three time-ordered slices, one FILE each, plus the sentinel as a
    # fourth file => four micro-batches under maxFilesPerTrigger=1
    # (file order = listing order; names are zero-padded to sort by time)
    slices = [rows[:30], rows[30:60], rows[60:]]
    for i, sl in enumerate(slices):
        spark.createDataFrame(sl, schema).coalesce(1).write.parquet(
            f"{src_dir}/tmp{i}"
        )
    import glob
    import os
    import shutil
    import time as _time

    os.makedirs(f"{src_dir}/in")
    sentinel = [(999, rows[-1][1] + timedelta(hours=1), -1, "__sentinel__", 0.0, None)]
    spark.createDataFrame(sentinel, schema).coalesce(1).write.parquet(
        f"{src_dir}/tmps"
    )
    # FileStreamSource orders same-batch backlog by modification time;
    # rapid copies can tie at its resolution and then the SENTINEL may
    # process before a data slice — its +1h event time drags the
    # watermark past the slice, whose rows all drop as late (observed
    # flake).  Pin strictly-increasing mtimes: slices in time order,
    # sentinel strictly last.
    now = _time.time()
    for i in range(3):
        (part,) = glob.glob(f"{src_dir}/tmp{i}/part-*.parquet")
        dst = f"{src_dir}/in/{i:02d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (now + i, now + i))
    (part,) = glob.glob(f"{src_dir}/tmps/part-*.parquet")
    dst = f"{src_dir}/in/99.parquet"
    shutil.copy(part, dst)
    os.utime(dst, (now + 10, now + 10))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/in")
        .withWatermark("ts", "5 seconds")
    )
    got = (
        _run_to_memory(cascade_1m_to_5m(stream), "casc_mb", output_mode="append")
        .filter(F.col("event_type") != "__sentinel__")
        .collect()
    )
    events = spark.createDataFrame(rows, schema)
    expect = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).cast("long").alias("count_readings"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "min_value",
            "max_value",
            "count_readings",
        )
        .collect()
    )
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert {key(r): tuple(r) for r in got} == {key(r): tuple(r) for r in expect}
    assert len(got) == len(expect) > 0
