"""Stream-stream join (Structured Streaming's hardest operator): two
watermarked streams joined on key + event-time range, state bounded by
the watermark/range arithmetic.  Parity-checked against the equivalent
batch range join."""

import tempfile
import uuid

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.streaming.jobs import events_file_stream

from conftest import SF_DIR


def test_stream_stream_range_join_parity(spark):
    """purchases-stream x clicks-stream (same source, two filtered legs),
    click within 30 minutes before the purchase; availableNow replay in
    append mode equals the batch range join for all joinable pairs."""
    stream = events_file_stream(spark, SF_DIR)
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "5 seconds")
    )
    c = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "5 seconds")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select("purchase_id", "click_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssj_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table(name).collect()}

    # batch reference
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events")
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    expected = {
        tuple(r)
        for r in bp.join(
            bc,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("click_ts") < F.col("purchase_ts")),
        )
        .select("purchase_id", "click_id")
        .collect()
    }
    assert got == expected
    assert len(expected) > 0


def test_stream_stream_left_join_emits_nulls_after_watermark(spark):
    """LEFT OUTER stream-stream interval join: a purchase with no
    qualifying click is emitted with NULL click columns ONLY after the
    watermark proves no future click can match; matched purchases emit
    normally.  Driven with explicit micro-batches because absence is
    only provable watermark-forward."""
    from datetime import datetime, timedelta

    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        stream_stream_left_range_join,
    )

    base = datetime(2024, 6, 1, 12, 0, 0)
    psrc = tempfile.mkdtemp(prefix="ssl_p_")
    csrc = tempfile.mkdtemp(prefix="ssl_c_")
    pschema = "purchase_id long, user_id string, purchase_ts timestamp"
    cschema = "click_id long, c_user_id string, click_ts timestamp"
    p = (
        spark.readStream.schema(pschema)
        .parquet(psrc)
        .withWatermark("purchase_ts", "5 seconds")
    )
    c = (
        spark.readStream.schema(cschema)
        .parquet(csrc)
        .withWatermark("click_ts", "5 seconds")
    )
    joined = stream_stream_left_range_join(p, c, interval="10 minutes")
    name = f"ssleft_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssl_ckpt_"))
        .start()
    )
    try:
        # batch 1: u1 purchase WITH a matching click 1 min earlier;
        #          u2 purchase with NO click at all
        spark.createDataFrame(
            [(1, "u1", base), (2, "u2", base)], pschema
        ).coalesce(1).write.mode("append").parquet(psrc)
        spark.createDataFrame(
            [(10, "u1", base - timedelta(minutes=1))], cschema
        ).coalesce(1).write.mode("append").parquet(csrc)
        q.processAllAvailable()
        rows = {r["purchase_id"]: r for r in spark.table(name).collect()}
        assert rows[1]["click_id"] == 10  # inner match emits immediately
        assert 2 not in rows  # null NOT yet provable -> withheld

        # batch 2: far-future rows on BOTH sides push both watermarks
        # past base + 10 min horizon -> u2's null becomes provable
        far = base + timedelta(hours=2)
        spark.createDataFrame([(99, "zz", far)], pschema).coalesce(1).write.mode(
            "append"
        ).parquet(psrc)
        spark.createDataFrame([(98, "zz", far)], cschema).coalesce(1).write.mode(
            "append"
        ).parquet(csrc)
        q.processAllAvailable()
        # one more empty-ish advance so the outer-null flush lands
        spark.createDataFrame(
            [(100, "zz", far + timedelta(minutes=1))], pschema
        ).coalesce(1).write.mode("append").parquet(psrc)
        q.processAllAvailable()
        rows = {r["purchase_id"]: r for r in spark.table(name).collect()}
        assert 2 in rows, "outer null must flush once absence is provable"
        assert rows[2]["click_id"] is None
        assert rows[2]["click_ts"] is None
        assert rows[1]["click_id"] == 10  # and emitted exactly once
        assert sum(1 for r in spark.table(name).collect() if r["purchase_id"] == 1) == 1
    finally:
        q.stop()


def test_stream_stream_full_outer_join_emits_both_null_legs(spark):
    """FULL OUTER stream-stream interval join: an unmatched purchase
    emits with NULL click columns AND an unmatched click emits with NULL
    purchase columns — each only after the OPPOSITE side's watermark
    proves absence, each exactly once."""
    from datetime import datetime, timedelta

    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        stream_stream_full_outer_range_join,
    )

    base = datetime(2024, 6, 1, 12, 0, 0)
    psrc = tempfile.mkdtemp(prefix="ssf_p_")
    csrc = tempfile.mkdtemp(prefix="ssf_c_")
    pschema = "purchase_id long, user_id string, purchase_ts timestamp"
    cschema = "click_id long, c_user_id string, click_ts timestamp"
    p = (
        spark.readStream.schema(pschema)
        .parquet(psrc)
        .withWatermark("purchase_ts", "5 seconds")
    )
    c = (
        spark.readStream.schema(cschema)
        .parquet(csrc)
        .withWatermark("click_ts", "5 seconds")
    )
    joined = stream_stream_full_outer_range_join(p, c, interval="10 minutes")
    name = f"ssfull_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssf_ckpt_"))
        .start()
    )
    try:
        # batch 1: u1 purchase WITH matching click; u2 purchase with no
        # click; u3 click with no purchase (click precedes nothing)
        spark.createDataFrame(
            [(1, "u1", base), (2, "u2", base)], pschema
        ).coalesce(1).write.mode("append").parquet(psrc)
        spark.createDataFrame(
            [(10, "u1", base - timedelta(minutes=1)),
             (11, "u3", base - timedelta(minutes=1))],
            cschema,
        ).coalesce(1).write.mode("append").parquet(csrc)
        q.processAllAvailable()
        got = spark.table(name).collect()
        matched = [r for r in got if r["purchase_id"] == 1]
        assert matched and matched[0]["click_id"] == 10
        assert not any(r["purchase_id"] == 2 for r in got)  # withheld
        assert not any(r["click_id"] == 11 for r in got)  # withheld

        # batch 2+3: far-future rows on BOTH sides advance the global
        # (min) watermark past both closure horizons, then one more
        # advance flushes the outer nulls
        far = base + timedelta(hours=2)
        for d in range(2):
            off = timedelta(minutes=d)
            spark.createDataFrame(
                [(99 + d, "zz", far + off)], pschema
            ).coalesce(1).write.mode("append").parquet(psrc)
            spark.createDataFrame(
                [(89 + d, "zz", far + off)], cschema
            ).coalesce(1).write.mode("append").parquet(csrc)
            q.processAllAvailable()
        got = spark.table(name).collect()
        pnull = [r for r in got if r["purchase_id"] == 2]
        cnull = [r for r in got if r["click_id"] == 11]
        assert len(pnull) == 1 and pnull[0]["click_id"] is None
        assert pnull[0]["user_id"] == "u2"
        assert len(cnull) == 1 and cnull[0]["purchase_id"] is None
        assert cnull[0]["user_id"] == "u3"  # coalesced key survives
        assert sum(1 for r in got if r["purchase_id"] == 1) == 1
    finally:
        q.stop()
