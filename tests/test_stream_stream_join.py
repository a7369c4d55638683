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
