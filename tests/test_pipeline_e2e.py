"""The reference pipeline end-to-end (PDF Tasks 1-5 equivalent):

  generator (backfill)                        [Task 1-2: ingestion]
    -> wire JSON serialize -> lenient decode  [Task 2: Kafka wire format]
    -> event_time parse + watermarkable shape [Task 3: stream processing]
    -> TWO sinks: raw lake + 1-min rollup     [Task 3/4: dual sinks, lake]
    -> date-partitioned storage + retention   [Task 4: Delta-style lake]
    -> orchestrated flow with verification    [Task 5: nightly flow]

One test, the whole dataflow, on-disk artifacts inspected at each hop.
"""

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.functions.scalars import parse_event_time
from iiot_data_engineering_lab_assignment_spark.operators.windows import tumbling_rollup
from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
    apply_retention,
    read_lake,
    write_partitioned_by_date,
)
from iiot_data_engineering_lab_assignment_spark.plans.orchestrator import NightlyFlow
from iiot_data_engineering_lab_assignment_spark.sources.generator import (
    generate_backfill,
    to_wire_json,
)
from iiot_data_engineering_lab_assignment_spark.sources.readers import decode_sensor_json


def test_full_reference_pipeline(spark, tmp_path):
    raw_path = str(tmp_path / "machine_sensors")
    agg_path = str(tmp_path / "sensor_aggregates")

    # --- Task 1/2: deterministic ingestion + wire format -------------------
    readings = generate_backfill(spark, seed=42)  # 2,688 rows, 7d hourly
    wire = to_wire_json(readings)  # key=machine_id, ISO-8601 'T' JSON

    # --- Task 2/3: lenient decode + event-time parse -----------------------
    decoded = decode_sensor_json(wire, "value")
    events = decoded.withColumn("event_time", parse_event_time("timestamp")).drop(
        "timestamp"
    )
    assert events.count() == 2688  # nothing lost on the wire roundtrip

    # --- Task 3/4: dual sinks — raw passthrough + 1-min rollup, both
    # date-partitioned (the Flink statement-set + Spark ETL combined) -------
    write_partitioned_by_date(events, raw_path, "event_time")
    rollup = tumbling_rollup(
        events, "event_time", "1 minute", ["machine_id", "sensor_type"]
    )
    write_partitioned_by_date(rollup, agg_path, "window_start")

    raw_back = read_lake(spark, raw_path)
    agg_back = read_lake(spark, agg_path)
    assert raw_back.count() == 2688
    # hourly ticks -> every reading is its own 1-min window per (machine, sensor)
    assert agg_back.count() == 2688
    assert agg_back.filter(F.col("count_readings") != 1).count() == 0
    # batch/streaming-parity invariant on the rollup
    assert (
        agg_back.agg(F.sum("count_readings")).head()[0] == raw_back.count()
    )
    # the rollup columns are exactly the reference's sink table
    assert set(agg_back.columns) >= {
        "window_start", "window_end", "machine_id", "sensor_type",
        "avg_value", "min_value", "max_value", "count_readings",
    }

    # --- Task 4: retention (keep 3 of the 7 backfill days) -----------------
    dropped = apply_retention(spark, raw_path, "event_time", keep_days=3, now="2024-01-08")
    assert dropped > 0
    assert read_lake(spark, raw_path).count() < 2688

    # --- Task 5: orchestrated nightly flow with count verification ---------
    flow = NightlyFlow(max_retries=2, retry_delay_s=0.01)
    ok = flow.run_etl_flow(
        check_source=lambda: f"generator ok: {readings.count()} readings",
        check_lake=lambda: f"lake ok: {read_lake(spark, agg_path).count()} agg rows",
        run_job=lambda: "noop (already materialized)",
        verify=lambda: (
            "counts match"
            if read_lake(spark, agg_path).agg(F.sum("count_readings")).head()[0] == 2688
            else (_ for _ in ()).throw(AssertionError("count mismatch"))
        ),
    )
    assert ok
    assert all(r.ok for r in flow.results)
