"""Deterministic IIoT generator (S4) — reference parity for
ingestion/ingest_data.py semantics."""

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.sources.generator import (
    MACHINE_ROWS,
    SENSOR_ROWS,
    generate_backfill,
    machines_df,
    sensor_types_df,
    to_wire_json,
)
from iiot_data_engineering_lab_assignment_spark.sources.readers import decode_sensor_json


def test_backfill_volume(spark):
    """2,688 rows = 7 d x 24 h x 4 machines x 4 sensors
    (ingest_data.py:14,97,102-111)."""
    bf = generate_backfill(spark)
    assert bf.count() == 7 * 24 * 16
    assert bf.select("machine_id").distinct().count() == 4
    assert bf.select("sensor_type").distinct().count() == 4


def test_backfill_deterministic(spark):
    a = {tuple(r) for r in generate_backfill(spark, seed=42).collect()}
    b = {tuple(r) for r in generate_backfill(spark, seed=42).collect()}
    assert a == b
    c = {tuple(r) for r in generate_backfill(spark, seed=43).collect()}
    assert a != c


def test_value_distribution(spark):
    """Values follow the per-sensor Gaussian parameters
    (ingest_data.py:26-31): mean within 5 sigma/sqrt(n), std in range."""
    bf = generate_backfill(spark)
    stats = {
        r["sensor_type"]: (r["mu"], r["sd"])
        for r in bf.groupBy("sensor_type")
        .agg(F.avg("value").alias("mu"), F.stddev("value").alias("sd"))
        .collect()
    }
    n = 7 * 24 * 4
    for sensor, mean, std in SENSOR_ROWS:
        mu, sd = stats[sensor]
        assert abs(mu - mean) < 5 * std / (n**0.5), sensor
        assert 0.8 * std < sd < 1.2 * std, sensor


def test_values_rounded_2dp(spark):
    bf = generate_backfill(spark)
    bad = bf.filter(F.round("value", 2) != F.col("value")).count()
    assert bad == 0


def test_wire_roundtrip(spark):
    """F6/F7/F8 + S2: serialize to the reference wire format (key=machine_id,
    ISO-8601 'T' timestamp JSON) and decode back leniently."""
    bf = generate_backfill(spark).limit(100)
    wire = to_wire_json(bf)
    assert wire.columns == ["key", "value"]
    sample = wire.head()
    assert "T" in sample["value"]  # ISO-8601 with 'T' (ingest_data.py:66)
    decoded = decode_sensor_json(wire, "value")
    assert decoded.count() == 100
    assert set(decoded.columns) == {"timestamp", "machine_id", "sensor_type", "value"}
    # corrupt rows are dropped, missing fields become NULL (S2)
    corrupt = spark.createDataFrame(
        [("{not json",), ('{"machine_id": "CNC-001"}',), ('{"machine_id":"X","value":1.5,"sensor_type":"t","timestamp":"2024-01-01T00:00:00"}',)],
        "value string",
    )
    out = decode_sensor_json(corrupt).collect()
    assert len(out) == 2  # parse error dropped
    partial = [r for r in out if r["machine_id"] == "CNC-001"][0]
    assert partial["value"] is None  # missing field -> NULL


def test_dimension_tables(spark):
    assert machines_df(spark).count() == len(MACHINE_ROWS)
    assert sensor_types_df(spark).count() == len(SENSOR_ROWS)


def test_dlq_decode_splits_streams(spark):
    """The DLQ decode preserves corrupt payloads instead of dropping them."""
    from iiot_data_engineering_lab_assignment_spark.sources.readers import decode_sensor_json_with_dlq

    raw = spark.createDataFrame(
        [
            ("{broken",),
            ('{"machine_id":"CNC-001","sensor_type":"temperature","value":87.45,"timestamp":"2024-01-01T10:00:00"}',),
            ("null",),
            ('{"machine_id":"X"}',),
        ],
        "value string",
    )
    good, dead = decode_sensor_json_with_dlq(raw)
    assert good.count() == 2  # valid + partial (missing fields -> NULL)
    assert dead.count() == 2  # "{broken" and "null"
    assert set(dead.columns) == {"raw_payload"}
    payloads = {r["raw_payload"] for r in dead.collect()}
    assert "{broken" in payloads
