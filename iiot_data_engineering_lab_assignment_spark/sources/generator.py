"""Deterministic IIoT data generator (S4).

Reference: ingestion/ingest_data.py — 4 machines x 4 sensor types, Gaussian
values per sensor type, 7-day hourly backfill (2,688 rows) then a live tick
of 16 readings every 5 s, keyed by machine_id.

Spark-first re-expression: the backfill is ``spark.range`` cross-joined with
the two tiny dimension frames and seeded ``randn`` column expressions — a
fully distributed, reproducible batch; the live path maps Spark's ``rate``
streaming source through the same value expressions.  No driver-side loops,
no Python-row generation: at 1000x the machine count this is still one
narrow pipeline per partition.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MACHINES, SENSOR_TYPES

__all__ = [
    "MACHINE_ROWS",
    "SENSOR_ROWS",
    "machines_df",
    "sensor_types_df",
    "generate_backfill",
    "generate_rate_stream",
]

#: ingestion/ingest_data.py:19-24 — machine dimension (type/location are
#: generated but never serialized by the reference producer; we carry them
#: so the join surface has a real dim table).
MACHINE_ROWS = [
    ("CNC-001", "CNC Mill", "Assembly Line A"),
    ("LATHE-002", "Lathe", "Tooling Bay 2"),
    ("PRESS-003", "Hydraulic Press", "Stamping Area"),
    ("WELD-004", "Robotic Welder", "Line B"),
]

#: ingestion/ingest_data.py:26-31 — Gaussian parameters per sensor type.
SENSOR_ROWS = [
    ("temperature", 85.0, 5.0),
    ("vibration", 1.5, 0.5),
    ("pressure", 150.0, 10.0),
    ("power_draw", 1200.0, 50.0),
]

BACKFILL_DAYS = 7
BACKFILL_STEP_SECONDS = 3600  # hourly ticks (ingest_data.py:97)
LIVE_INTERVAL_SECONDS = 5  # ingest_data.py:13


def machines_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MACHINE_ROWS, MACHINES)


def sensor_types_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SENSOR_ROWS, SENSOR_TYPES)


def _with_value(df: DataFrame, seed: int) -> DataFrame:
    """Gaussian value per row: randn(seed)*std + mean, rounded to 2 decimals
    (ingest_data.py:64,69) — JVM-side, deterministic for a fixed seed and
    partitioning."""
    return df.withColumn(
        "value", F.round(F.randn(seed) * F.col("std") + F.col("mean"), 2)
    ).drop("mean", "std")


def generate_backfill(
    spark: SparkSession,
    end: datetime | None = None,
    days: int = BACKFILL_DAYS,
    step_seconds: int = BACKFILL_STEP_SECONDS,
    seed: int = 42,
) -> DataFrame:
    """Batch backfill: `days` of history at `step_seconds` ticks, one reading
    per (tick, machine, sensor) — 2,688 rows at reference defaults.

    Columns match the wire schema semantics with a typed event_time:
    (event_time timestamp, machine_id, sensor_type, value double).
    The tick axis is ``spark.range`` (distributed); the 16-row dimension
    cross joins are broadcast by Catalyst automatically.
    """
    if end is None:
        end = datetime(2024, 1, 8, tzinfo=timezone.utc)
    n_ticks = int(days * 86400 // step_seconds)
    end_expr = F.lit(end.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    # fixed partition count => fixed per-partition RNG streams => the
    # backfill is bit-identical on any cluster size
    ticks = spark.range(0, n_ticks, 1, 8).select(
        (end_expr - F.make_interval(secs=(F.lit(n_ticks) - F.col("id")) * step_seconds)).alias(
            "event_time"
        )
    )
    base = ticks.crossJoin(F.broadcast(machines_df(spark).select("machine_id"))).crossJoin(
        F.broadcast(sensor_types_df(spark))
    )
    return _with_value(base, seed).select("event_time", "machine_id", "sensor_type", "value")


def generate_rate_stream(
    spark: SparkSession,
    interval_seconds: int = LIVE_INTERVAL_SECONDS,
    seed: int = 42,
) -> DataFrame:
    """Live mode: Structured Streaming `rate` source at one tick per
    `interval_seconds`, fanned out to 16 readings per tick through the same
    broadcast dims — the streaming continuation of the backfill
    (ingest_data.py:126-146)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .withColumn(
            "event_time",
            # Bucket to the interval grid: floor(epoch / interval) * interval keeps
            # the value in epoch seconds (plain division would shrink the epoch
            # itself — e.g. /5 lands every event_time in ~1981).
            (
                F.floor(F.unix_timestamp("timestamp") / interval_seconds) * interval_seconds
            ).cast("timestamp"),
        )
        .select("event_time")
    )
    base = rate.crossJoin(F.broadcast(machines_df(spark).select("machine_id"))).crossJoin(
        F.broadcast(sensor_types_df(spark))
    )
    return _with_value(base, seed).select("event_time", "machine_id", "sensor_type", "value")


def to_wire_json(readings: DataFrame) -> DataFrame:
    """Serialize readings to the reference wire format: key = machine_id,
    value = JSON object with ISO-8601 'T' timestamp (ingest_data.py:63-79).
    Feed this to a Kafka sink (`.write.format("kafka")`) in production."""
    return readings.select(
        F.col("machine_id").alias("key"),
        F.to_json(
            F.struct(
                F.date_format("event_time", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
                "machine_id",
                "sensor_type",
                "value",
            )
        ).alias("value"),
    )
