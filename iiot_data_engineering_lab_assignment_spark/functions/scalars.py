"""Scalar-function surface (SURVEY.md section 2.7, F1-F8).

All pure Column expressions — they compose into whole-stage codegen; no
Python executes per row anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_event_time", "iso8601", "date_parts", "json_field", "sensor_to_json"]


def parse_event_time(ts: Column | str) -> Column:
    """F1+F2: ISO-8601 string -> timestamp.

    The reference needs `TO_TIMESTAMP(REPLACE(timestamp,'T',' '))`
    (sensor_aggregation.py:22) because Flink's TO_TIMESTAMP won't eat the
    'T'; Spark's ``to_timestamp`` parses ISO-8601 natively, so the REPLACE
    collapses away.  Kept as one named function so the computed-column
    semantics (P2) have a single definition.
    """
    return F.to_timestamp(ts)


def iso8601(ts: Column | str) -> Column:
    """F6: timestamp -> ISO-8601 'T' string with microseconds, matching the
    producer's datetime.isoformat() (ingest_data.py:66)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def date_parts(ts: Column | str) -> list[Column]:
    """F3/P3: the partition-key derivation used by the reference ETL
    (timescale_to_deltalake.py:36) — year/month/day int columns."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return [
        F.year(c).alias("year"),
        F.month(c).alias("month"),
        F.dayofmonth(c).alias("day"),
    ]


def json_field(col: Column | str, field: str) -> Column:
    """JSON pointer extraction (`get_json_object`) for the events.props
    payload — the engine's generic JSON accessor."""
    return F.get_json_object(col, f"$.{field}")


def sensor_to_json(*cols: str) -> Column:
    """F7: row -> JSON string (producer wire encoding, ingest_data.py:73)."""
    return F.to_json(F.struct(*cols))
