from .generator import (
    generate_backfill,
    generate_rate_stream,
    machines_df,
    sensor_types_df,
    to_wire_json,
)
from .readers import (
    decode_sensor_json,
    kafka_stream_reader,
    load_table,
    load_tables,
    read_jdbc_partitioned,
    read_json_lenient,
    register_views,
)
from .sinks import jdbc_append, jdbc_batch_writer, kafka_batch_writer, kafka_stream_writer

__all__ = [
    "generate_backfill",
    "generate_rate_stream",
    "machines_df",
    "sensor_types_df",
    "to_wire_json",
    "decode_sensor_json",
    "kafka_stream_reader",
    "load_table",
    "load_tables",
    "read_jdbc_partitioned",
    "read_json_lenient",
    "register_views",
    "jdbc_append",
    "jdbc_batch_writer",
    "kafka_batch_writer",
    "kafka_stream_writer",
]
