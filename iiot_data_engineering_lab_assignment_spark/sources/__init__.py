from .readers import load_table, load_tables, read_json_lenient, register_views
from .generator import machines_df, sensor_types_df, generate_backfill, generate_rate_stream

__all__ = [
    "load_table",
    "load_tables",
    "read_json_lenient",
    "register_views",
    "machines_df",
    "sensor_types_df",
    "generate_backfill",
    "generate_rate_stream",
]
