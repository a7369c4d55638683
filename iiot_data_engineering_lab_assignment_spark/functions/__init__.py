from .scalars import (
    parse_event_time,
    iso8601,
    date_parts,
    json_field,
    sensor_to_json,
)

__all__ = [
    "parse_event_time",
    "iso8601",
    "date_parts",
    "json_field",
    "sensor_to_json",
]
