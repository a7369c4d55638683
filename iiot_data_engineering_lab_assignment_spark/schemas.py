"""Every fixed schema in the system, as Spark StructTypes.

The reference declares its schemas three times over (Flink DDL at
flink-jobs/sensor_aggregation.py:16-70, Postgres DDL at
"infrastructure setup/init-db.sql":6-33, and implicitly via JDBC in
spark-jobs/timescale_to_deltalake.py:29-31).  Here they live once.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# IIoT wire / table schemas (reference parity)
# ---------------------------------------------------------------------------

#: One sensor reading as produced onto the wire (ingestion/ingest_data.py:63-70).
#: `timestamp` stays a string at the wire layer - the reference deliberately
#: ingests it untyped and derives event_time (sensor_aggregation.py:21-22).
SENSOR_EVENT_WIRE = StructType(
    [
        StructField("timestamp", StringType(), True),
        StructField("machine_id", StringType(), True),
        StructField("sensor_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)

#: Raw landed table (init-db.sql:6-13).  machine_type/location are declared
#: but never populated by the producer (ingest_data.py:65-70) - kept for parity.
MACHINE_SENSORS = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("machine_id", StringType(), False),
        StructField("machine_type", StringType(), True),
        StructField("sensor_type", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("location", StringType(), True),
    ]
)

#: 1-minute rollup table (init-db.sql:24-33, sensor_aggregation.py:38-46).
#: count_readings is LongType - the reference's Flink job emits BIGINT and
#: lets JDBC narrow to the DB's INTEGER; we keep the wide type.
SENSOR_AGGREGATES = StructType(
    [
        StructField("window_start", TimestampType(), False),
        StructField("window_end", TimestampType(), False),
        StructField("machine_id", StringType(), False),
        StructField("sensor_type", StringType(), False),
        StructField("avg_value", DoubleType(), True),
        StructField("min_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        StructField("count_readings", LongType(), True),
    ]
)

#: Machine metadata (ingest_data.py:19-24) - the implicit dimension table the
#: reference never joins; exposed here so the join surface has the IIoT dim.
MACHINES = StructType(
    [
        StructField("machine_id", StringType(), False),
        StructField("machine_type", StringType(), True),
        StructField("location", StringType(), True),
    ]
)

#: Sensor distribution parameters (ingest_data.py:26-31).
SENSOR_TYPES = StructType(
    [
        StructField("sensor_type", StringType(), False),
        StructField("mean", DoubleType(), False),
        StructField("std", DoubleType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Fixture tables (/root/testdata/sf*/ - FIXTURES.md section A)
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

#: `ts` is TIMESTAMP(NANOS) on disk; sources.readers converts to µs
#: TimestampType at scan time, so in-engine the column is a plain timestamp.
EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
