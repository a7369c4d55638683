"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``iiot_data_engineering_lab_assignment_spark.registry`` — one entry per
operator from SURVEY.md section 2 (plus the training-data-pipeline
extensions); this module is the thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iiot_data_engineering_lab_assignment_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    computation (1-minute tumbling window x (user, type) ->
    AVG/MIN/MAX/COUNT — flink-jobs/sensor_aggregation.py:83-98) as a batch
    rollup over the events fixture."""
    return registry.QUERIES["sensor_rollup_1m"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: spec.fn for name, spec in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    (engine-internal hashing / approximate / generated-data operators) get
    the driver's rows-only check."""
    return {
        name: spec.oracle
        for name, spec in registry.QUERIES.items()
        if spec.oracle is not None
    }
