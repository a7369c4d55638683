"""Aggregation operators (SURVEY.md section 2.4).

A1 — the reference's four-function rollup AVG/MIN/MAX/COUNT
(flink-jobs/sensor_aggregation.py:90-93); A2 — multi-key grouping (:97);
A3 — the batch re-aggregation of the streaming rollup (PDF Task 4.2,
specified-but-unimplemented in the reference).  Plus the extended
aggregate surface (distinct, approximate, rollup/cube) that Spark gives
for free and the engine exposes as first-class.

Scale notes: every aggregate here is a hash aggregate with map-side
partial aggregation — Spark plans partial_avg/min/max/count before the
shuffle, so the shuffle carries one row per (partition x group), not per
input row.  Group keys of low cardinality (16 sensor groups) make the
shuffle trivially small even at 100 TB of input; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ROLLUP_AGGS", "sensor_rollup", "grouped_stats"]


def ROLLUP_AGGS(value_col: str = "value") -> list[Column]:
    """The reference's aggregate list (sensor_aggregation.py:90-93), named
    exactly as the sink table columns (init-db.sql:29-32).

    avg_value is exact-DECIMAL-sum / count rather than float AVG: float
    summation order varies with partitioning, and for 2-decimal sensor
    values the true mean often terminates exactly ON a rounding boundary
    (sum/32 has 7 decimal digits), so last-bit differences flip any
    rounded comparison.  The decimal route is order-independent and
    bit-identical across engines; for 2-4dp inputs it equals true AVG.
    """
    return [
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("count_readings"),
    ]


def sensor_rollup(df: DataFrame, *group_cols: str, value_col: str = "value") -> DataFrame:
    """A1+A2 without the time window: AVG/MIN/MAX/COUNT grouped by the given
    keys.  The windowed variants live in operators.windows."""
    return df.groupBy(*group_cols).agg(*ROLLUP_AGGS(value_col))


def grouped_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    mode: str = "groupby",
) -> DataFrame:
    """Extended aggregate surface over one value column.

    mode: 'groupby' | 'rollup' | 'cube' — hierarchical/grouping-set
    aggregates (not in the reference; exposed because the engine's query
    surface is the full DataFrame API, SURVEY.md section 2.4 note).

    sum/avg here are FLOAT aggregates: fine for analysis, but their low
    bits depend on partitioning — for cross-engine/exactness-sensitive
    use, decimal-cast inside the aggregate (see registry.dsum/davg;
    float-sum-then-cast leaks the error into decimals once totals reach
    ~1e10).
    """
    aggs = [
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("count_rows"),
    ]
    if mode == "rollup":
        return df.rollup(*group_cols).agg(*aggs)
    if mode == "cube":
        return df.cube(*group_cols).agg(*aggs)
    return df.groupBy(*group_cols).agg(*aggs)
