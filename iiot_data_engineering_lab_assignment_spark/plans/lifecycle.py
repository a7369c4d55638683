"""Storage lifecycle (SURVEY.md section 2.10).

D1 — time-partitioned tables: the TimescaleDB hypertable
(init-db.sql:16,36) maps to date-partitioned columnar layout, exactly the
reference ETL's own Delta output shape (timescale_to_deltalake.py:33-37):
derive year/month/day (P3) and partitionBy them (K5).

D2 — secondary indexes ((machine_id, ts DESC), init-db.sql:19-20) map to
file-level data skipping: within each date partition we sort files by the
index prefix so parquet row-group min/max stats prune like an index scan.

D3 — retention (drop chunks > 90 days, init-db.sql:43-44): partition-level
delete — with date partitioning this removes whole directories without
rewriting surviving data.

D4 — overwrite-per-run refresh (timescale_to_deltalake.py:37): dynamic
partition overwrite replaces only the partitions present in the incoming
batch — at 100 TB you never blow away the whole table to refresh a day.

Format: Delta when the package is importable (production), plain
partitioned Parquet otherwise (this runtime) — same API, same layout.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "lake_format",
    "write_partitioned",
    "write_partitioned_by_date",
    "read_lake",
    "apply_retention",
    "compact",
]


def lake_format() -> str:
    try:
        import delta  # noqa: F401

        return "delta"
    except ImportError:
        return "parquet"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_within_partitions: list[str] | None = None,
) -> None:
    """K5/D1: partitioned columnar write.

    ``sort_within_partitions`` is the D2 index analogue: sorting rows
    within each task by the lookup-key prefix gives parquet row groups
    tight min/max bounds, so point/range lookups skip most of the file —
    the engine's replacement for (machine_id, timestamp DESC) B-trees.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*partition_cols, *sort_within_partitions)
    df.write.format(lake_format()).mode(mode).partitionBy(*partition_cols).save(path)


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    dynamic: bool = False,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """The reference ETL's exact transform chain
    (timescale_to_deltalake.py:33-45): derive year/month/day from `ts_col`,
    partition by them.  ``dynamic=True`` -> D4 partition-scoped refresh
    (only incoming partitions replaced)."""
    spark = df.sparkSession
    out = df.withColumns(
        {
            "year": F.year(ts_col),
            "month": F.month(ts_col),
            "day": F.dayofmonth(ts_col),
        }
    )
    if dynamic:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            write_partitioned(out, path, ["year", "month", "day"], mode, sort_within_partitions)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        write_partitioned(out, path, ["year", "month", "day"], mode, sort_within_partitions)


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(lake_format()).load(path)


def apply_retention(
    spark: SparkSession, path: str, ts_col: str, keep_days: int, now=None
) -> int:
    """D3: retention policy — drop data older than `keep_days` (the
    reference's drop_chunks, init-db.sql:43-44).

    With Delta: ``DELETE WHERE`` + VACUUM (transactional).  On plain
    parquet, prune whole expired (year,month,day) partition directories —
    the same chunk-drop semantics as the hypertable: no data rewrite,
    directory-level removal.  Returns the number of partitions dropped.
    """
    anchor = "current_date()" if now is None else f"DATE'{now}'"
    cutoff = spark.sql(f"SELECT date_sub({anchor}, {keep_days}) AS d").head()["d"]
    if lake_format() == "delta":
        spark.sql(f"DELETE FROM delta.`{path}` WHERE {ts_col} < DATE'{cutoff}'")
        return 0
    base = Path(path)
    dropped = 0
    for ydir in sorted(base.glob("year=*")):
        y = int(ydir.name.split("=")[1])
        for mdir in sorted(ydir.glob("month=*")):
            m = int(mdir.name.split("=")[1])
            for ddir in sorted(mdir.glob("day=*")):
                d = int(ddir.name.split("=")[1])
                from datetime import date

                if date(y, m, d) < date(cutoff.year, cutoff.month, cutoff.day):
                    shutil.rmtree(ddir)
                    dropped += 1
    return dropped


def compact(spark: SparkSession, path: str, target_files_per_partition: int = 1) -> None:
    """OPTIMIZE-style compaction: rewrite each date partition into
    `target_files_per_partition` files (small-file mitigation for
    streaming-appended partitions)."""
    df = read_lake(spark, path)
    part_cols = [c for c in ("year", "month", "day") if c in df.columns]
    (
        df.repartition(target_files_per_partition, *[F.col(c) for c in part_cols])
        .write.format(lake_format())
        .mode("overwrite")
        .partitionBy(*part_cols)
        .save(path + "_compacted")
    )
    shutil.rmtree(path)
    Path(path + "_compacted").rename(path)
