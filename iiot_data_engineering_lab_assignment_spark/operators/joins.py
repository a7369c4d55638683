"""Join operators (SURVEY.md section 2.6).

The reference implements NO joins — its star schema stays implicit
(machine metadata at ingestion/ingest_data.py:19-24 is never emitted, so
never joined).  For capability parity the engine exposes Spark's full join
surface with explicit strategy control, because at 100 TB the difference
between a broadcast and a shuffle join IS the query plan:

* dimension tables (region/nation/supplier/machines) -> ``broadcast()``
  hint: no shuffle of the fact side at all.
* fact-fact joins (orders x lineitem) -> sort-merge on the shuffle key;
  AQE converts to broadcast at runtime when a side turns out small and
  splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["join_dim", "join_fact", "semi_join", "anti_join"]


def join_dim(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension join; the dimension side is broadcast so the fact
    table never shuffles (map-side hash join on every executor)."""
    return fact.join(F.broadcast(dim), on, how)


def join_fact(
    left: DataFrame, right: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact-to-fact join: shuffle on the join key (sort-merge / shuffled
    hash chosen by Catalyst, AQE-adjusted at runtime).  Callers co-locating
    multiple joins on the same key should pre-``repartition`` once and reuse
    the exchange."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS-style filtering join: keeps left rows with a match, emits only
    left columns, never duplicates (unlike inner join + distinct — and
    cheaper: the right side reduces to its join key)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS-style filtering join: keeps left rows WITHOUT a match."""
    return left.join(right, on, "left_anti")
