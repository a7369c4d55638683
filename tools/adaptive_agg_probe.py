"""Profile-driven salted AGGREGATION A/B probe (r15, the aggregation
dual of adaptive_join_probe): plain one-stage groupBy vs the
profile-adaptive two-stage salted rollup
(operators/aggregates.py:profile_salted_rollup) over synthetic facts —
a planted 30%-share hot key vs uniform — for two workload classes:

* the A1 ROLLUP (AVG/MIN/MAX/COUNT — algebraic): Spark plans map-side
  partial aggregation, so a hot key pre-combines to one partial row per
  map task and the reducer sees ~n_map_tasks rows regardless of skew.
  The honest expectation is plain ~= adaptive: the profile's value here
  is deciding NOT to salt (its cost is one map-side-combinable count).
* a COLLECT_SET with high-cardinality payload (holistic-ish: partial
  states are value-sized sets, so the hot key's merge is real work).
  Here the salted two-stage splits the partial-merge fan-in.

Usage: python tools/adaptive_agg_probe.py [n_rows]   (default 40M)
Prints one JSON line per (distribution x workload x strategy).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.aggregates import (  # noqa: E402
    profile_salted_rollup,
    sensor_rollup,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

N_KEYS = 8_000_000


def facts(spark, n: int, skewed: bool):
    base = spark.range(0, n, 1, 32)
    if skewed:
        k = F.when(F.col("id") % 10 < 3, F.lit(1)).otherwise(
            (F.col("id") * 2654435761) % N_KEYS
        )
    else:
        k = (F.col("id") * 2654435761) % N_KEYS
    return base.select(
        k.cast("long").alias("k"),
        ((F.col("id") % 1000) / 10.0).alias("value"),
        (F.col("id") % 200_000).alias("payload"),
    )


def salted_collect_set(df, salt_buckets: int = 8):
    """Hand-built two-stage salted collect_set: per-(key, salt) partial
    sets, flattened + re-distinct'd per key — the holistic analogue of
    profile_salted_rollup's decimal partials."""
    salted = df.withColumn("_salt", (F.rand(42) * salt_buckets).cast("int"))
    partial = salted.groupBy("k", "_salt").agg(
        F.collect_set("payload").alias("ps")
    )
    return partial.groupBy("k").agg(
        F.size(F.array_distinct(F.flatten(F.collect_list("ps")))).alias("n_distinct")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    spark = get_spark(
        "adaptive-agg-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _mat(df):
        df.write.format("noop").mode("overwrite").save()

    out = []
    for dist in ("skewed", "uniform"):
        df = facts(spark, n, dist == "skewed").persist()
        df.count()

        workloads = {
            "rollup_plain": lambda: sensor_rollup(df, "k"),
            "rollup_adaptive": lambda: profile_salted_rollup(
                df, "k", parallelism=32
            ),
            "collect_set_plain": lambda: df.groupBy("k").agg(
                F.size(F.collect_set("payload")).alias("n_distinct")
            ),
            "collect_set_salted": lambda: salted_collect_set(df),
        }
        for name, build in workloads.items():
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _mat(build())
                best = min(best, time.time() - t0)
            rec = {
                "dist": dist,
                "workload": name,
                "best_s": round(best, 2),
                "n_rows": n,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
