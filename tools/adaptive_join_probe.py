"""Profile-driven salted join A/B probe (r14): plain vs all-salted vs
profile-adaptive (operators/joins.py:profile_salted_join) over 20M-row
synthetic fact tables — one with a planted 30%-share hot key, one
uniform — joined to a 100k-row dim and aggregated.

What the numbers should show:
* uniform data: the adaptive join matches the plain join (no salt tax —
  the all-salted form pays dim replication + a wider shuffle for
  nothing) with only the profiler's map-side-combinable count on top.
* skewed data: the adaptive join isolates the hot key into the salted
  path; relative wins vs plain depend on AQE's skew-join split (on in
  session.py), which can already split a skewed SMJ partition — the
  operator's value at cluster scale is that the decision happens BEFORE
  the skewed map output materializes, and that only hot keys pay the
  replication.

Usage: python tools/adaptive_join_probe.py [n_rows]
Prints one JSON line per (distribution x strategy).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.joins import (  # noqa: E402
    profile_salted_join,
    salted_join,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

N_KEYS = 8_000_000


def facts(spark, n: int, skewed: bool):
    base = spark.range(0, n, 1, 32)
    if skewed:
        # 30% of rows on key 1, the rest uniform over N_KEYS
        k = F.when(F.col("id") % 10 < 3, F.lit(1)).otherwise(
            (F.col("id") * 2654435761) % N_KEYS
        )
    else:
        k = (F.col("id") * 2654435761) % N_KEYS
    return base.select(k.cast("long").alias("k"), (F.col("id") % 1000).alias("v"))


def dim(spark):
    # 8M rows x ~3 columns: well past the broadcast threshold, so the
    # join is a genuine shuffle (SMJ/shuffled-hash) — the regime where
    # salting exists.  A broadcast-able dim needs no salt at all (first
    # probe iteration measured exactly that: plain-broadcast won every
    # case, 0.5-0.6 s, and salting only added cost).
    return spark.range(N_KEYS).select(
        F.col("id").alias("rk"),
        (F.col("id") % 17).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(
        "adaptive-join-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _mat(df):
        df.write.format("noop").mode("overwrite").save()

    for dist in ("skewed", "uniform"):
        left = facts(spark, n, dist == "skewed").persist()
        left.count()
        right = dim(spark).persist()
        right.count()

        def agg(joined):
            return joined.groupBy("grp").agg(
                F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv")
            )

        strategies = {
            "plain": lambda: left.join(right, left["k"] == right["rk"]),
            "all_salted": lambda: salted_join(left, right, "k", "rk", salt_buckets=8),
            "profile_adaptive": lambda: profile_salted_join(
                left, right, "k", "rk", parallelism=32, salt_buckets=8
            ),
        }
        for name, build in strategies.items():
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _mat(agg(build()))
                best = min(best, time.time() - t0)
            print(
                json.dumps(
                    {
                        "dist": dist,
                        "strategy": name,
                        "n_rows": n,
                        "best_sec": round(best, 2),
                    }
                ),
                flush=True,
            )
        left.unpersist()
        right.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
