"""Skew-join probe: measure a join where one key owns 20% of the fact
table, three ways — plain sort-merge with AQE OFF (the straggler
baseline), salted_join with AQE OFF (manual mitigation), and plain with
AQE ON (Spark's runtime skew-split).

Usage: python tools/skew_probe.py [n_rows]
Prints one JSON line; the numbers back SCALE.md's skew claims.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.joins import salted_join  # noqa: E402
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = 100_000
    spark = get_spark("skew-probe")

    # fact: 20% of rows on key 0, the rest uniform over n_keys
    fact = spark.range(0, n, 1, 64).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(0, n_keys).select(
        F.col("id").alias("dk"), F.sha1(F.col("id").cast("string")).alias("payload")
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    fact = spark.read.parquet("/tmp/skew_fact")
    dim = spark.read.parquet("/tmp/skew_dim")

    def run(label: str, aqe: bool, salted: bool) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t0 = time.time()
        if salted:
            j = salted_join(fact, dim, "k", "dk", salt_buckets=32)
        else:
            j = fact.join(dim, fact.k == dim.dk)
        j.groupBy().agg(F.count(F.lit(1))).collect()
        return round(time.time() - t0, 2)

    saved = {
        key: spark.conf.get(key, None)
        for key in ("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    }
    try:
        out = {
            "metric": "skew_join_probe",
            "n_rows": n,
            "hot_key_share": 0.2,
            "seconds": {
                "sortmerge_no_aqe": run("plain", aqe=False, salted=False),
                "salted_no_aqe": run("salted", aqe=False, salted=True),
                "plain_aqe_skew_split": run("aqe", aqe=True, salted=False),
            },
        }
    finally:
        # restore the ORIGINAL values even if a probe fails — a dangling
        # AQE-off / broadcast-off session would poison later work
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
