"""KMV sketch scale probe (round 11): does the deterministic 8k/n
pre-filter keep the bottom-k ranking sort sketch-sized when the corpus is
1000x the fixture?

Synthetic: 20M (event_type, user_id) rows over 1M distinct users x 5
types (Zipf-free uniform — the hash is uniform regardless of the key
distribution, which is the point of hashing).  Measures:

  1. the registered query shape's sketch stage (distinct -> count ->
     pre-filter -> bottom-k) wall time,
  2. exact per-type COUNT(DISTINCT) wall time for comparison,
  3. estimate accuracy vs the exact counts (expect ~1/sqrt(256) = 6.3%
     relative std error),
  4. survivor count entering the window sort (the claim: ~2048 per type,
     independent of corpus size).

Run: python tools/kmv_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.aggregates import kmv_hash52
from iiot_data_engineering_lab_assignment_spark.session import get_spark


def main() -> None:
    spark = get_spark("kmv_probe")
    spark.sparkContext.setLogLevel("ERROR")
    K = 256
    two52 = 4503599627370496.0

    n_rows, n_users = 20_000_000, 1_000_000
    ev = (
        spark.range(0, n_rows, 1, 64)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_users)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ["click", "view", "purchase", "signup", "error"]]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    ev.cache().count()

    # ONE action for the whole sketch (the registered query shape): the
    # distinct exchange is built once and ReusedExchange feeds both the
    # count branch and the hash branch.
    t0 = time.time()
    du = ev.select("event_type", "user_id").distinct()
    h = du.select("event_type", kmv_hash52("user_id").alias("hv"))
    n = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    f = h.join(F.broadcast(n), "event_type").filter(
        (F.col("hv").cast("double") / two52) < F.least(F.lit(1.0), F.lit(8.0 * K) / F.col("n"))
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        f.select("event_type", "hv")
        .withColumn("srn", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
    )
    t = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max("hv").alias("theta"),
        F.max("srn").alias("survivors"),
    )
    rows = t.collect()
    est = {
        r["event_type"]: (
            float(r["n_sk"]) if r["n_sk"] < K else (K - 1) / (r["theta"] / two52)
        )
        for r in rows
    }
    surv = {r["event_type"]: r["survivors"] for r in rows}
    t_sketch = time.time() - t0

    t0 = time.time()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    t_exact = time.time() - t0

    print(f"rows={n_rows:,} users={n_users:,}")
    print(f"sketch stage: {t_sketch:.1f}s   exact countDistinct: {t_exact:.1f}s")
    for k in sorted(est):
        err = (est[k] - exact[k]) / exact[k]
        print(
            f"  {k:10s} exact={exact[k]:>9,} est={est[k]:>12,.1f} "
            f"err={err:+.3%} survivors={surv[k]:,}"
        )


if __name__ == "__main__":
    main()
