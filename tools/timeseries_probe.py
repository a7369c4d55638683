"""Time-series family scale probe (the one operator family without a
dedicated large-n measurement in SCALE.md through round 3): gapfill
LOCF, linear interpolation, time-weighted average, and MAD robust
anomalies over a deterministic synthetic events table.

Usage: python tools/timeseries_probe.py [n_rows]
Prints one JSON line with per-op seconds and rows/s.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("timeseries-probe")
    base = tempfile.mkdtemp(prefix="ts_probe_")
    path = f"{base}/events"

    # 30 days, 2000 users, 5 types - same generator shape as scale_probe
    df = spark.range(0, n, 1, 64).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("id") % 2_592_000) + F.rand(1))
        ).alias("ts"),
        (F.xxhash64("id") % 2000).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["click", "error", "purchase", "signup", "view"]]),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(F.rand(2) * 100, 2).alias("value"),
    )
    df.write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)
    probes: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        fn()
        probes[name] = round(time.time() - t0, 2)

    # LOCF gapfill: daily spine x 2000 users filled from daily avgs
    def locf():
        bounds = ev.agg(
            F.min(F.date_trunc("day", "ts")).cast("date").alias("lo"),
            F.max(F.date_trunc("day", "ts")).cast("date").alias("hi"),
        )
        users = ev.select("user_id").distinct()
        spine = users.crossJoin(F.broadcast(bounds)).select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
        daily = ev.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        ).agg(F.avg("value").alias("day_avg"))
        w = (
            Window.partitionBy("user_id")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        spine.join(daily, ["user_id", "day"], "left").select(
            "user_id", "day", F.last("day_avg", ignorenulls=True).over(w)
        ).write.format("noop").mode("overwrite").save()

    run("gapfill_locf", locf)

    # time-weighted avg: per (user, type) trapezoidal mean over gaps
    def twa():
        w = Window.partitionBy("user_id", "event_type").orderBy("ts")
        seg = ev.select(
            "user_id",
            "event_type",
            "value",
            (F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros("ts")).alias("dt"),
        ).filter(F.col("dt").isNotNull())
        seg.groupBy("user_id", "event_type").agg(
            (F.sum(F.col("value") * F.col("dt")) / F.sum("dt")).alias("twa")
        ).write.format("noop").mode("overwrite").save()

    run("time_weighted_avg", twa)

    # MAD robust anomalies: two grouped medians + broadcast-back filter
    def mad():
        med = ev.groupBy("user_id", "event_type").agg(
            F.percentile("value", F.lit(0.5)).alias("med")
        )
        dev = ev.join(F.broadcast(med), ["user_id", "event_type"])
        m = dev.groupBy("user_id", "event_type").agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
        )
        d = dev.join(F.broadcast(m.filter(F.col("mad") > 0)), ["user_id", "event_type"])
        z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
        d.filter(F.abs(z) > 3.5).select("event_id").write.format("noop").mode(
            "overwrite"
        ).save()

    run("mad_anomalies", mad)

    # same shape with mergeable t-digest medians - the unbounded-group form
    def mad_approx():
        med = ev.groupBy("user_id", "event_type").agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("med")
        )
        dev = ev.join(F.broadcast(med), ["user_id", "event_type"])
        m = dev.groupBy("user_id", "event_type").agg(
            F.approx_percentile(
                F.abs(F.col("value") - F.col("med")), F.lit(0.5), F.lit(10000)
            ).alias("mad")
        )
        d = dev.join(F.broadcast(m.filter(F.col("mad") > 0)), ["user_id", "event_type"])
        z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
        d.filter(F.abs(z) > 3.5).select("event_id").write.format("noop").mode(
            "overwrite"
        ).save()

    run("mad_anomalies_approx", mad_approx)

    out = {"n_rows": n, **probes}
    out["slowest_rows_per_sec"] = int(n / max(probes.values()))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
