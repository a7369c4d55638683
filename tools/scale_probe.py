"""Scale probe: validate the engine's throughput posture beyond the sf0.1
fixtures by generating a large synthetic events table (default 20M rows,
~200x sf0.1) and timing the flagship operator families on it.

Usage: python tools/scale_probe.py [n_rows]

Prints one JSON line: rows/sec per probe. This is the local evidence for
the SCALE.md claims — the same plans at 100 TB differ only in partition
count, not shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.windows import tumbling_rollup  # noqa: E402
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("scale-probe")
    base = tempfile.mkdtemp(prefix="scale_probe_")
    path = f"{base}/events_big"

    # deterministic synthetic events: 30 days, 2000 users, 5 types
    t0 = time.time()
    df = (
        spark.range(0, n, 1, 64)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 2_592_000) + F.rand(1) )
            ).alias("ts"),
            (F.xxhash64("id") % 2000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ["click", "error", "purchase", "signup", "view"]]),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            F.round(F.rand(2) * 100, 2).alias("value"),
        )
    )
    df.write.mode("overwrite").parquet(path)
    gen_s = time.time() - t0

    ev = spark.read.parquet(path)
    probes: dict[str, float] = {}

    t0 = time.time()
    tumbling_rollup(ev, "ts", "1 hour", ["user_id", "event_type"]).count()
    probes["windowed_rollup_1h"] = time.time() - t0

    t0 = time.time()
    ev.filter(
        (F.col("user_id") == 77)
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    ).count()
    probes["point_time_filter"] = time.time() - t0

    t0 = time.time()
    dim = spark.createDataFrame(
        [(i, f"seg{i % 7}") for i in range(2000)], "user_id long, segment string"
    )
    ev.join(F.broadcast(dim), "user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
    ).count()
    probes["broadcast_join_agg"] = time.time() - t0

    t0 = time.time()
    from pyspark.sql import Window

    spec = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.select(
        "event_id", (F.col("value") - F.lag("value").over(spec)).alias("delta")
    ).filter(F.col("delta") > 99).count()
    probes["analytic_lag"] = time.time() - t0

    out = {
        "metric": "scale_probe_rows_per_sec",
        "n_rows": n,
        "gen_sec": round(gen_s, 1),
        "probes": {
            k: {"sec": round(v, 2), "rows_per_sec": int(n / v)} for k, v in probes.items()
        },
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
