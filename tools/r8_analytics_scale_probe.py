"""Scale probes for the round-8 analytics wave (trend / CUSUM /
sessionization / attribution / basket / Pareto) — the 'would it hold at
1000x' check at 100-1000x bench scale on local[32]:

* per-user timeline family (CUSUM, gap sessionization, last-touch
  attribution) at 100M events x 1M users — every one is a SINGLE
  hash-partition-by-user shuffle; the probe measures the shared sort
  and verifies no per-row Python and no second exchange.
* linear trend at 100M points x 5 keys — the 5-sufficient-statistic
  reduction: the shuffle moves 25 numbers total.
* basket self-join at 10M orders with bounded basket size (<=12) and
  one planted 5k-item mega-order WITHOUT a cap, to demonstrate the
  documented pathology (pair blow-up is (5k choose 2) ~ 12.5M extra
  pairs — measurable but survivable; the df-cap treatment is the fix
  at higher multiplicity).
* Pareto ABC at 50M lineitems over 2M parts — the global cumulative
  window sorts the 2M-row per-part aggregate, never the 50M-row input.

Usage: SPARK_DRIVER_MEMORY=48g python tools/r8_analytics_scale_probe.py [--small]
Prints one JSON line per probe plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def real_exchanges(df) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # formatted output lists each node in the tree AND in the details
    return plan.count("Exchange") // 2


def synth_events(spark, n_rows: int, n_users: int):
    """Deterministic event stream: user assignment and values from
    hash-mixed ids, timestamps striding 1s with per-user jitter."""
    df = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_704_067_200) + (F.col("id") % 2_592_000)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(7)), 1000) / 10.0).alias("value"),
        F.element_at(
            F.array(*[F.lit(t) for t in ["click", "view", "purchase", "error", "signup"]]),
            (F.pmod(F.xxhash64("id", F.lit(13)), 5) + 1).cast("int"),
        ).alias("event_type"),
    )
    return df


def probe_timeline_family(spark, n_rows: int, n_users: int) -> dict:
    ev = synth_events(spark, n_rows, n_users)
    out = {}

    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("user_id")

    # CUSUM (shipped hybrid: bigint window sums, decimal wide multiply)
    v4 = F.expr("CAST(ROUND(value * 10000) AS BIGINT)")
    base = ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w_ord).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(v4).over(w_all).alias("sn"),
        F.sum(v4).over(w_run).alias("cum"),
    )
    rk = base.select(
        "user_id",
        "event_id",
        "n",
        (
            (F.col("n") * F.col("cum").cast("decimal(28,0)"))
            - (F.col("k") * F.col("sn").cast("decimal(28,0)"))
        ).alias("rk"),
        "k",
    )
    w_min = Window.partitionBy("user_id").orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = (
        rk.select(
            "user_id",
            "n",
            (
                F.col("rk") - F.least(F.min("rk").over(w_min), F.lit(0))
            ).alias("cusum_n"),
        )
        .groupBy("user_id")
        .agg(F.max(F.col("cusum_n").cast("double") / F.col("n")).alias("mx"))
    )
    t0 = time.time()
    noop(cusum)
    out["cusum_wall_s"] = round(time.time() - t0, 1)
    out["cusum_exchanges"] = real_exchanges(cusum)

    # gap sessionization
    us = F.unix_micros(F.col("ts"))
    tl = ev.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.lag(us).over(w_ord).alias("prev_us"),
    )
    flagged = tl.select(
        "user_id", "event_id", "event_type", "us",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > F.lit(1_800_000_000)),
            1,
        ).otherwise(0).alias("new_s"),
    )
    w_run2 = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        flagged.select(
            "user_id", "event_type", "us",
            F.sum("new_s").over(w_run2).alias("session_seq"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("(max(us) - min(us)) DIV 1000000").alias("duration_secs"),
        )
    )
    t0 = time.time()
    noop(sess)
    out["sessionize_wall_s"] = round(time.time() - t0, 1)
    out["sessionize_exchanges"] = real_exchanges(sess)

    # last-touch attribution
    w_carry = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_click = F.col("event_type") == "click"
    attr = (
        ev.select(
            "event_id", "user_id", "ts", "event_type",
            F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
            .over(w_carry)
            .alias("last_click_id"),
            F.last(F.when(is_click, F.unix_micros("ts")), ignorenulls=True)
            .over(w_carry)
            .alias("last_click_us"),
        )
        .filter(F.col("event_type") == "purchase")
    )
    t0 = time.time()
    noop(attr)
    out["attribution_wall_s"] = round(time.time() - t0, 1)
    out["attribution_exchanges"] = real_exchanges(attr)
    return out


def probe_trend(spark, n_rows: int) -> dict:
    ev = synth_events(spark, n_rows, 1_000_000)
    x = F.expr("unix_micros(ts) DIV 1000000") - F.lit(1_704_067_200)
    xd = x.cast("decimal(19,0)")
    y = F.col("value").cast("decimal(14,4)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * y).cast("double").alias("sxy"),
    )
    t0 = time.time()
    rows = s.collect()
    return {
        "trend_wall_s": round(time.time() - t0, 1),
        "trend_keys": len(rows),
        "trend_exchanges": real_exchanges(s),
    }


def probe_basket(spark, n_orders: int, mega_items: int) -> dict:
    """Bounded baskets (4-12 items) + ONE planted mega-order, uncapped."""
    base = spark.range(n_orders).select(
        F.col("id").alias("l_orderkey"),
        (F.pmod(F.xxhash64("id"), 9) + 4).cast("int").alias("sz"),
    )
    items = base.select(
        "l_orderkey",
        F.explode(F.sequence(F.lit(1), F.col("sz"))).alias("slot"),
    ).select(
        "l_orderkey",
        F.pmod(F.xxhash64("l_orderkey", "slot"), 2_000_000).alias("l_partkey"),
    )
    mega = spark.range(mega_items).select(
        F.lit(-1).cast("long").alias("l_orderkey"),
        F.col("id").alias("l_partkey"),
    )
    it = items.unionAll(mega).distinct()
    b = it.select(F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("part_b"))
    pairs = (
        it.join(b, (it.l_orderkey == F.col("bo")) & (it.l_partkey < F.col("part_b")))
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    t0 = time.time()
    n_pairs = pairs.count()
    return {
        "basket_wall_s": round(time.time() - t0, 1),
        "basket_pairs_support2": n_pairs,
        "basket_mega_extra_pairs": mega_items * (mega_items - 1) // 2,
    }


def probe_pareto(spark, n_rows: int, n_parts: int) -> dict:
    """Mirrors the registry's two-pass prefix-sum form (the naive global
    window measured 55.9 s at this shape; two-pass: 20.2 s, identical
    classes, single-task stage ~sqrt(|parts|) rows)."""
    import math

    li = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), n_parts).alias("l_partkey"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 100_000) / 100.0).alias("l_extendedprice"),
    )
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    mx, n = rev.agg(F.max(F.col("r").cast("double")), F.count(F.lit(1))).first()
    span = max(0.01, float(mx or 1.0) / max(1, math.isqrt(int(n or 1))))
    b = rev.withColumn(
        "bucket", F.floor(F.col("r").cast("double") / F.lit(span)).cast("long")
    )
    per_bucket = b.groupBy("bucket").agg(F.sum("r").alias("bucket_r"))
    wb = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bucket_r").over(wb), F.lit(0).cast("decimal(28,2)")).alias(
            "offset"
        ),
    )
    wi = Window.partitionBy("bucket").orderBy(F.desc("r"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = rev.agg(F.sum("r").alias("t"))
    cls = (
        b.join(F.broadcast(offsets), "bucket")
        .select("l_partkey", "r", (F.col("offset") + F.sum("r").over(wi)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("c") * 10 <= F.col("t") * 7, "A")
            .when(F.col("c") * 10 <= F.col("t") * 9, "B")
            .otherwise("C")
            .alias("abc_class"),
            "r",
        )
        .groupBy("abc_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    t0 = time.time()
    rows = {r["abc_class"]: r["n_parts"] for r in cls.collect()}
    return {
        "pareto_wall_s": round(time.time() - t0, 1),
        "pareto_classes": rows,
    }


def main() -> None:
    small = "--small" in sys.argv
    mult = 100 if small else 1
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    res = {"mode": "small" if small else "full"}
    res.update(probe_timeline_family(spark, 100_000_000 // mult, 1_000_000 // mult))
    res.update(probe_trend(spark, 100_000_000 // mult))
    res.update(probe_basket(spark, 10_000_000 // mult, 5_000))
    res.update(probe_pareto(spark, 50_000_000 // mult, 2_000_000 // mult))
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
