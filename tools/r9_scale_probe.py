"""Scale probes for the round-9 rewrites — the 'would it hold at 1000x'
check at 100-1000x bench scale on local[32]:

* basket cap rerun (r8 verdict ask #5 'Done' criterion): the same 10M-order
  shape with the planted 5k-item mega-order, now THROUGH the registered
  100-item cap — the mega-order must contribute zero pairs and the wall
  time must return to the bounded-basket baseline.
* rolling_distinct_users old (collect_set over a ~5-value partition key)
  vs new (interval sweep + two-pass prefix sum) at matched shape, then the
  new form alone at 10x — the old form's wall is dominated by |types|
  single-task sorts with per-row set state; the new form's partitions
  scale with (types x days).
* autocorr_lag1 naive global LAG vs (type, day)-segmented at matched
  shape — identical results, largest sort shrinks from corpus/|types| to
  one (type, day) cell.
* PQ encode throughput at 1M x 64-dim synthetic vectors — one scan with
  m*k = 32 subspace distance folds per row, no shuffle (the codes write
  would be the only output cost at 10^9 vectors).

Usage: SPARK_DRIVER_MEMORY=48g python tools/r9_scale_probe.py [--small]
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


def synth_events(spark, n_rows: int, n_users: int, n_days: int):
    """(event_id, event_type, user_id, t µs) — ~uniform over users/days."""
    D = 86_400_000_000
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d"), F.lit("e")),
            (F.pmod(F.xxhash64("id"), 5) + 1).cast("int"),
        ).alias("event_type"),
        F.pmod(F.xxhash64("id", F.lit(1)), n_users).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(2)), n_days * D).alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 100_000) / 100.0).alias("value"),
    )


def probe_basket_capped(spark, n_orders: int, mega_items: int, cap: int = 100) -> dict:
    """The r8 uncapped pathology shape, run through the registered cap."""
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
    it = (
        items.unionAll(mega)
        .distinct()
        .withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")))
        .filter(F.col("c") <= cap)
        .drop("c")
    )
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
        "basket_capped_wall_s": round(time.time() - t0, 1),
        "basket_capped_pairs_support2": n_pairs,
        "mega_pairs_excluded": mega_items * (mega_items - 1) // 2,
    }


def _rolling_old(ev):
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-86_400_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.size(F.collect_set("user_id").over(w)).alias("distinct_users_24h"),
    )


def _rolling_new(ev):
    D = 86_400_000_000
    w_u = Window.partitionBy("event_type", "user_id").orderBy("t")
    prev = F.lag("t").over(w_u)
    seg = ev.select(
        "event_type",
        "user_id",
        "t",
        F.when(prev.isNull() | (F.col("t") - prev > D), 1).otherwise(0).alias("is_start"),
    ).withColumn(
        "seg",
        F.sum("is_start").over(
            w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = seg.groupBy("event_type", "user_id", "seg").agg(
        F.min("t").alias("s"), (F.max("t") + D).alias("e")
    )
    nid = F.lit(None).cast("long")
    starts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(0).alias("kind"),
        F.lit(1).cast("long").alias("delta"), nid.alias("event_id"),
    )
    ends = iv.select(
        "event_type", F.col("e").alias("t"), F.lit(2).alias("kind"),
        F.lit(-1).cast("long").alias("delta"), nid.alias("event_id"),
    )
    qs = ev.select(
        "event_type", "t", F.lit(1).alias("kind"),
        F.lit(0).cast("long").alias("delta"), "event_id",
    )
    allr = (
        starts.unionByName(ends).unionByName(qs)
        .withColumn("bucket", F.floor(F.col("t") / F.lit(D)))
        .localCheckpoint(eager=False)
    )
    wb = (
        Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        allr.groupBy("event_type", "bucket").agg(F.sum("delta").alias("d"))
        .select(
            "event_type", "bucket",
            F.coalesce(F.sum("d").over(wb), F.lit(0).cast("long")).alias("off"),
        )
    )
    wi = (
        Window.partitionBy("event_type", "bucket").orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        allr.join(F.broadcast(offsets), ["event_type", "bucket"])
        .select(
            "event_id", "event_type", "kind",
            (F.col("off") + F.sum("delta").over(wi)).alias("cnt"),
        )
        .filter(F.col("kind") == 1)
        .select("event_id", F.col("cnt").cast("long").alias("distinct_users_24h"))
    )


def probe_rolling(spark, n_rows: int, n_users: int, n_days: int, run_old: bool) -> dict:
    """The old form re-aggregates a collect_set per row over a RANGE
    frame Spark cannot incrementalize — O(rows x frame) work inside
    |types| single-task sorts.  At 2M rows it did not finish inside the
    probe's 50-minute budget (the honest datapoint is 'old form DNF'),
    so the old-vs-new wall comparison runs at a bounded shape and the
    new form alone demonstrates the 10x scale-up."""
    ev = synth_events(spark, n_rows, n_users, n_days).localCheckpoint(eager=False)
    out: dict = {"rolling_rows": n_rows, "rolling_users": n_users, "rolling_days": n_days}
    t0 = time.time()
    noop(_rolling_new(ev))
    out["rolling_new_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    if run_old:
        t0 = time.time()
        noop(_rolling_old(ev))
        out["rolling_old_wall_s"] = round(time.time() - t0, 1)
        # equality spot check on a sample of event ids
        new = _rolling_new(ev).filter(F.pmod(F.col("event_id"), 97) == 0)
        old = _rolling_old(ev).filter(F.pmod(F.col("event_id"), 97) == 0)
        diff = (
            new.alias("n")
            .join(old.alias("o"), "event_id")
            .filter(
                F.col("n.distinct_users_24h") != F.col("o.distinct_users_24h")
            )
            .count()
        )
        out["rolling_sample_mismatches"] = diff
    return out


def probe_autocorr(spark, n_rows: int, n_users: int, n_days: int) -> dict:
    ev = (
        synth_events(spark, n_rows, n_users, n_days)
        .withColumn("day", F.floor(F.col("t") / F.lit(86_400_000_000)))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    naive = (
        ev.select("event_type", "value", F.lag("value").over(w).alias("prev"))
        .groupBy("event_type")
        .agg(
            F.count("prev").alias("n_pairs"),
            F.round(F.corr("value", "prev"), 6).alias("ac"),
        )
    )
    w_seg = Window.partitionBy("event_type", "day").orderBy("t", "event_id")
    within = ev.select(
        "event_type", "value", F.lag("value").over(w_seg).alias("prev")
    )
    seg_edges = ev.groupBy("event_type", "day").agg(
        F.min(F.struct("t", "event_id", "value")).alias("first"),
        F.max(F.struct("t", "event_id", "value")).alias("last"),
    )
    w_days = Window.partitionBy("event_type").orderBy("day")
    boundary = seg_edges.select(
        "event_type",
        F.col("first.value").alias("value"),
        F.lag(F.col("last.value")).over(w_days).alias("prev"),
    )
    seg = (
        within.unionByName(boundary)
        .groupBy("event_type")
        .agg(
            F.count("prev").alias("n_pairs"),
            F.round(F.corr("value", "prev"), 6).alias("ac"),
        )
    )
    t0 = time.time()
    noop(naive)
    t_naive = time.time() - t0
    t0 = time.time()
    noop(seg)
    t_seg = time.time() - t0
    n = {r["event_type"]: (r["n_pairs"], r["ac"]) for r in naive.collect()}
    s = {r["event_type"]: (r["n_pairs"], r["ac"]) for r in seg.collect()}
    pairs_equal = all(n[t][0] == s[t][0] for t in n)
    ac_close = all(abs((n[t][1] or 0) - (s[t][1] or 0)) <= 2e-6 for t in n)
    return {
        "autocorr_rows": n_rows,
        "autocorr_naive_wall_s": round(t_naive, 1),
        "autocorr_segmented_wall_s": round(t_seg, 1),
        "autocorr_pairs_equal": pairs_equal,
        "autocorr_ac_within_2e-6": ac_close,
    }


def probe_pq_encode(spark, n_vecs: int, dim: int = 64) -> dict:
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), 2001) - 1000
            ).cast("double")
            / 1000.0,
        ).alias("embedding"),
    ).localCheckpoint(eager=False)
    book = pq_codebook(emb, n_codes=8, m=4)
    codes = pq_encode(emb, book)
    t0 = time.time()
    noop(codes)
    wall = time.time() - t0
    plan = codes._jdf.queryExecution().executedPlan().toString()
    return {
        "pq_vecs": n_vecs,
        "pq_encode_wall_s": round(wall, 1),
        "pq_rows_per_s": int(n_vecs / wall),
        "pq_exchanges": plan.count("Exchange hashpartitioning"),
        "pq_python": plan.count("Python"),
    }


def main() -> None:
    small = "--small" in sys.argv
    k = 0.02 if small else 1.0
    spark = get_spark(
        "r9-scale-probe",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    results.update(
        probe_basket_capped(spark, int(10_000_000 * k), 5000)
    )
    print(json.dumps({k_: results[k_] for k_ in results}), flush=True)
    # old-vs-new at a shape the old form can finish (200k rows — at 2M
    # it blew a 50-min budget), then the new form alone at 100x that
    r1 = probe_rolling(
        spark, int(200_000 * k) or 10_000, int(20_000 * k) or 100, 60, run_old=True
    )
    print(json.dumps(r1), flush=True)
    r2 = probe_rolling(
        spark, int(20_000_000 * k), int(1_000_000 * k) or 100, 60, run_old=False
    )
    print(json.dumps(r2), flush=True)
    r3 = probe_autocorr(spark, int(20_000_000 * k), int(200_000 * k) or 100, 60)
    print(json.dumps(r3), flush=True)
    r4 = probe_pq_encode(spark, int(1_000_000 * k))
    print(json.dumps(r4), flush=True)
    results.update(r1)
    results["rolling_new_10x_wall_s"] = r2["rolling_new_wall_s"]
    results.update(r3)
    results.update(r4)
    print("SUMMARY " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
