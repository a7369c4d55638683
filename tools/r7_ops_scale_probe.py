"""Scale probes for the round-7 operators (the 'would it hold at 1000x'
check, run at 10-100x bench scale on local[32]):

* epoch_shuffle at 100M rows — ONE shard-keyed exchange + per-shard
  sort; asserts shard sizes stay balanced (the md5 prefix is uniform,
  so no shard can hot-spot) and measures the full materialization.
* length_bucket_packing at 10M docs — one bucket-keyed exchange
  serving both windows; the bucket key has ~14 distinct values at this
  length distribution, so the probe measures exactly the
  few-hot-partitions regime the docstring warns about.
* scd2_point_in_time_join shape at 10M facts x 1M orders x 100k
  customers — spans build (two windows) + broadcast interval join.
* incremental_semantic_dedup (cogrouped GEMM) at 500k history x 50k
  increment, d=64, k=64 cells — the Arrow-batched increment x history
  pair stage.

Usage: python tools/r7_ops_scale_probe.py [--small]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.sampling import (  # noqa: E402
    epoch_shuffle,
)
from iiot_data_engineering_lab_assignment_spark.operators.text import (  # noqa: E402
    length_bucket_packing,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    small = "--small" in sys.argv
    scale = 100 if small else 1
    spark = get_spark("r7-ops-probe")
    out: dict = {"metric": "r7_ops_scale_probe", "unit": "sec", "small": small}

    # --- epoch_shuffle @ 100M
    n = 100_000_000 // scale
    docs = spark.range(0, n, 1, 64).select(F.col("id").alias("doc_id"))
    t0 = time.time()
    shuffled = epoch_shuffle(docs, epoch=1, n_shards=256)
    noop(shuffled)
    out["epoch_shuffle_rows"] = n
    out["epoch_shuffle_sec"] = round(time.time() - t0, 2)
    sizes = shuffled.groupBy("shard").count().agg(
        F.min("count"), F.max("count"), F.count(F.lit(1))
    ).first()
    out["epoch_shuffle_shard_skew"] = round(sizes[1] / sizes[0], 3)
    assert sizes[2] == 256 and sizes[1] / sizes[0] < 1.2  # uniform prefix

    # --- length_bucket_packing @ 10M
    n = 10_000_000 // scale
    ltext = F.rtrim(F.repeat(F.lit("w "), (F.pmod(F.xxhash64("id"), F.lit(197)) + 3).cast("int")))
    ldocs = spark.range(0, n, 1, 64).select(F.col("id").alias("doc_id"), ltext.alias("text"))
    t0 = time.time()
    packed = length_bucket_packing(ldocs, batch_size=1024)
    noop(packed)
    out["length_bucket_rows"] = n
    out["length_bucket_sec"] = round(time.time() - t0, 2)

    # --- PIT join shape @ 10M facts
    n_ord = 1_000_000 // scale
    n_li = 10_000_000 // scale
    orders = spark.range(0, n_ord, 1, 64).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id"), F.lit(max(n_ord // 10, 1))).alias("o_custkey"),
        F.concat(F.lit("P"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5))).alias(
            "o_orderpriority"
        ),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.xxhash64("id", F.lit(5)), F.lit(365)).cast("int")).alias("o_orderdate"),
    )
    li = spark.range(0, n_li, 1, 64).select(
        F.pmod(F.xxhash64("id"), F.lit(n_ord)).alias("l_orderkey"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.xxhash64("id", F.lit(7)), F.lit(400)).cast("int")).alias("l_shipdate"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    seq = orders.select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey",
        F.when(prev.isNull() | (prev != F.col("o_orderpriority")), 1).otherwise(0).alias("chg"),
    )
    isl = seq.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    spans = isl.groupBy("o_custkey", "island").agg(
        F.min("o_orderpriority").alias("span_priority"),
        F.min("o_orderdate").alias("valid_from"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("island")
    vspans = spans.select(
        "o_custkey", "span_priority", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    facts = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderpriority"),
        "l_orderkey",
    )
    t0 = time.time()
    pit = facts.join(
        vspans,
        (facts["o_custkey"] == vspans["o_custkey"])
        & (vspans["valid_from"] <= facts["l_shipdate"])
        & (vspans["valid_to"].isNull() | (facts["l_shipdate"] < vspans["valid_to"])),
        "left",
    )
    agg = pit.groupBy(F.trunc("l_shipdate", "mm").alias("m")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("span_priority") != facts["o_orderpriority"], 1).otherwise(0)).alias("chgd"),
    )
    noop(agg)
    out["pit_join_facts"] = n_li
    out["pit_join_sec"] = round(time.time() - t0, 2)

    # --- incremental semantic dedup (cogrouped GEMM) @ 500k x 50k, d=64
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        incremental_semantic_dedup,
    )

    d, k = 64, 64
    n_hist = 500_000 // scale
    n_inc = 50_000 // scale
    n_planted = n_inc // 100  # 1% of the increment re-encodes a history vec

    def emb_of(seed):
        return F.transform(
            F.sequence(F.lit(1), F.lit(d)),
            lambda i: (F.pmod(F.xxhash64(seed, i), F.lit(1000)) / 500.0 - 1.0),
        )

    hist = spark.range(0, n_hist, 1, 64).select(
        F.col("id").alias("vec_id"), emb_of(F.col("id")).alias("embedding")
    )
    # planted near-copies: same base vector + a tiny first-component nudge
    # (cosine ~ 1 >> threshold); the rest are independent pseudo-random
    # vectors (cosine concentrated near 0 at d=64)
    planted_src = F.col("id") - n_hist
    inc_emb = F.when(
        F.col("id") < n_hist + n_planted,
        F.transform(emb_of(planted_src), lambda x, i: x + F.when(i == 0, 0.001).otherwise(0.0)),
    ).otherwise(emb_of(F.col("id")))
    inc = spark.range(n_hist, n_hist + n_inc, 1, 64).select(
        F.col("id").alias("vec_id"), inc_emb.alias("embedding")
    )
    cents = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in hist.limit(k).collect()
    }
    t0 = time.time()
    pairs = incremental_semantic_dedup(hist, inc, cents, threshold=0.9)
    found = {
        (r["id_new"], r["id_hist"]) for r in pairs.collect()
    }
    out["semdedup_hist"] = n_hist
    out["semdedup_inc"] = n_inc
    out["semdedup_planted"] = n_planted
    out["semdedup_pairs"] = len(found)
    planted_hits = sum(
        1 for i in range(n_planted) if (n_hist + i, i) in found
    )
    out["semdedup_planted_recall"] = round(planted_hits / max(n_planted, 1), 4)
    out["semdedup_sec"] = round(time.time() - t0, 2)
    assert planted_hits == n_planted  # same-cell assignment of a near-copy

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
