"""Scale probes for the round-8 operators (the 'would it hold at 1000x'
check, run at 20-200x bench scale on local[32]):

* unigram_logprob + DSIR shape at 10M synthetic docs (40 tokens each,
  ~400M exploded token rows): the corpus-LM build and the term-keyed
  scoring join — both O(postings) with broadcast 1-row stats.
* token entropy at 10M docs — one (doc, term) aggregate + a doc window
  on the SAME exchange.
* weighted sampling (E-S) at 100M rows x 20 groups — one group-keyed
  top-k exchange; and the global TakeOrdered form at the same scale.
* winsorize at 100M rows x 5 groups — exact percentile pass + broadcast
  clip pass.
* embedding_dim_stats at 5M x 64d (320M exploded values) — group
  cardinality d after map-side combine.
* heavy hitters (approx_top_k) at 100M rows with a planted zipf-ish
  skew — sketch aggregate, no (type, user) exact shuffle.

Usage: SPARK_DRIVER_MEMORY=48g python tools/r8_ops_scale_probe.py [--small]
Prints one JSON line.  The 48g heap mirrors a production executor sized
to its partition count; at the default 8g the 400M-row (doc, term)
partial-aggregation maps of 32 concurrent tasks thrash the GC and OOM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.sampling import (  # noqa: E402
    weighted_sample_per_group,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

VOCAB_N = 50_000


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def synth_docs(spark, n: int, tokens: int = 40):
    """n docs of `tokens` pseudo-random terms over a 50k vocabulary,
    with term frequencies skewed by squaring (hot head, long tail)."""
    words = F.transform(
        F.sequence(F.lit(1), F.lit(tokens)),
        lambda i: F.concat(
            F.lit("t"),
            F.pmod(
                F.pmod(F.xxhash64("id", i), F.lit(VOCAB_N))
                * F.pmod(F.xxhash64("id", i, F.lit(3)), F.lit(VOCAB_N)),
                F.lit(VOCAB_N),
            ),
        ),
    )
    # 256 input partitions: the (doc, term) partial-agg map is the
    # memory hog at this scale — smaller input slices bound each task's
    # hash map (with 64 partitions x 32 concurrent tasks the maps
    # outgrew an 8g heap; see SCALE.md r8)
    return spark.range(0, n, 1, 256).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("string").alias("source"),
        F.concat_ws(" ", words).alias("text"),
    )


def main() -> None:
    small = "--small" in sys.argv
    scale = 100 if small else 1
    spark = get_spark("r8-ops-probe")
    out: dict = {"metric": "r8_ops_scale_probe", "unit": "sec", "small": small}

    # --- unigram log-prob scoring @ 10M docs (400M tokens)
    n_docs = 10_000_000 // scale
    docs = synth_docs(spark, n_docs)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tc.agg(F.sum("c").alias("t"))
    dt = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    t0 = time.time()
    scored = (
        dt.join(tc, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("cnt") * -F.log(F.col("c") * 1.0 / F.col("t")))
                / F.sum("cnt")
            ).alias("avg_nll")
        )
    )
    noop(scored)
    out["unigram_docs"] = n_docs
    out["unigram_sec"] = round(time.time() - t0, 2)

    # --- token entropy @ 10M docs
    from pyspark.sql import Window

    t0 = time.time()
    sized = dt.withColumn("n", F.sum("cnt").over(Window.partitionBy("doc_id")))
    p = F.col("cnt") * 1.0 / F.col("n")
    ent = sized.groupBy("doc_id").agg(F.sum(-p * F.log(p)).alias("entropy"))
    noop(ent)
    out["entropy_docs"] = n_docs
    out["entropy_sec"] = round(time.time() - t0, 2)

    # --- weighted sampling @ 100M rows x 20 groups, k=1000; + global k=1000
    n = 100_000_000 // scale
    rows = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("string").alias("grp"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).cast("double").alias("w"),
    )
    t0 = time.time()
    noop(weighted_sample_per_group(rows, k=1000, weight_col="w", group_cols=["grp"]))
    out["wsample_rows"] = n
    out["wsample_grouped_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    g = weighted_sample_per_group(rows, k=1000, weight_col="w")
    noop(g)
    out["wsample_global_sec"] = round(time.time() - t0, 2)
    out["wsample_global_take_ordered"] = (
        "TakeOrderedAndProject"
        in g._jdf.queryExecution().executedPlan().toString()
    )

    # --- winsorize @ 100M rows x 5 groups
    ev = spark.range(0, n, 1, 64).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.randn(seed=7) * 10 + 50).alias("value"),
    )
    t0 = time.time()
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    noop(
        j.groupBy("event_type").agg(
            F.avg("value").alias("avg_raw"), F.avg(clipped).alias("avg_winsor")
        )
    )
    out["winsorize_rows"] = n
    out["winsorize_sec"] = round(time.time() - t0, 2)

    # --- embedding_dim_stats @ 5M x 64d
    n_emb = 5_000_000 // scale
    emb = spark.range(0, n_emb, 1, 64).select(
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j_: (F.pmod(F.xxhash64("id", j_), F.lit(2001)) - 1000.0) / 1000.0,
        ).alias("embedding")
    )
    t0 = time.time()
    e = emb.select(F.posexplode("embedding").alias("dim", "x"))
    noop(
        e.groupBy("dim").agg(
            F.avg("x").alias("mean_x"),
            F.stddev_samp("x").alias("std_x"),
            F.min("x"),
            F.max("x"),
        )
    )
    out["dimstats_vectors"] = n_emb
    out["dimstats_sec"] = round(time.time() - t0, 2)

    # --- heavy hitters @ 100M rows, planted hot key
    # plant one hot key covering EVERY type (ids with id%10 < 5 belong to
    # type id%5 == id%10, ~half of each type's rows); the remaining rows
    # are a near-unique tail the sketch rightly reports nothing for
    skewed = spark.range(0, n, 1, 64).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        F.when(F.col("id") % 10 < 5, F.lit(777))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .cast("int")
        .alias("user_id"),
    )
    t0 = time.time()
    tk = skewed.groupBy("event_type").agg(
        F.expr("approx_top_k(user_id, 5)").alias("tk")
    )
    rows_tk = tk.collect()
    out["topk_rows"] = n
    out["topk_sec"] = round(time.time() - t0, 2)
    # the planted hot key (~50% of every type) must lead every type's list
    out["topk_planted_first"] = all(
        r["tk"] and r["tk"][0]["item"] == 777 for r in rows_tk
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
