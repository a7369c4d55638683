"""End-to-end nightly-flow probe (r6 verdict ask #5): the FULL production
loop the round-5/6 pieces individually prove, composed and measured at
scale — ingest a daily increment, DQ-gate it, dedup it against published
history (never history x history), and publish the survivors as one
atomic WAP epoch; then crash mid-flow and show the previously published
state is untouched and the retry publishes exactly once.

Stages (each timed):

1. bootstrap   — synthesize N_HISTORY docs and publish them as epoch 0 of
                 a streaming-WAP history table (the accumulated corpus).
2. dq_gate     — quarantine DQ-violating increment rows (null/short text)
                 via plans.quality row rules; only clean rows proceed.
3. dedup       — operators.dedup.incremental_dedup(history, clean):
                 exact-fingerprint tier + MinHash-LSH tier, increment x
                 history only.
4. publish     — surviving docs become ONE atomic epoch via
                 plans.lifecycle.publish_epoch, with a DQ audit on the
                 staged read-back (plans.quality.dq_audit).
5. crash+retry — a partial epoch dir is staged with no manifest swap
                 (crash); readers must still see the pre-crash state;
                 the retry must publish exactly once (no duplicates).

Planted increment composition (fractions of N_INC):
  2% exact duplicates of history, 2% near duplicates of history (base
  text + one extra token, J~0.93), 1% intra-increment exact copies,
  0.5% DQ violations (NULL text), rest fresh.  The probe asserts the
  flagged / quarantined counts match the plant; the bands reference
  history docs by position, so n_increment * 2% must not exceed
  n_history (validated at startup).

Usage: python tools/nightly_flow_probe.py [n_history] [n_increment]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    incremental_dedup,
)
from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (  # noqa: E402
    publish_epoch,
    read_published_epochs,
)
from iiot_data_engineering_lab_assignment_spark.plans.quality import (  # noqa: E402
    dq_audit,
    not_null,
    quarantine,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

VOCAB = [
    "spark", "query", "join", "scan", "merge", "sort", "window", "stream",
    "batch", "row", "column", "table", "filter", "group", "value", "key",
    "data", "fast", "slow", "small", "large", "hash", "index", "cache",
    "shuffle", "broadcast", "partition", "cluster", "node", "task",
]


def base_text(seed_col):
    """40 shared tokens from a seed (distinct docs <=> distinct seeds;
    ~600k-word token space so cross-doc shingle collisions are rare)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.element_at(
                vocab, (F.pmod(F.xxhash64(seed_col, i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
            F.lit("_"),
            F.pmod(F.xxhash64(seed_col, i, F.lit(7)), F.lit(20_000)),
        ),
    )
    return F.concat_ws(" ", words)


def synth_history(spark, n: int):
    """History docs 0..n-1, all distinct (seed = id)."""
    return spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"), base_text(F.col("id")).alias("text")
    )


def synth_increment(spark, n_hist: int, n_inc: int):
    """Increment ids start at 10*n_hist.  Planted bands by position i in
    [0, n_inc): [0, 2%) exact dups of history doc i; [2%, 4%) near dups
    of history doc i (base + 2 extra tokens); [4%, 5%) intra-increment
    exact copies (pairs sharing a seed); [5%, 5.5%) DQ violations (NULL
    text); rest fresh (seed = unique, offset past history)."""
    p_exact = int(n_inc * 0.02)
    p_near = int(n_inc * 0.02)
    p_intra = int(n_inc * 0.01)
    p_dq = int(n_inc * 0.005)
    i = F.col("id")
    b_exact = p_exact
    b_near = b_exact + p_near
    b_intra = b_near + p_intra
    b_dq = b_intra + p_dq
    near_seed = i - b_exact  # history doc it paraphrases
    intra_seed = F.lit(2 * n_hist) + F.floor((i - b_near) / 2)  # pair-shared
    fresh_seed = F.lit(3 * n_hist) + i
    text = (
        F.when(i < b_exact, base_text(i))  # == history doc i
        .when(
            i < b_near,
            # one extra token: jaccard ~ 38/41 = 0.93, so at 64 hashes /
            # 16 bands the per-doc LSH miss probability is ~2.6e-10 and
            # the equality assertion below is sound
            F.concat_ws(" ", base_text(near_seed), F.lit("extra_a")),
        )
        .when(i < b_intra, base_text(intra_seed))
        .when(i < b_dq, F.lit(None).cast("string"))
        .otherwise(base_text(fresh_seed))
    )
    return (
        spark.range(0, n_inc, 1, 32).select(
            (F.lit(10 * n_hist) + i).alias("doc_id"), text.alias("text")
        ),
        {"exact": p_exact, "near": p_near, "intra": p_intra, "dq": p_dq},
    )


def main() -> None:
    n_hist = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    if int(n_inc * 0.02) > n_hist:
        sys.exit(
            f"n_increment*2% ({int(n_inc * 0.02)}) exceeds n_history ({n_hist}): "
            "the exact/near bands reference history docs by position — "
            "pass a larger n_history or a smaller n_increment"
        )
    spark = get_spark("nightly-flow-probe")
    table = "/tmp/nightly_flow_probe_history"
    shutil.rmtree(table, ignore_errors=True)
    out: dict = {
        "metric": "nightly_flow_probe",
        "n_history": n_hist,
        "n_increment": n_inc,
        "unit": "sec",
    }

    # 1. bootstrap: history published as epoch 0
    t0 = time.time()
    publish_epoch(synth_history(spark, n_hist), table, 0)
    history = read_published_epochs(spark, table)
    out["bootstrap_sec"] = round(time.time() - t0, 2)

    increment, plant = synth_increment(spark, n_hist, n_inc)
    out["planted"] = plant

    # 2. DQ gate: quarantine violators before any expensive work
    t0 = time.time()
    rules = [not_null("text"), ("text_empty", F.length("text") == 0)]
    clean, bad = quarantine(increment, rules)
    n_bad = bad.count()
    out["dq_quarantined"] = n_bad
    out["dq_gate_sec"] = round(time.time() - t0, 2)
    assert n_bad == plant["dq"], (n_bad, plant)

    # 3. incremental dedup: increment x history only
    t0 = time.time()
    flagged = incremental_dedup(history, clean, num_hashes=64, bands=16, threshold=0.4)
    by_tier = {r["tier"]: r["n"] for r in
               flagged.groupBy("tier").agg(F.count(F.lit(1)).alias("n")).collect()}
    out["dedup_flagged"] = by_tier
    out["dedup_sec"] = round(time.time() - t0, 2)
    assert by_tier.get("exact", 0) == plant["exact"], (by_tier, plant)
    assert by_tier.get("near", 0) == plant["near"], (by_tier, plant)

    # intra-increment exact copies collapse to lowest id (the streaming
    # writer's exact_dedup_keep_first semantics)
    keep = clean.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    collapsed = clean.join(keep, ["text", "doc_id"], "left_semi")
    survivors = collapsed.join(flagged.select("doc_id"), "doc_id", "left_anti")

    # 4. publish the survivors as ONE atomic epoch, DQ audit on staged
    t0 = time.time()
    expected = n_inc - n_bad - plant["exact"] - plant["near"] - plant["intra"] // 2
    published = publish_epoch(
        survivors, table, 1, audit=dq_audit(rules, max_violations=0)
    )
    out["publish_sec"] = round(time.time() - t0, 2)
    assert published is True
    total = read_published_epochs(spark, table).count()
    out["published_total"] = total
    assert total == n_hist + expected, (total, n_hist, expected)

    # 5. crash mid-flow: stage partial epoch 2, no manifest swap
    crashed = os.path.join(table, "_epochs", "batch-00000002")
    spark.range(0, 17).selectExpr(
        "id as doc_id", "'partial' as text"
    ).write.parquet(crashed)
    assert read_published_epochs(spark, table).count() == total  # intact
    # retry publishes exactly once; a second retry is a no-op
    nxt = synth_history(spark, 1000).withColumn(
        "doc_id", F.col("doc_id") + 100 * n_hist
    )
    assert publish_epoch(nxt, table, 2) is True
    assert publish_epoch(nxt, table, 2) is False
    assert read_published_epochs(spark, table).count() == total + 1000
    out["crash_retry_ok"] = True

    out["total_sec"] = round(
        out["bootstrap_sec"] + out["dq_gate_sec"] + out["dedup_sec"] + out["publish_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
