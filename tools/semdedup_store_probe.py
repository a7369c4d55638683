"""r8 probe (r7 verdict ask #5): incremental semantic dedup with the
PERSISTED ``history_assigned`` store — the production path named in
operators/similarity.py::incremental_semantic_dedup's docstring.

Inline mode re-assigns the full history to cells on every daily run
(an O(|history| x k x d) expression scan) and then shuffles the history
by cell into the cogroup.  Store mode precomputes (id, embedding, cell)
ONCE, persists it as a catalog table BUCKETED on cell, and each daily
run reads the history leg pre-clustered: no assignment scan, and the
bucketed HashPartitioning(cell) satisfies the cogroup's clustering so
the history side enters FlatMapCoGroupsInPandas with NO exchange —
only the small increment assigns + shuffles.

Prints one JSON line with wall clocks, the exchange counts read from
the executed plans, and a result-equality check between the two modes.

Usage: python tools/semdedup_store_probe.py [hist_n] [inc_n] [d] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.similarity import (  # noqa: E402
    assign_cells,
    incremental_semantic_dedup,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, start: int, n: int, d: int):
    """Deterministic pseudo-random unit-ish embeddings, JVM-side."""
    comp = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda j: (
            F.pmod(F.xxhash64("id", j), F.lit(2001)) - F.lit(1000.0)
        )
        / F.lit(1000.0),
    )
    return spark.range(start, start + n, 1, 32).select(
        F.col("id").alias("vec_id"), comp.alias("embedding")
    )


def main() -> None:
    hist_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    inc_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    spark = get_spark("semdedup-store-probe")
    rng = np.random.RandomState(42)
    cents = {c: [float(x) for x in rng.uniform(-1, 1, d)] for c in range(k)}
    hist = synth_embeddings(spark, 0, hist_n, d)
    # 1% of the increment are EXACT copies of history rows (cosine 1.0):
    # both modes must recover exactly these planted pairs, so the
    # mode-equality check is non-trivial (random-uniform vectors alone
    # produce zero pairs at threshold 0.9)
    planted = max(inc_n // 100, 1)
    plant = synth_embeddings(spark, 0, planted, d).withColumn(
        "vec_id", F.col("vec_id") + F.lit(hist_n)
    )
    inc = plant.unionByName(
        synth_embeddings(spark, hist_n + planted, inc_n - planted, d)
    )
    out: dict = {
        "metric": "semdedup_store_probe",
        "unit": "sec",
        "hist_n": hist_n,
        "inc_n": inc_n,
        "d": d,
        "k": k,
    }

    # one-time store build: assign history, persist bucketed on cell
    # (DROP alone misses the warehouse dir when a PREVIOUS session's
    # table metadata died with its in-memory catalog)
    import shutil

    spark.sql("DROP TABLE IF EXISTS semprobe_hist_assigned")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "semprobe_hist_assigned"), ignore_errors=True)
    t0 = time.time()
    (
        assign_cells(hist, cents)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(32, "cell")
        .saveAsTable("semprobe_hist_assigned")
    )
    out["store_build_sec"] = round(time.time() - t0, 2)

    def run(label: str, history, history_assigned):
        t0 = time.time()
        pairs = incremental_semantic_dedup(
            history, inc, cents, threshold=0.9, history_assigned=history_assigned
        )
        pair_set = {
            (r["id_new"], r["id_hist"]) for r in pairs.select("id_new", "id_hist").collect()
        }
        out[f"{label}_sec"] = round(time.time() - t0, 2)
        out[f"{label}_pairs"] = len(pair_set)
        pair_sets[label] = pair_set
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        out[f"{label}_exchanges"] = plan.count("Exchange hashpartitioning")
        out[f"{label}_bucketed_scan"] = "Bucketed: true" in plan
        # one array_min projection per leg that performs nearest-centroid
        # assignment: inline assigns BOTH legs, store only the increment
        out[f"{label}_assign_scans"] = plan.count("array_min")
        return plan

    out["planted"] = planted
    pair_sets: dict = {}
    run("inline", hist, None)
    store = spark.table("semprobe_hist_assigned")
    run("store", None, store)
    # both modes must agree on the actual PAIR SET (counts alone could
    # mask one mode trading a lost twin for a borderline random pair)
    # AND recover every planted twin (a planted increment row shares its
    # twin's cell by construction, so cell blocking cannot lose it)
    out["modes_agree"] = pair_sets["inline"] == pair_sets["store"]
    expected = {(hist_n + i, i) for i in range(planted)}
    out["planted_recovered"] = expected <= pair_sets["store"]
    # the history leg must be a bucketed scan feeding the cogroup with
    # no exchange and no assignment projection — i.e. store mode drops
    # exactly the history-side exchange AND the history-side assignment
    out["store_history_leg_clean"] = (
        out["store_bucketed_scan"]
        and out["store_exchanges"] < out["inline_exchanges"]
        and out["store_assign_scans"] < out["inline_assign_scans"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
