"""ANN scale probe: brute-force vs multi-probe LSH vs IVF top-k over a
synthetic clustered embedding corpus (the measured numbers for the
similarity-search family; dedup and core ops have theirs in SCALE.md).

Honest at-scale shape: the index structures are built ONCE (bucket
column precomputed and stored; IVF quantizer trained offline) and the
probe times only the per-query work, which is what repeats at serving
time.  Build cost is reported separately.

Usage: python tools/ann_probe.py [n_vectors] [dim] [n_cells]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    centroids,
    dot,
    hyperplane_bucket,
    int8_quantize,
    ivf_topk,
    knn_join,
    lsh_topk,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, d: int, n_cells: int):
    """n vectors clustered around n_cells fixed centers: vector i belongs
    to cell i % n_cells; component j = center + pseudo-noise.  The noise
    frequency (12.9898 per id) is deliberately incommensurate with the
    cell stride so same-cell vectors get independent noise (a sin(0.618*
    id) variant aliased: 0.618 * stride landed within 0.02 rad of a
    multiple of 2*pi, giving every cell member an identical bucket)."""
    ids = spark.range(0, n, 1, 64).withColumnRenamed("id", "vec_id")
    cell = (F.col("vec_id") % n_cells).cast("int").alias("label")
    comps = []
    for j in range(d):
        center = F.sin((F.col("vec_id") % n_cells + 1) * F.lit(float(j + 1)))
        noise = (
            F.sin(F.col("vec_id") * F.lit(12.9898) + F.lit(78.233 * j)) * F.lit(0.15)
        )
        comps.append((center + noise).cast("float"))
    return ids.select("vec_id", cell, F.array(*comps).alias("embedding"))


def query_for_cell(cell: int, d: int) -> list[float]:
    return [math.sin((cell + 1) * (j + 1)) for j in range(d)]


def t(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    k = 10
    path = "/tmp/ann_probe_emb"
    spark = get_spark("ann-probe")

    planes = [
        [math.sin(97.0 * p + 13.0 * j) for j in range(d)] for p in range(8)
    ]

    # ---- build phase: precompute the LSH bucket, store, train the IVF
    # quantizer.  Paid once per corpus version, amortized over queries.
    emb = synth_embeddings(spark, n, d, n_cells)
    sec_build, _ = t(
        lambda: emb.withColumn(
            "bucket", hyperplane_bucket(F.col("embedding"), planes)
        )
        .write.mode("overwrite")
        .partitionBy("bucket")  # probe filter -> partition-pruned scan
        .parquet(path)
    )
    stored = spark.read.parquet(path)
    sec_train, cents_rows = t(lambda: centroids(stored, "label", "embedding").collect())
    by_cell: dict = {}
    for r in cents_rows:
        by_cell.setdefault(r["label"], [0.0] * d)[r["pos"]] = r["centroid_v"]

    # ---- query phase: what repeats at serving time.
    q = query_for_cell(7, d)
    sec_bf, bf_rows = t(lambda: brute_force_topk(stored, q, k=k).collect())
    truth = {r["vec_id"] for r in bf_rows}

    sec_lsh, lsh_rows = t(
        lambda: lsh_topk(
            stored, q, planes, k=k, probe_hamming=2, bucket_col="bucket"
        ).collect()
    )
    sec_ivf, ivf_rows = t(
        lambda: ivf_topk(stored, q, nprobe=3, k=k, cents=by_cell).collect()
    )

    # ---- int8 (SQ8) storage leg: quantize once at build time, store
    # array<tinyint>, and serve top-k off the quantized store.  The claim
    # being measured is the STORAGE/IO cut (4x raw; parquet-encoded ratio
    # reported) plus the quantized-store query time and recall.
    path8 = "/tmp/ann_probe_emb_int8"
    path32 = "/tmp/ann_probe_emb_f32"  # like-for-like size baseline:
    # (vec_id, embedding) only — the bucket-partitioned store above also
    # carries label + partition dirs, which would flatter the ratio
    stored.select("vec_id", "embedding").write.mode("overwrite").parquet(path32)
    sec_q8_build, _ = t(
        lambda: stored.select(
            "vec_id",
            F.transform(int8_quantize(F.col("embedding")), lambda x: x.cast("tinyint")).alias("qv"),
        )
        .write.mode("overwrite")
        .parquet(path8)
    )

    def du(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    stored8 = spark.read.parquet(path8)
    # quantize the query with the same in-plan arithmetic (1-row slab)
    qrow8 = (
        spark.createDataFrame([(q,)], "q array<double>")
        .select(F.transform(int8_quantize(F.col("q")), lambda x: x.cast("tinyint")).alias("query_qv"))
    )
    qv_d = F.transform(F.col("qv"), lambda x: x.cast("double"))
    qq_d = F.transform(F.col("query_qv"), lambda x: x.cast("double"))
    cos8 = dot(qv_d, qq_d) / (F.sqrt(dot(qv_d, qv_d)) * F.sqrt(dot(qq_d, qq_d)))

    def int8_serve():
        return (
            stored8.crossJoin(F.broadcast(qrow8))
            .select("vec_id", cos8.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k)
            .collect()
        )

    sec_i8, i8_rows = t(int8_serve)
    # Identity-level recall is the wrong metric when the true top-10 are
    # near-ties (this corpus: ~n/n_cells same-cell vectors within a few
    # 1e-3 of cosine) — SQ8's ~4e-3 per-dot error reorders ties without
    # returning a worse NEIGHBOR.  So also report the cosine REGRET: how
    # far the worst returned vector's EXACT cosine sits below the true
    # 10th-best exact cosine (0 = indistinguishable from exact search).
    ids8 = [int(r["vec_id"]) for r in i8_rows]
    exact_of_returned = brute_force_topk(
        stored.filter(F.col("vec_id").isin(ids8)), q, k=k
    ).collect()
    true_kth = min(r["cosine"] for r in bf_rows)
    worst_returned = min(r["cosine"] for r in exact_of_returned)
    int8_regret = round(true_kth - worst_returned, 6)

    # ---- bulk k-NN join: 100 queries x n corpus in one pass.
    queries_df = stored.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    sec_knn, knn_rows = t(
        lambda: knn_join(queries_df, stored.select("vec_id", "embedding"), k=k).count()
    )

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": d,
                "n_cells": n_cells,
                "build_write_sec": sec_build,
                "ivf_train_sec": sec_train,
                "brute_sec": sec_bf,
                "lsh_sec": sec_lsh,
                "lsh_recall_at_10": len(truth & {r["vec_id"] for r in lsh_rows}) / k,
                "ivf_sec": sec_ivf,
                "ivf_recall_at_10": len(truth & {r["vec_id"] for r in ivf_rows}) / k,
                "int8_build_sec": sec_q8_build,
                "int8_store_bytes": du(path8),
                "float_store_bytes": du(path32),
                "int8_serve_sec": sec_i8,
                "int8_recall_at_10": len(truth & {r["vec_id"] for r in i8_rows}) / k,
                "int8_cosine_regret": int8_regret,
                "knn_join_100q_sec": sec_knn,
                "knn_join_rows": knn_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
