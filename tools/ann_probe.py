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
    hyperplane_bucket,
    ivf_topk,
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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
