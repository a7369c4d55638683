"""Trained-PQ probe at 1M x 64d (r12): cost of the per-subspace Lloyd
trainer (all m subspaces per scan — per-iteration cost should track ONE
pq_encode pass, not m of them), encode throughput against the trained
book, bulk-ADC serving over many probes in one pass, and the quality
case for training: trained-vs-fixed quantization inertia and recall@10
vs exact brute force.

Corpus: the ann_probe clustered synthetic (vector i near center
i % n_clusters with incommensurate pseudo-noise) — k-means-structured
data where Lloyd refinement has signal; n_codes=8, m=4 to match the
registered rows.

Usage: python tools/pqtrain_probe.py [n_vectors] [dim] [n_codes] [m]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.similarity import (  # noqa: E402
    _as_double,
    dot,
    pq_adc_knn_join,
    pq_codebook,
    pq_codebook_train,
    pq_encode,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, d: int, n_clusters: int = 8):
    ids = spark.range(0, n, 1, 64).withColumnRenamed("id", "vec_id")
    comps = []
    for j in range(d):
        center = F.sin((F.col("vec_id") % n_clusters + 1) * F.lit(float(j + 1)))
        noise = (
            F.sin(F.col("vec_id") * F.lit(12.9898) + F.lit(78.233 * j))
            * F.lit(0.15)
        )
        comps.append((center + noise).cast("float"))
    return ids.select("vec_id", F.array(*comps).alias("embedding"))


def inertia(emb, book) -> float:
    e = _as_double(F.col("embedding"))
    total = None
    for s, cents in sorted(book.items()):
        dsub = len(cents[0][1])
        v = F.slice(e, s * dsub + 1, dsub)
        vnorm = dot(v, v)
        dists = []
        for _, c in cents:
            carr = F.array(*[F.lit(float(x)) for x in c])
            cnorm = float(sum(x * x for x in c))
            dists.append(vnorm - F.lit(2.0) * dot(v, carr) + F.lit(cnorm))
        best = F.array_min(F.array(*dists))
        total = best if total is None else total + best
    return float(emb.select(F.sum(total).alias("i")).head()["i"])


def inertia_gemm(emb, book) -> float:
    """GEMM-tier inertia (probe metric): per batch, per subspace, one
    (n x dsub) @ (dsub x k) product and a row-min; float64 partial sums
    (probe metric — the registered rows use the exact-decimal path)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    subs = sorted(book.items())
    mats = []
    start = 0
    for s, cents in subs:
        C = np.array([c for _, c in sorted(cents)], dtype=np.float64)
        mats.append((start, C.shape[1], C, (C * C).sum(axis=1)))
        start += C.shape[1]
    schema = StructType([StructField("part", DoubleType(), False)])

    def _part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            tot = 0.0
            for st, dsub, C, cnorm in mats:
                Xs = X[:, st : st + dsub]
                D = (Xs * Xs).sum(axis=1)[:, None] - 2.0 * (Xs @ C.T) + cnorm
                tot += float(D.min(axis=1).sum())
            yield pd.DataFrame({"part": [tot]})

    return float(
        emb.select("embedding").mapInPandas(_part, schema).agg(F.sum("part")).head()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_codes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    gemm = len(sys.argv) > 5 and sys.argv[5] == "gemm"

    spark = get_spark(
        "pqtrain_probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_embeddings(spark, n, d).localCheckpoint()

    t0 = time.time()
    fixed = pq_codebook(emb, n_codes=n_codes, m=m)
    t_fixed = time.time() - t0

    t0 = time.time()
    trained = pq_codebook_train(emb, n_codes=n_codes, m=m, iters=2, gemm=gemm)
    t_train = time.time() - t0

    t0 = time.time()
    if gemm:
        from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
            pq_encode_gemm,
        )

        n_codes_rows = pq_encode_gemm(emb, trained).count()
    else:
        n_codes_rows = pq_encode(emb, trained).count()
    t_encode = time.time() - t0

    probes = emb.filter(F.col("vec_id") < 100)
    t0 = time.time()
    n_bulk = pq_adc_knn_join(probes, emb, trained, k=10, gemm=gemm).count()
    t_bulk = time.time() - t0

    ine = inertia_gemm if gemm else inertia
    i_fixed = ine(emb, fixed)
    i_trained = ine(emb, trained)

    # recall@10 of trained-ADC vs exact L2 over 20 probes
    p20 = emb.filter(F.col("vec_id") < 20)
    adc = pq_adc_knn_join(p20, emb, trained, k=10, gemm=gemm)
    corpus = emb.select("vec_id", _as_double(F.col("embedding")).alias("ev"))
    pr = p20.select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("pv"),
    )
    d2 = (
        dot(F.col("ev"), F.col("ev"))
        - F.lit(2.0) * dot(F.col("ev"), F.col("pv"))
        + dot(F.col("pv"), F.col("pv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact_top = (
        corpus.crossJoin(F.broadcast(pr))
        .select("query_id", "vec_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id")
    )
    hits = adc.join(exact_top, ["query_id", "vec_id"], "inner").count()
    recall = hits / (20 * 10)

    # the production serving pattern: ADC shortlist (k=100) -> exact
    # rerank -> top-10; recall of THAT against brute force
    short = pq_adc_knn_join(p20, emb, trained, k=100, gemm=gemm).select(
        "query_id", "vec_id"
    )
    sc = short.join(corpus, "vec_id").join(
        F.broadcast(pr), "query_id"
    ).select("query_id", "vec_id", d2.alias("d2"))
    rr = (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id")
    )
    hits_rr = rr.join(exact_top, ["query_id", "vec_id"], "inner").count()
    recall_rr = hits_rr / (20 * 10)

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": d,
                "n_codes": n_codes,
                "m": m,
                "gemm": gemm,
                "fixed_codebook_s": round(t_fixed, 2),
                "train_2iter_s": round(t_train, 2),
                "encode_s": round(t_encode, 2),
                "encode_rows": n_codes_rows,
                "bulk_adc_100probes_s": round(t_bulk, 2),
                "bulk_rows": n_bulk,
                "inertia_fixed": round(i_fixed, 1),
                "inertia_trained": round(i_trained, 1),
                "inertia_ratio": round(i_trained / i_fixed, 4),
                "recall_at_10_trained": round(recall, 3),
                "recall_at_10_rerank100": round(recall_rr, 3),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
