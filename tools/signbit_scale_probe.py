"""Scale probe for the sign-bit Hamming retrieval tier
(`operators/similarity.py:signbit_topk`): does the claimed 16x scan
advantage materialize once the packed words are stored at ingest, and
what recall does the Hamming shortlist actually deliver?

Layout mirrors production: TWO parquet tables written once —
`vecs(vec_id, embedding float[])` (the 100 TB side) and
`packed(vec_id, w0, w1)` (16 B/vector, the ingest-time materialization
the registry query computes inline).  Probes:

* exact: brute-force cosine top-10 scanning the FLOAT table — the
  baseline every query pays without the tier.
* hamming: Hamming top-`shortlist` scanning ONLY the packed table
  (bit_count(xor) on two long columns inside codegen).
* rerank: the end-to-end tier — packed scan shortlist, then an id
  semi-join back into the float table for the exact re-rank.  Honest
  caveat: in this flat-parquet probe the re-rank leg re-SCANS the float
  table with an isin filter (row-group pruning only); a production
  deployment re-ranks via a row-addressable store (or sorts the float
  table by vec_id so pruning is exact), so `rerank` here is an UPPER
  bound on the tier's cost.
* recall@10 of the shortlist vs the exact top-10, at shortlist 50 and
  200 — 5 planted near-duplicates of the query make the exact top-10
  non-degenerate; the rest of the corpus is hash-uniform (the
  near-orthogonal regime where sign bits are weakest, so this is a
  floor, not a showcase).

Usage: python tools/signbit_scale_probe.py [n_vectors] (default 10M)
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

from iiot_data_engineering_lab_assignment_spark.operators.similarity import (  # noqa: E402
    _as_double,
    dot,
    l2_norm,
    signbit_pack,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

DIM = 64
ROOT = "/tmp/signbit_probe"


def synth_vecs(spark, n: int):
    """n hash-deterministic vectors in [-1, 1]^64; ids 1..5 are the
    query (id 0) plus a perturbation that flips ~3 dims' magnitudes."""
    base = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id") * 0 + F.lit(7), i), F.lit(2001)) - 1000)
            / 1000.0
        ),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: F.when(
            F.pmod(F.xxhash64("id", i), F.lit(20)) == 0,
            (F.pmod(F.xxhash64("id", i, F.lit(3)), F.lit(400)) - 200) / 1000.0,
        ).otherwise(F.lit(0.0)),
    )
    rand = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (F.pmod(F.xxhash64("id", i), F.lit(2001)) - 1000) / 1000.0,
    )
    emb = F.when(
        F.col("id") <= 5, F.zip_with(base, noise, lambda b, nz: b + nz)
    ).otherwise(rand)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(emb, lambda x: x.cast("float")).alias("embedding"),
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("signbit-probe")
    out: dict = {"metric": "signbit_scale_probe", "unit": "sec", "n_vectors": n}

    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.time()
    vecs = synth_vecs(spark, n)
    vecs.write.parquet(f"{ROOT}/vecs")
    v = spark.read.parquet(f"{ROOT}/vecs")
    v.select(
        "vec_id",
        signbit_pack(F.col("embedding"), 0, 32).alias("w0"),
        signbit_pack(F.col("embedding"), 32, 32).alias("w1"),
    ).write.parquet(f"{ROOT}/packed")
    out["build_s"] = round(time.time() - t0, 1)
    out["vecs_mb"] = round(
        sum(
            os.path.getsize(os.path.join(f"{ROOT}/vecs", f))
            for f in os.listdir(f"{ROOT}/vecs")
        )
        / 1e6,
        1,
    )
    out["packed_mb"] = round(
        sum(
            os.path.getsize(os.path.join(f"{ROOT}/packed", f))
            for f in os.listdir(f"{ROOT}/packed")
        )
        / 1e6,
        1,
    )

    vecs = spark.read.parquet(f"{ROOT}/vecs")
    packed = spark.read.parquet(f"{ROOT}/packed")
    qrow = vecs.filter(F.col("vec_id") == 0).head()
    qvec = [float(x) for x in qrow["embedding"]]
    qw = packed.filter(F.col("vec_id") == 0).head()

    # exact baseline: full float scan
    e = _as_double(F.col("embedding"))
    q = F.array(*[F.lit(x) for x in qvec])
    cos = dot(e, q) / (l2_norm(e) * l2_norm(F.transform(q, lambda x: x)))
    t0 = time.time()
    exact = (
        vecs.filter(F.col("vec_id") != 0)
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    out["exact_scan_s"] = round(time.time() - t0, 2)
    exact_ids = {r["vec_id"] for r in exact}

    # hamming shortlist: packed-table scan only
    ham = F.bit_count(F.col("w0").bitwiseXOR(F.lit(qw["w0"]))) + F.bit_count(
        F.col("w1").bitwiseXOR(F.lit(qw["w1"]))
    )
    shortlists = {}
    for sl in (50, 200):
        t0 = time.time()
        rows = (
            packed.filter(F.col("vec_id") != 0)
            .select("vec_id", ham.alias("hamming"))
            .orderBy(F.asc("hamming"), F.asc("vec_id"))
            .limit(sl)
            .collect()
        )
        out[f"hamming_scan_s_sl{sl}"] = round(time.time() - t0, 2)
        shortlists[sl] = [r["vec_id"] for r in rows]
        out[f"recall_at_10_sl{sl}"] = round(
            len(exact_ids & set(shortlists[sl])) / 10.0, 2
        )
        # the recall that matters: are the GENUINELY similar vectors
        # (the planted near-duplicates, cosine >> noise) recovered?
        # Exact-top-10 slots beyond them are noise-level cosines
        # (~1/sqrt(d) over a uniform corpus) no sign bit can rank.
        out[f"planted_recall_sl{sl}"] = round(
            len({1, 2, 3, 4, 5} & set(shortlists[sl])) / 5.0, 2
        )

    # end-to-end: shortlist + isin re-rank against the float table
    t0 = time.time()
    ids = shortlists[200]
    rer = (
        vecs.filter(F.col("vec_id").isin(ids))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    out["rerank_s_sl200"] = round(time.time() - t0, 2)
    out["rerank_top10_matches_exact"] = [r["vec_id"] for r in rer[:10]] == [
        r["vec_id"] for r in exact
    ] or len(exact_ids & {r["vec_id"] for r in rer}) >= 9

    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
