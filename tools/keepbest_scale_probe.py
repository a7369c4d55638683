"""Keep-best pipeline scale probe (r5 verdict ask #3): 1M docs with a
PLANTED POWER-LAW duplicate-cluster distribution — one giant 1000-member
cluster, a 100-member tier, a 10-member tier, a pair tier, and a long
singleton tail — the cluster-size shape real web corpora show.

Measures, end to end, for BOTH candidate tiers feeding the keep-best
selection:

* capped Jaccard (df <= 50; the r6-registered form): candidate count
  must stay linear in corpus size, and clusters with more members than
  the df cap are — by design — invisible to this tier (every shingle
  they share is hotter than the cap).  The probe MEASURES that recall
  boundary instead of hand-waving it.
* MinHash-LSH (df-independent banding): the giant cluster must collapse
  into ONE component; records connected-components rounds to
  convergence and wall time of the full cluster -> quality -> argmax
  pipeline.

Usage: python tools/keepbest_scale_probe.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    connected_components,
    jaccard_pairs,
    keep_best,
    minhash_lsh_pairs,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

VOCAB = [
    "spark", "query", "join", "scan", "merge", "sort", "window", "stream",
    "batch", "row", "column", "table", "filter", "group", "value", "key",
    "data", "fast", "slow", "small", "large", "hash", "index", "cache",
    "shuffle", "broadcast", "partition", "cluster", "node", "task",
]

# planted tiers: (first_id_exclusive_bound, cluster_size); ids below the
# first bound belong to the giant cluster, etc.  Beyond the last bound:
# every doc is a singleton.
GIANT = 1_000          # ids [0, 1000)            -> 1 cluster of 1000
HUNDREDS = 20          # ids [1000, 3000)          -> 20 clusters of 100
TENS = 1_000           # ids [3000, 13000)         -> 1000 clusters of 10
PAIRS = 50_000         # ids [13000, 113000)       -> 50k clusters of 2


def cluster_of(id_col):
    """Deterministic power-law cluster assignment (pure expressions)."""
    i = F.col(id_col)
    return (
        F.when(i < GIANT, F.lit(0))
        .when(i < GIANT + 100 * HUNDREDS, 1 + F.floor((i - GIANT) / 100))
        .when(
            i < GIANT + 100 * HUNDREDS + 10 * TENS,
            1 + HUNDREDS + F.floor((i - GIANT - 100 * HUNDREDS) / 10),
        )
        .when(
            i < GIANT + 100 * HUNDREDS + 10 * TENS + 2 * PAIRS,
            1
            + HUNDREDS
            + TENS
            + F.floor((i - GIANT - 100 * HUNDREDS - 10 * TENS) / 2),
        )
        .otherwise(1 + HUNDREDS + TENS + PAIRS + i)  # singleton tail
    ).cast("long")


def synth_docs(spark, n: int):
    """~40-token docs; cluster members share a cluster-seeded base text
    plus one member-unique token (jaccard within cluster >> 0.4).

    Token space is ~600k distinct words (30 stems x 20k hash suffixes) so
    cross-cluster shingle collisions are rare, like a natural-language
    corpus — a cluster-shared shingle's document frequency then equals
    the cluster size, which is exactly what makes the df-cap's recall
    boundary measurable: clusters larger than the cap share only
    shingles hotter than the cap."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ids = spark.range(0, n, 1, 32)
    c = cluster_of("id")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.element_at(
                vocab, (F.pmod(F.xxhash64(c, i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
            F.lit("_"),
            F.pmod(F.xxhash64(c, i, F.lit(7)), F.lit(20_000)),
        ),
    )
    text = F.concat_ws(
        " ", F.concat_ws(" ", words), F.concat(F.lit("uniq"), F.col("id"))
    )
    return ids.select(
        F.col("id").alias("doc_id"), c.alias("true_cluster"), text.alias("text")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("keepbest-probe")
    path = "/tmp/keepbest_probe_docs"
    synth_docs(spark, n).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    out: dict = {"metric": "keepbest_scale_probe", "n_docs": n, "unit": "sec"}

    # --- tier A: capped Jaccard (the registered near_dup/keep_best form)
    t0 = time.time()
    cand = jaccard_pairs(docs, n=3, threshold=0.4, max_shingle_df=50)
    n_cand = cand.count()
    out["jaccard_capped_candidates"] = n_cand
    out["jaccard_capped_sec"] = round(time.time() - t0, 2)
    # clusters whose size exceeds the df cap share only hot shingles ->
    # invisible to this tier (measured recall boundary, by design)
    t0 = time.time()
    stats_a: dict = {}
    kept_a = keep_best(docs, cand, cc_stats=stats_a)
    out["keepbest_capped_kept"] = kept_a.count()
    out["keepbest_capped_sec"] = round(time.time() - t0, 2)
    out["keepbest_capped_cc_rounds"] = stats_a.get("rounds")

    # --- tier B: MinHash-LSH candidates (df-independent; the tier that
    # DOES see the giant cluster) -> CC -> keep-best
    t0 = time.time()
    lsh = minhash_lsh_pairs(docs, threshold=0.4, num_hashes=64, bands=16)
    out["lsh_pairs"] = lsh.count()
    out["lsh_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    stats_b: dict = {}
    kept_b = keep_best(docs, lsh, cc_stats=stats_b)
    out["keepbest_lsh_kept"] = kept_b.count()
    out["keepbest_lsh_sec"] = round(time.time() - t0, 2)
    out["keepbest_lsh_cc_rounds"] = stats_b.get("rounds")
    out["keepbest_lsh_converged"] = stats_b.get("converged")

    # giant-cluster check: the 1000 planted members of cluster 0 must
    # collapse to ONE kept doc under the LSH tier
    cc_stats: dict = {}
    cc = connected_components(lsh, stats=cc_stats).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    giant = (
        docs.filter(F.col("true_cluster") == 0)
        .join(cc, "doc_id")
        .select("component")
        .distinct()
        .count()
    )
    out["giant_cluster_components"] = giant  # 1 == fully collapsed
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
