"""Dedup-cascade scale probe: build a deterministic synthetic corpus
(default 100k docs, ~20x the sf0.1 documents table) with injected exact
and near duplicates, then time each dedup tier.

Usage: python tools/dedup_scale_probe.py [n_docs]
Prints one JSON line with per-tier seconds and found-duplicate counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash_pairs,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

VOCAB = [
    "spark", "query", "join", "scan", "merge", "sort", "window", "stream",
    "batch", "row", "column", "table", "filter", "group", "value", "key",
    "data", "fast", "slow", "small", "large", "hash", "index", "cache",
    "shuffle", "broadcast", "partition", "cluster", "node", "task",
]


def synth_docs(spark, n: int):
    """Deterministic corpus: ~45-token docs; every 20th doc is an exact
    copy of its predecessor-of-2, every 20th+1 a near-dup (one appended
    token) of its predecessor."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ids = spark.range(0, n, 1, 32)
    base = (
        F.when(F.col("id") % 20 == 1, F.col("id") - 1)
        .when(F.col("id") % 20 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    length = (F.pmod(F.xxhash64(base), F.lit(30)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(base, i), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    text = F.concat_ws(" ", words)
    text = F.when(F.col("id") % 20 == 1, F.concat(text, F.lit(" extratoken"))).otherwise(text)
    return ids.select(F.col("id").alias("doc_id"), text.alias("text"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("dedup-probe")
    docs = synth_docs(spark, n)
    docs.write.mode("overwrite").parquet("/tmp/dedup_probe_docs")
    docs = spark.read.parquet("/tmp/dedup_probe_docs")

    out: dict = {"metric": "dedup_scale_probe", "n_docs": n, "tiers": {}}

    t0 = time.time()
    groups = exact_dedup_groups(docs)
    n_dup_groups = groups.filter(F.col("dup_count") > 1).count()
    out["tiers"]["exact"] = {"sec": round(time.time() - t0, 2), "dup_groups": n_dup_groups}

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5)
    n_pairs = pairs.count()
    out["tiers"]["minhash_lsh"] = {"sec": round(time.time() - t0, 2), "pairs": n_pairs}

    t0 = time.time()
    sh = simhash_pairs(docs, max_hamming=3)
    n_sh = sh.count()
    out["tiers"]["simhash"] = {"sec": round(time.time() - t0, 2), "pairs": n_sh}

    # Round-5 A/B: capped containment pair generation, array-combination
    # (one posting shuffle) vs posting self-join (two, no ReusedExchange).
    # Same cap, same output — only the physical strategy differs.
    from iiot_data_engineering_lab_assignment_spark.operators.dedup import (
        _cap_postings,
        _pair_common_counts,
        shingles,
    )

    def containment_common(capped_strategy: bool):
        post = _cap_postings(shingles(docs, 3), 50)
        sizes = post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        common = _pair_common_counts(post, "doc_id", capped=capped_strategy)
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
        return (
            common.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(F.col("common") / F.least("n_a", "n_b") >= 0.8)
        )

    for label, strat in (("containment_arrays", True), ("containment_selfjoin", False)):
        t0 = time.time()
        n_c = containment_common(strat).count()
        out["tiers"][label] = {"sec": round(time.time() - t0, 2), "pairs": n_c}

    # Round-5: record-linkage tier — prefix-blocked Levenshtein verify.
    # Block on the first 24 chars (~4 vocabulary words): the planted
    # exact/append near-dups share prefixes, so they land in one block
    # and verify at distance 0.  NOTE a SHORT prefix (8 chars ~ 1 word of
    # a 30-word vocabulary) would make blocks O(n/30) and the candidate
    # set quadratic — blocking-key selectivity is the scale knob.
    from iiot_data_engineering_lab_assignment_spark.operators.joins import fuzzy_block_join

    t0 = time.time()
    n_f = fuzzy_block_join(
        docs,
        block_on=F.substring("text", 1, 24),
        compare=F.substring("text", 1, 60),
        max_distance=6,
        id_col="doc_id",
    ).count()
    out["tiers"]["fuzzy_blocked"] = {"sec": round(time.time() - t0, 2), "pairs": n_f}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
