"""Sharded inverted-index build probe (r13 verdict ask #8 done-criterion):
build the per-doc-shard + merge index over 1M synthetic docs and verify
the scale posture — per-shard reducers stay capped, the merge stage is
vocabulary-sized, and the sharded build's cost stays within a small
factor of the unsharded single-aggregate form (the price of the second,
vocabulary-sized shuffle).

Corpus: n docs x 60 tokens from a bounded 20k-word vocabulary (the
bpe_scale_probe corpus — deterministic, no RNG), so df per term is
~n*60/20000 (≈3000 at 1M docs), far past the 128-id posting cap: the
probe exercises exactly the stopword-guard regime where the cap matters.

Usage: python tools/invindex_scale_probe.py [n_docs ...]
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.text import (  # noqa: E402
    inverted_index_postings,
    inverted_index_sharded,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n: int):
    doc = F.col("id")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.concat(F.lit("w"), ((doc * 60 + j) % 20000).cast("string")),
    )
    return spark.range(0, n, 1, 32).select(
        doc.alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("invindex-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def _mat(df) -> None:
        # noop write: every output column is computed (count() would let
        # Catalyst prune the collect_list payload entirely, making the
        # unsharded side look ~free)
        df.write.format("noop").mode("overwrite").save()

    for n in sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        _mat(
            inverted_index_sharded(
                docs, n_doc_shards=8, n_term_shards=4, max_postings=128
            )
        )
        t_sharded = time.time() - t0
        sharded = inverted_index_sharded(
            docs, n_doc_shards=8, n_term_shards=4, max_postings=128
        )
        stats = sharded.agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.max("df").alias("max_df"),
            F.max("shards_with_term").alias("max_shards"),
            F.max(F.size(F.split("gap_list", ","))).alias("max_list_len"),
        ).collect()[0]
        n_terms = int(stats["n_terms"])
        t0 = time.time()
        _mat(inverted_index_postings(docs, max_postings=128))
        t_flat = time.time() - t0
        docs.unpersist()
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "n_terms": n_terms,
                    "max_df": int(stats["max_df"]),
                    "max_shards_with_term": int(stats["max_shards"]),
                    "max_posting_list_len": int(stats["max_list_len"]),
                    "t_sharded_sec": round(t_sharded, 2),
                    "t_unsharded_sec": round(t_flat, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
