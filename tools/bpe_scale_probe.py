"""BPE-trainer / inverted-index scale probe: validate the vocabulary
factoring at corpus scale — pair counting and merge learning must cost
O(vocab), not O(corpus), once the word-frequency table is built, and
the index build must stay a single term-keyed aggregate under the
posting cap.

Corpus: n docs x 60 tokens from a BOUNDED 20k-word vocabulary
(token k = "w" || (doc*60+j) % 20000 — deterministic, no RNG), so at
1M docs the corpus is 60M tokens while the trainer's pair stage sees
20k distinct words.  Measured per size: corpus tokens, vocab size,
bpe_pair_counts wall-clock, bpe_learned_merges (2 merges) wall-clock,
inverted_index_postings wall-clock + output terms.

Usage: python tools/bpe_scale_probe.py [n_docs ...]
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
    bpe_learned_merges,
    bpe_pair_counts,
    inverted_index_postings,
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
    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        vocab = docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().count()
        t0 = time.time()
        pairs = bpe_pair_counts(docs, top_k=50)
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        t0 = time.time()
        merges = bpe_learned_merges(docs, n_merges=2).collect()
        t_train = time.time() - t0
        t0 = time.time()
        idx = inverted_index_postings(docs, max_postings=128)
        n_terms = idx.count()
        t_index = time.time() - t0
        docs.unpersist()
        print(
            json.dumps(
                {
                    "docs": n,
                    "corpus_tokens": n * 60,
                    "vocab": vocab,
                    "pair_count_s": round(t_pairs, 1),
                    "top_pairs": n_pairs,
                    "train_2merges_s": round(t_train, 1),
                    "merges": [[m["left_sym"], m["right_sym"]] for m in merges],
                    "index_terms": n_terms,
                    "index_s": round(t_index, 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
