"""Duplicated-span-coverage scale probe: synthetic corpus with planted
cross-document passages, verifying exact coverage counts and timing the
operator at probe scale.

Corpus design (all deterministic, no RNG):
* 60 tokens per doc; filler tokens are globally unique ("t<id*997+j>"),
  so NO accidental 5-gram ever repeats — every covered token is planted.
* every 10th doc embeds one of 100 rotating 12-token passages at
  positions 20..31 (each passage lands in n/1000 docs);
* every 100th+7 doc embeds THE SAME hot 12-token passage at positions
  40..51 (n/100 docs share it) — the ubiquitous-gram stress case: the
  doc-frequency aggregate sees one key with df = n/100, but because the
  operator never generates pairs, cost stays linear (contrast with the
  posting-list self-join this corpus would detonate).

Expected exact output: covered_tokens = 12 for planted docs (the 8
interior 5-gram starts union to the 12-token span), 0 for clean docs.

Usage: python tools/span_probe.py [n_docs ...]
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    duplicated_span_coverage,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n: int):
    ids = spark.range(0, n, 1, 32)
    doc = F.col("id")
    passage_idx = F.pmod(doc / 10, F.lit(100)).cast("long")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.when(
            (doc % 10 == 0) & (j >= 20) & (j < 32),
            F.concat(F.lit("p"), passage_idx, F.lit("_"), (j - 20).cast("string")),
        )
        .when(
            (doc % 100 == 7) & (j >= 40) & (j < 52),
            F.concat(F.lit("h"), (j - 40).cast("string")),
        )
        .otherwise(F.concat(F.lit("t"), (doc * 997 + j).cast("string"))),
    )
    return ids.select(doc.alias("doc_id"), F.concat_ws(" ", words).alias("text"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    for n in sizes:
        # Each of the 100 rotating passages recurs every 1000 docs; below
        # 2000 docs some passages have df = 1 and are (correctly) not
        # flagged, so the exact-histogram assertion would misfire.
        if n < 2000:
            raise SystemExit(f"corpus size must be >= 2000 (got {n})")
    spark = get_spark("span-probe")
    for n in sizes:
        path = "/tmp/span_probe_docs"
        synth_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        t0 = time.time()
        dist = (
            duplicated_span_coverage(docs, n=5)
            .groupBy("covered_tokens")
            .count()
            .collect()
        )
        elapsed = time.time() - t0
        got = {int(r["covered_tokens"]): int(r["count"]) for r in dist}
        # i % 100 == 7 implies i % 10 == 7 != 0: the two plant sets are
        # disjoint.  Counts in [0, n): ceil(n/10) ids = 0 mod 10,
        # floor((n+92)/100) ids = 7 mod 100 — exact for ANY n, not just
        # multiples of 10 (r6 review finding).
        planted = (n + 9) // 10 + (n + 92) // 100
        expect = {12: planted, 0: n - planted}
        ok = got == expect
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "seconds": round(elapsed, 2),
                    "coverage_histogram": {str(k): v for k, v in sorted(got.items())},
                    "exact_expected": ok,
                }
            ),
            flush=True,
        )
        assert ok, f"coverage mismatch: got {got}, expected {expect}"
    spark.stop()


if __name__ == "__main__":
    main()
