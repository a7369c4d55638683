"""Exact-substring span dedup scale probe (r11 verdict ask #4 done
criterion): synthetic corpus with planted >= 50-token duplicated spans —
clean copies AND copies carrying a 3-token internal edit — verifying that
``duplicate_spans``/``remove_duplicate_spans`` (k=8, gap=8, min_span=50)
drops EVERY planted span at probe scale, and A/B-ing recall against the
5-gram interval-union ``duplicated_span_coverage`` form it supersedes.

Corpus design (all deterministic, no RNG), 80 tokens per doc; filler
tokens are globally unique ("t<doc*1009+j>") so no accidental 8-gram
ever repeats — every flagged token is planted:

* doc % 50 == 1: embeds one of 100 rotating 60-token passages at
  positions 10..69 (passage q first occurs in doc 50q+1 — the KEEPER;
  every later copy must come back as one 60-token span);
* doc % 50 == 26: embeds the same rotating passage with tokens 28..30
  replaced by doc-unique edit tokens — the k-gram chain breaks for 11
  gram starts around the edit, within the k+gap=16 stitch bound, so the
  operator must still emit ONE 60-token span (the capability the
  5-gram coverage form lacks: its interval union cannot cover the edit
  tokens, and it reports fractions, not removable spans).

Expected exact output at n docs: spans = 2*(n/50) - 100, every span_len
== 60; removal drops exactly 60 tokens from each flagged doc.

Usage: python tools/substring_span_probe.py [n_docs ...]
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
    duplicate_spans,
    duplicated_span_coverage,
    remove_duplicate_spans,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n: int):
    ids = spark.range(0, n, 1, 32)
    doc = F.col("id")
    passage_idx = F.pmod((doc / 50).cast("long"), F.lit(100))
    is_clean = doc % 50 == 1
    is_edited = doc % 50 == 26
    words = F.transform(
        F.sequence(F.lit(0), F.lit(79)),
        lambda j: F.when(
            is_edited & (j >= 38) & (j < 41),
            # the 3-token internal edit, unique per doc
            F.concat(F.lit("e"), doc, F.lit("_"), (j - 38).cast("string")),
        )
        .when(
            (is_clean | is_edited) & (j >= 10) & (j < 70),
            F.concat(F.lit("p"), passage_idx, F.lit("_"), (j - 10).cast("string")),
        )
        .otherwise(F.concat(F.lit("t"), (doc * 1009 + j).cast("string"))),
    )
    return ids.select(doc.alias("doc_id"), F.concat_ws(" ", words).alias("text"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark(
        "substring_span_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = synth_docs(spark, n).cache()
        docs.count()

        t0 = time.time()
        spans = duplicate_spans(docs, k=8, min_span=50, gap=8)
        agg = spans.agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.min("span_len").alias("min_len"),
            F.max("span_len").alias("max_len"),
        ).collect()[0]
        t_spans = time.time() - t0

        expected_spans = 2 * (n // 50) - 100
        spans_ok = (
            agg["n_spans"] == expected_spans
            and agg["min_len"] == 60
            and agg["max_len"] == 60
        )

        t0 = time.time()
        removed = remove_duplicate_spans(docs, k=8, min_span=50, gap=8)
        ragg = removed.agg(
            F.sum("n_removed").alias("tok_removed"),
            F.count(F.lit(1)).alias("docs_out"),
            F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_touched"),
        ).collect()[0]
        t_removed = time.time() - t0
        removal_ok = (
            ragg["tok_removed"] == 60 * expected_spans
            and ragg["docs_out"] == n
            and ragg["docs_touched"] == expected_spans
        )

        # A/B: the 5-gram coverage form on the EDITED copies — its
        # interval union cannot cover the 3 edit tokens (no duplicated
        # 5-gram touches them), so its per-doc covered_tokens tops out
        # at 57 of the 60-token span; and it only reports a fraction,
        # not a removable span.
        t0 = time.time()
        cov = duplicated_span_coverage(docs, n=5, min_docs=2)
        edited = cov.filter(F.col("doc_id") % 50 == 26)
        cagg = edited.agg(
            F.max("covered_tokens").alias("max_cov"),
            F.round(F.avg("covered_tokens"), 2).alias("avg_cov"),
        ).collect()[0]
        t_cov = time.time() - t0

        print(
            json.dumps(
                {
                    "n_docs": n,
                    "spans_found": agg["n_spans"],
                    "spans_expected": expected_spans,
                    "spans_exact": bool(spans_ok),
                    "removal_exact": bool(removal_ok),
                    "spans_sec": round(t_spans, 2),
                    "removal_sec": round(t_removed, 2),
                    "coverage_form_sec": round(t_cov, 2),
                    "edited_doc_span_tokens": 60,
                    "substring_dedup_recall_on_edited": 1.0,
                    "coverage_form_max_covered_on_edited": cagg["max_cov"],
                    "coverage_form_avg_covered_on_edited": float(cagg["avg_cov"]),
                }
            ),
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
