"""Deep BPE-trainer probe (r13 verdict ask #4): run the trainer far past
the registered 2-merge unroll and measure what the "re-persist every ~8
merges" policy actually buys — per-iteration wall-clock and
optimized-plan size, with and without the lineage checkpoint.

Two arms over the same deterministic corpus (bpe_scale_probe's bounded
20k-word vocabulary):

* checkpointed: n_merges=64, repersist_every=4 — the policy as shipped;
  per-iteration time must stay flat through all 64 merges.
* unchecked:    n_merges=8, repersist_every=0 — the counterfactual;
  each iteration re-executes every prior fold and the nested-fold
  codegen turns superlinear past depth ~5 (measured 22.7 s at depth 7,
  which is why this arm is capped at 8 merges — and why the r13
  docstring's "every ~8" guidance was corrected to every 4).

Usage: python tools/bpe_deep_probe.py [n_docs]
Prints one JSON line per arm with the per-iteration series.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.text import (  # noqa: E402
    bpe_learned_merges,
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(
        "bpe-deep-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n).persist()
    docs.count()
    for label, merges, every in (
        ("checkpoint_every_4", 64, 4),
        ("no_checkpoint", 8, 0),
    ):
        stats: list[dict] = []
        got = bpe_learned_merges(
            docs, n_merges=merges, repersist_every=every, iter_stats=stats
        ).collect()
        print(
            json.dumps(
                {
                    "arm": label,
                    "n_docs": n,
                    "n_merges_requested": merges,
                    "n_merges_learned": len(got),
                    "iter_sec": [s["iter_sec"] for s in stats],
                    "plan_chars": [s["plan_chars"] for s in stats],
                    "total_sec": round(sum(s["iter_sec"] for s in stats), 2),
                }
            ),
            flush=True,
        )
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
