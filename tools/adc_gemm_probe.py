"""A/B probe: fold-expression ADC scoring vs the Arrow/GEMM tier
(pq_adc_topk vs pq_adc_topk_gemm) over a synthetic clustered corpus —
the round-11 evidence line for SCALE.md (r10 verdict ask #8).

Both forms share the pinned id<8 codebook and the same top-k contract;
the probe asserts result equality, then times each serving pass.

Usage: python tools/adc_gemm_probe.py [n_vectors] [dim]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iiot_data_engineering_lab_assignment_spark.operators.similarity import (  # noqa: E402
    pq_adc_topk,
    pq_adc_topk_gemm,
    pq_codebook,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402
from tools.ann_probe import synth_embeddings  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("adc-gemm-probe")
    emb = synth_embeddings(spark, n, d, 8).select("vec_id", "embedding")
    emb.cache().count()  # exclude generation from both timings
    book = pq_codebook(emb, n_codes=8, m=4)

    t0 = time.time()
    fold = [tuple(r) for r in pq_adc_topk(emb, book, query_id=0, k=10).collect()]
    t_fold = time.time() - t0

    t0 = time.time()
    gemm = [tuple(r) for r in pq_adc_topk_gemm(emb, book, query_id=0, k=10).collect()]
    t_gemm = time.time() - t0

    assert gemm == fold, (gemm[:3], fold[:3])
    print(
        json.dumps(
            {
                "probe": "adc_gemm_ab",
                "n_vectors": n,
                "dim": d,
                "fold_sec": round(t_fold, 2),
                "gemm_sec": round(t_gemm, 2),
                "speedup": round(t_fold / t_gemm, 2),
                "topk_equal": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
