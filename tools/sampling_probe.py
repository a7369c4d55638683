"""Round-4 scale probes: deterministic-sampling throughput and the cost
of the md5 (oracle-reproducible) MinHash family vs the production
xxhash64 family at matched parameters.

Usage: python tools/sampling_probe.py [n_sample_rows] [n_docs]
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
    minhash_lsh_pairs,
    minhash_lsh_pairs_md5,
)
from iiot_data_engineering_lab_assignment_spark.operators.sampling import (  # noqa: E402
    train_val_test_split,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402
from tools.dedup_scale_probe import synth_docs  # noqa: E402


def t(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("sampling-probe")

    # 1. split/sample throughput: the md5-uniform is a pure codegen
    # expression over the scan - this measures rows/s of the whole
    # split+aggregate, no data written.
    ids = spark.range(0, n_rows, 1, 64).withColumnRenamed("id", "doc_id")
    sec_split, counts = t(
        lambda: dict(
            train_val_test_split(ids).groupBy("split").count().collect()
        )
    )

    # 2. hash-family cost at MATCHED parameters (16 hashes, 4 bands):
    # string-min md5 vs long-min xxhash64, identical plan shape.
    docs = synth_docs(spark, n_docs)
    docs.write.mode("overwrite").parquet("/tmp/sampling_probe_docs")
    docs = spark.read.parquet("/tmp/sampling_probe_docs")
    sec_xx, n_xx = t(
        lambda: minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, n=3, threshold=0.4
        ).count()
    )
    sec_md5, n_md5 = t(
        lambda: minhash_lsh_pairs_md5(
            docs, num_hashes=16, bands=4, n=3, threshold=0.4
        ).count()
    )

    print(
        json.dumps(
            {
                "split_rows": n_rows,
                "split_sec": sec_split,
                "split_rows_per_sec": int(n_rows / sec_split),
                "split_counts": counts,
                "lsh_docs": n_docs,
                "lsh_xxhash64_sec": sec_xx,
                "lsh_xxhash64_pairs": n_xx,
                "lsh_md5_sec": sec_md5,
                "lsh_md5_pairs": n_md5,
                "md5_overhead_x": round(sec_md5 / sec_xx, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
