"""Measure the streaming-dedup store-mode win: per-batch wall clock in
text mode (every batch re-hashes ALL history text) vs store mode (the
writer maintains the signature store; history text never re-read).

Feeds N identical-sized micro-batches of fresh docs through
incremental_dedup_stream_writer in each mode and prints both per-batch
time series — text mode grows with accumulated history, store mode's
hashing cost stays flat (its growth is only the store-read, ~16 bytes a
shingle vs re-hashing full text).

Usage: python tools/stream_store_probe.py [n_batches] [batch_docs] [modes] [num_hashes]
``modes`` is a comma list from {text, store, bucketed} (default all
three); ``bucketed`` maintains the store as batch_id-partitioned
bucketed catalog tables (r8) — the layout that removes the unbucketed
store's per-batch store-side shuffle.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402
from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (  # noqa: E402
    incremental_dedup_stream_writer,
)

VOCAB = [
    "spark", "query", "join", "scan", "merge", "sort", "window", "stream",
    "batch", "row", "column", "table", "filter", "group", "value", "key",
]


def batch_docs_df(spark, start: int, count: int):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.element_at(vocab, (F.pmod(F.xxhash64("id", i), F.lit(len(VOCAB))) + 1).cast("int")),
            F.lit("_"),
            F.pmod(F.xxhash64("id", i, F.lit(7)), F.lit(20_000)),
        ),
    )
    return spark.range(start, start + count, 1, 16).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    modes = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["text", "store", "bucketed"]
    )
    bad = [m for m in modes if m not in ("text", "store", "bucketed")]
    if bad:
        # fail fast: a typo'd mode would otherwise fall through to the
        # text-mode kwargs and record text numbers under the wrong label
        raise SystemExit(f"unknown mode(s) {bad}; choose from text,store,bucketed")
    num_hashes = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    spark = get_spark("stream-store-probe")
    out: dict = {
        "metric": "stream_store_probe",
        "unit": "sec",
        "n_batches": n_batches,
        "batch_docs": batch_docs,
        "num_hashes": num_hashes,
    }
    for mode in modes:
        root = f"/tmp/stream_store_probe_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        if mode == "store":
            kw = {"store_dir": f"{root}/store"}
        elif mode == "bucketed":
            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            for part in ("fp", "post", "buck"):
                spark.sql(f"DROP TABLE IF EXISTS probe_bstore_{part}")
                # a PREVIOUS session's table dies with its in-memory
                # catalog but leaves the warehouse dir -> saveAsTable
                # would fail with LOCATION_ALREADY_EXISTS
                shutil.rmtree(
                    os.path.join(wh, f"probe_bstore_{part}"), ignore_errors=True
                )
            kw = {"bucketed_store_prefix": "probe_bstore", "store_buckets": 16}
        else:
            kw = {}
        write = incremental_dedup_stream_writer(
            f"{root}/hist", f"{root}/dups", num_hashes=num_hashes, **kw
        )
        times = []
        for b in range(n_batches):
            df = batch_docs_df(spark, b * batch_docs, batch_docs)
            t0 = time.time()
            write(df, b)
            times.append(round(time.time() - t0, 2))
        out[f"{mode}_per_batch"] = times
        out[f"{mode}_total"] = round(sum(times), 2)
    # growth ratio of the LAST batch over the second batch (first batch
    # has no history in either mode)
    for mode in modes:
        t = out[f"{mode}_per_batch"]
        out[f"{mode}_growth"] = round(t[-1] / max(t[1], 0.01), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
