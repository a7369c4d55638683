"""Composed-curation dress rehearsal (r14 verdict ask #2): run the full
six-stage curation_e2e pipeline — span dedup -> quality gate ->
fingerprint dedup -> LSH keep-best -> leakage-safe split -> per-split
token-budget shards — as ONE job over a deterministic synthetic corpus,
recording PER-STAGE wall seconds, output rows, shuffle read/write bytes
(Spark UI REST API, stage-total diff between stage boundaries), and the
peak single-task shuffle write (the straggler observable).

Every stage is individually probed at scale elsewhere (SCALE.md rounds
6-14); this probe measures the COMPOSITION — where skew, spill, and
lineage interact.  Two runs: staged (persist + count at each boundary,
the checkpoint-boundary production shape) and fused (one lazy plan,
Catalyst fuses adjacent narrow stages) for the total-wall comparison.

Usage: python tools/curation_e2e_probe.py [n_docs]   (default 1_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    curation_e2e,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

VOCAB = [
    "spark", "query", "join", "scan", "merge", "sort", "window", "stream",
    "batch", "row", "column", "table", "filter", "group", "value", "key",
    "data", "fast", "slow", "small", "large", "hash", "index", "cache",
    "shuffle", "broadcast", "partition", "cluster", "node", "task",
]

#: 55-token boilerplate appended to every 7th doc — long enough for the
#: k=8 / min_span=50 span-dedup operating point to fire on every copy
#: after the corpus-wide first occurrence.
BOILER = " ".join(VOCAB[(i * 7) % len(VOCAB)] for i in range(55))


def synth_docs(spark, n: int):
    """Deterministic corpus with work for every stage: ~40-70 token body
    (xxhash64-driven); every 20th doc an exact copy of its
    predecessor-of-2 (fingerprint dedup), every 20th+1 a near-dup with
    one appended token (LSH keep-best + leakage components); every 7th
    doc carries the shared BOILER span (span removal); every 23rd doc a
    5-token stub that fails the quality gate."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ids = spark.range(0, n, 1, 32)
    base = (
        F.when(F.col("id") % 20 == 1, F.col("id") - 1)
        .when(F.col("id") % 20 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    length = F.when(F.col("id") % 23 == 3, F.lit(5)).otherwise(
        (F.pmod(F.xxhash64(base), F.lit(30)) + 40).cast("int")
    )
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(base, i), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        F.col("id") % 20 == 1, F.concat(text, F.lit(" extratoken"))
    ).otherwise(text)
    text = F.when(
        F.col("id") % 7 == 5, F.concat(text, F.lit(" " + BOILER))
    ).otherwise(text)
    return ids.select(F.col("id").alias("doc_id"), text.alias("text"))


class StageMeter:
    """Per-boundary wall/rows/shuffle accounting via the UI REST API."""

    def __init__(self, spark):
        self.spark = spark
        self.url = spark.sparkContext.uiWebUrl
        self.app = spark.sparkContext.applicationId
        self.seen: set[int] = set()
        self.t0 = time.time()
        self.records: list[dict] = []

    def _stages(self):
        with urllib.request.urlopen(
            f"{self.url}/api/v1/applications/{self.app}/stages?status=complete"
        ) as r:
            return json.load(r)

    def _peak_task_write(self, stage_id: int, attempt: int) -> float:
        try:
            with urllib.request.urlopen(
                f"{self.url}/api/v1/applications/{self.app}/stages/"
                f"{stage_id}/{attempt}/taskSummary?quantiles=1.0"
            ) as r:
                ts = json.load(r)
            return float(ts["shuffleWriteMetrics"]["writeBytes"][0])
        except Exception:
            return 0.0

    def hook(self, name, df):
        df = df.persist()
        rows = df.count()
        wall = time.time() - self.t0
        new = [s for s in self._stages() if s["stageId"] not in self.seen]
        self.seen.update(s["stageId"] for s in new)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        peak = 0.0
        if new:
            heavy = max(new, key=lambda s: s.get("shuffleWriteBytes", 0))
            if heavy.get("shuffleWriteBytes", 0) > 0:
                peak = self._peak_task_write(
                    heavy["stageId"], heavy.get("attemptId", 0)
                )
        self.records.append(
            {
                "stage": name,
                "wall_s": round(wall, 2),
                "rows": rows,
                "shuffle_write_mb": round(sw / 1e6, 2),
                "shuffle_read_mb": round(sr / 1e6, 2),
                "peak_task_shuffle_write_mb": round(peak / 1e6, 3),
                "n_spark_stages": len(new),
            }
        )
        self.t0 = time.time()
        return df


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        "curation-e2e-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "8000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = "/tmp/curation_e2e_docs"
    synth_docs(spark, n).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)

    meter = StageMeter(spark)
    t_all = time.time()
    out = curation_e2e(docs, stage_hook=meter.hook)
    final_rows = out.count()
    staged_wall = time.time() - t_all

    splits = {
        r["split"]: (r["cnt"], r["shards"])
        for r in out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("shard_id") + 1).alias("shards"),
        )
        .collect()
    }
    spark.catalog.clearCache()

    t_f = time.time()
    fused_rows = curation_e2e(docs).count()
    fused_wall = time.time() - t_f

    print(
        json.dumps(
            {
                "metric": "curation_e2e_probe",
                "n_docs": n,
                "survivors": final_rows,
                "fused_rows_match": fused_rows == final_rows,
                "staged_wall_s": round(staged_wall, 1),
                "fused_wall_s": round(fused_wall, 1),
                "splits": splits,
                "stages": meter.records,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
