"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is fully materialized via a noop-format write — unlike a
count() action, the noop sink forces EVERY output column to be computed
(count() lets Catalyst prune the payload of map-only plans, which would
make map-heavy timings measure a row count instead of the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iiot_data_engineering_lab_assignment_spark import registry  # noqa: E402
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

#: The headline set: the flagship IIoT rollups plus the heaviest
#: representative of each operator family (scan-agg, join, window,
#: dedup, similarity, text, streaming).
HEADLINE = [
    "sensor_rollup_1m",
    "sliding_rollup_1m_30s",
    "session_rollup_5m",
    "q1_pricing_summary",
    "customer_order_revenue",
    "order_lineitem_join_agg",
    "rank_orders_per_customer",
    "dedup_exact_fingerprint",
    "minhash_lsh_pairs",
    "cosine_topk",
    "cosine_dup_pairs_blocked",
    "asof_join_purchase_click",
    "tfidf_top_terms",
    "text_stats_per_doc",
    "stream_tumbling_1m",
    "stream_session_5m",
    "gapfill_locf_daily",
    "zscore_anomalies",
    "q18_large_volume_customers",
]


def _materialize(df) -> None:
    """Execute the full plan with every output column computed: the noop
    sink consumes all columns, so Catalyst cannot prune the payload the
    way it can under count()."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    # Warm the three execution paths once so per-query numbers measure the
    # engine at steady state, not first-call class loading: JVM codegen,
    # the Python (Arrow/pandas) worker pool, and the streaming machinery.
    _materialize(registry.QUERIES["events_passthrough"].fn(spark, sf_dir))
    _materialize(
        spark.createDataFrame([(0, 1.0)], "k long, v double").groupBy("k").applyInPandas(
            lambda pdf: pdf, "k long, v double"
        )
    )
    _materialize(registry.QUERIES["stream_tumbling_1m"].fn(spark, "/root/testdata/sf0.001"))

    # min of 2 runs per query: the environment is shared, and a single
    # noisy run misrepresents the engine; min is the standard
    # steady-state estimator for warm benchmarks
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _materialize(spec.fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
