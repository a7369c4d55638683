"""A/B probe: PageRank iterations over repartition+localCheckpoint-pinned
edges vs a bucketed(src) catalog edge table — the round-11 evidence line
for SCALE.md (r10 verdict ask #5).

Synthetic bipartite supplier->customer graph: n_src suppliers, each with
`fanout` distinct customer edges (power-law-ish via modular striding).
Both variants run the identical 3-round damped loop; the probe reports
build time separately from iteration time (the build is paid once and
amortized over every nightly run — the 100 TB operating shape).

Usage: python tools/pagerank_bucketed_probe.py [n_src] [fanout]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def synth_edges(spark, n_src: int, fanout: int):
    e = (
        spark.range(0, n_src * fanout, 1, 64)
        .select(
            F.concat(F.lit("s"), (F.col("id") % n_src)).alias("src"),
            F.concat(
                F.lit("c"),
                ((F.col("id") * 2654435761) % (n_src * 4)),
            ).alias("dst"),
        )
        .distinct()
    )
    return e


def run_iterations(spark, edges, n_rounds: int = 3):
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = float(nodes.count())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    pr = nodes.select("node", (F.lit(1.0) / F.lit(n_nodes)).alias("pr"))
    for _ in range(n_rounds):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(
                F.sum((F.col("pr") / F.col("outdeg")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(0.15) / F.lit(n_nodes)
                + F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("pr"),
        )
    return [
        (r["node"], r["pagerank"])
        for r in pr.select(
            "node",
            (
                F.round(F.col("pr") * F.lit(1e8), 0).cast("bigint") / F.lit(1e8)
            ).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(20)
        .collect()
    ]


def main() -> None:
    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    fanout = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("pagerank-bucketed-probe")
    spark.sql("DROP TABLE IF EXISTS probe_pr_edges")

    edges_src = synth_edges(spark, n_src, fanout)
    n_edges = edges_src.count()

    # A: the r9 shape — one exchange, pinned via localCheckpoint
    t0 = time.time()
    pinned = edges_src.repartition("src").localCheckpoint(eager=True)
    t_pin_build = time.time() - t0
    t0 = time.time()
    top_a = run_iterations(spark, pinned)
    t_pinned = time.time() - t0

    # B: bucketed catalog table — scan carries src distribution
    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        write_bucketed,
    )

    t0 = time.time()
    write_bucketed(edges_src, "probe_pr_edges", "src", num_buckets=32, sort_col="src")
    t_bucket_build = time.time() - t0
    bucketed = spark.table("probe_pr_edges")
    t0 = time.time()
    top_b = run_iterations(spark, bucketed)
    t_bucketed = time.time() - t0

    assert top_a == top_b, (top_a[:3], top_b[:3])
    print(
        json.dumps(
            {
                "probe": "pagerank_bucketed_ab",
                "n_edges": n_edges,
                "pinned_build_sec": round(t_pin_build, 2),
                "pinned_iter_sec": round(t_pinned, 2),
                "bucketed_build_sec": round(t_bucket_build, 2),
                "bucketed_iter_sec": round(t_bucketed, 2),
                "iter_speedup": round(t_pinned / t_bucketed, 2),
                "top20_equal": True,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS probe_pr_edges")
    spark.stop()


if __name__ == "__main__":
    main()
