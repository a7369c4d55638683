"""Degree-ordered triangle-counting skew probe (r12 verdict ask #5):
validate the compact-forward orientation bound on a POWER-LAW graph at
>= 10M edges — the regime where a naive all-directions wedge join
detonates on hub nodes and the Schank/Suri-Vassilvitskii orientation is
the whole point.

Graph: E directed draws with both endpoints sampled from a Zipf-like
inverse-CDF over a deterministic md5 uniform (node = floor(u^-0.8),
tail exponent ~ 2.25 — hubs of degree ~1e5 at 10M edges), self-loops
dropped, canonicalized + distinct.  No RNG state: edge i's endpoints
are pure functions of i, so the probe is reproducible.

Measured, per size:
* max UNORIENTED degree (the hub a naive enumeration squares) and the
  naive wedge count sum_v C(deg_v, 2);
* max ORIENTED out-degree and the oriented wedge count
  sum_v C(outdeg_v, 2) — the orientation bound says max outdeg =
  O(sqrt(E)) regardless of hub size, so the ratio naive/oriented
  wedges is the work the orientation deletes;
* wall-clock of the full triangle_counts() run and the triangle total.

Usage: python tools/triangle_skew_probe.py [n_edges ...]
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iiot_data_engineering_lab_assignment_spark.operators.dedup import (  # noqa: E402
    triangle_counts,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def _zipf_node(tag: str, n_nodes: int) -> F.Column:
    """Deterministic power-law node id from the edge id: md5 uniform u in
    (0,1], node = floor(N * u^4) — density ~ x^-0.75, i.e. deg(rank x)
    ~ x^-0.75, the web-graph / co-purchase Zipf regime: node 0 absorbs
    ~N^-1/4 of all draws (a ~200k-degree hub at 10M edges) while the
    tail stays spread over N ids so the edge set keeps its size."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(tag), F.col("id"))), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    return F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(4.0))).cast("long")


def synth_edges(spark, n_edges: int):
    n_nodes = max(1000, n_edges // 2)
    raw = spark.range(0, n_edges, 1, 64).select(
        _zipf_node("s", n_nodes).alias("a"), _zipf_node("d", n_nodes).alias("b")
    )
    return (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [10_000_000]
    spark = get_spark("triangle-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        edges = synth_edges(spark, n).persist()
        m = edges.count()
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        naive = deg.agg(
            F.max("d").alias("max_deg"),
            F.sum(F.expr("d * (d - 1) DIV 2")).alias("wedges"),
        ).head()
        # replicate triangle_counts' edge-local orientation to measure
        # the oriented out-degree distribution it induces
        e = edges.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
        ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        odeg = (
            e.select(F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"))
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
        )
        ori = odeg.agg(
            F.max("od").alias("max_outdeg"),
            F.sum(F.expr("od * (od - 1) DIV 2")).alias("wedges"),
        ).head()
        t0 = time.time()
        tri = triangle_counts(edges)
        total = tri.agg(F.sum("n_triangles")).head()[0]
        dt = time.time() - t0
        edges.unpersist()
        print(
            json.dumps(
                {
                    "edges": m,
                    "sqrt_2e": round(math.sqrt(2 * m), 1),
                    "max_degree": naive["max_deg"],
                    "naive_wedges": naive["wedges"],
                    "max_oriented_outdeg": ori["max_outdeg"],
                    "oriented_wedges": ori["wedges"],
                    "wedge_reduction": round(
                        naive["wedges"] / max(ori["wedges"], 1), 1
                    ),
                    "triangle_corner_rows": int(total or 0),
                    "count_seconds": round(dt, 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
