"""Connected-components convergence probe on ADVERSARIAL topologies.

The keep-best probe's planted clusters are band-clique-shaped and
converge in 1 round; this probe measures the shapes that actually
stress min-label propagation:

* a single PATH of length N (diameter N) — naive propagation needs N
  rounds; pointer jumping must close it in O(log N);
* a binary-tree component (diameter log N) — near-instant;
* a STAR with one hot hub (the skew case: every edge shares one node).

Usage: python tools/cc_chain_probe.py [n_nodes]
Prints one JSON line with rounds-to-convergence and wall time per shape.
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
    connected_components,
)
from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402


def run(spark, name, edges, n_nodes, out):
    stats: dict = {}
    t0 = time.time()
    cc = connected_components(edges, max_iter=64, stats=stats)
    n_comp = cc.select("comp").distinct().count()
    n_node = cc.count()
    out[f"{name}_rounds"] = stats.get("rounds")
    out[f"{name}_converged"] = stats.get("converged")
    out[f"{name}_sec"] = round(time.time() - t0, 2)
    out[f"{name}_components"] = n_comp
    assert n_comp == 1, f"{name}: expected one component, got {n_comp}"
    assert n_node == n_nodes, f"{name}: {n_node} nodes labeled, expected {n_nodes}"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("cc-chain-probe")
    out: dict = {"metric": "cc_convergence_probe", "n_nodes": n, "unit": "sec",
                 "log2_n": round(math.log2(n), 1)}

    ids = spark.range(0, n - 1, 1, 32)
    path_edges = ids.select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    run(spark, "path", path_edges, n, out)

    tree_edges = spark.range(1, n, 1, 32).select(
        (F.col("id") / 2).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )
    run(spark, "tree", tree_edges, n, out)

    star_edges = spark.range(1, n, 1, 32).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )
    run(spark, "star", star_edges, n, out)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
