"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, pure JVM array expressions
(zip_with product + aggregate sum), no UDF, no shuffle except the final
top-k.  Scale path: LSH-bucketed search (random hyperplane signs) that
probes only the query's bucket neighborhood — at 100 TB the bucketing
column doubles as the storage partition key so a query touches a fraction
of files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_to_query",
    "brute_force_topk",
    "hyperplane_bucket",
    "lsh_topk",
    "centroids",
]


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise product + sequential fold — deterministic summation
    order (matters for cross-engine value comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_to_query(emb: Column, query: list[float]) -> Column:
    """Cosine similarity of an array<float> column against a constant query
    vector, computed in double precision."""
    q = F.array(*[F.lit(float(x)) for x in query])
    e = _as_double(emb)
    return dot(e, q) / (l2_norm(e) * l2_norm(q))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: scan -> score -> global top-k.

    Spark's ``orderBy(...).limit(k)`` plans a TakeOrderedAndProject —
    each partition keeps a k-row heap and the driver merges P*k rows, so
    no global sort materializes even over billions of vectors.
    Deterministic tiebreak on id."""
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_to_query(F.col(emb_col), query), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplane_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into a
    long.  Cosine-similar vectors collide with probability 1 - theta/pi per
    bit."""
    bits = [
        F.when(dot(_as_double(emb), F.array(*[F.lit(float(x)) for x in p])) >= 0, 1 << i).otherwise(0)
        for i, p in enumerate(planes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseXOR(b.cast("long"))
    return out


def lsh_topk(
    embeddings: DataFrame,
    query: list[float],
    planes: list[list[float]],
    k: int = 10,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within `probe_hamming` bits of the query's bucket (multi-probe LSH).

    At scale the bucket column is precomputed and used as a partition /
    Z-ORDER key, so the filter prunes file scans; here it prunes rows.
    """
    nbits = len(planes)
    bucket = hyperplane_bucket(F.col(emb_col), planes)
    qrow = [(query,)]
    spark = SparkSession.getActiveSession()
    qbucket = (
        spark.createDataFrame(qrow, "q array<double>")
        .select(hyperplane_bucket(F.col("q"), planes).alias("b"))
        .collect()[0][0]
    )
    with_bucket = embeddings.withColumn("_bucket", bucket)
    ham = F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(int(qbucket))))
    probed = with_bucket.filter(ham <= probe_hamming)
    return brute_force_topk(probed, query, k, id_col, emb_col)


def centroids(
    embeddings: DataFrame, label_col: str = "label", emb_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, long form: (label, pos, centroid value).

    posexplode -> groupBy(label, pos) -> avg: the shuffle carries scalar
    (label, pos, partial-sum) triples — the standard distributed layout for
    elementwise vector means (also the k-means update step / the IVF
    coarse-quantizer trainer)."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(_as_double(F.col(emb_col))).alias("pos", "v")
    )
    return exploded.groupBy(label_col, "pos").agg(F.round(F.avg("v"), 6).alias("centroid_v"))
