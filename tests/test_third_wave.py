"""Salted join equivalence, cosine-dedup properties, TF-IDF sanity."""

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.joins import salted_join
from iiot_data_engineering_lab_assignment_spark.operators.similarity import cosine_dup_pairs
from iiot_data_engineering_lab_assignment_spark.operators.text import tf_idf
from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

from conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(o, c, "o_custkey", "c_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_drops_internal_columns(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    out = salted_join(o, c, "o_custkey", "c_custkey", salt_buckets=4)
    assert "_salt" not in out.columns


def test_cosine_lsh_is_verified_subset(spark, embeddings):
    import numpy as np

    exact = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_dup_pairs(embeddings, threshold=0.4).collect()
    }
    planes = np.random.RandomState(11).randn(4, 64).tolist()
    blocked = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_dup_pairs(embeddings, threshold=0.4, planes=planes).collect()
    }
    assert blocked <= exact  # blocking only removes candidates, never corrupts
    assert len(exact) > 0


def test_tfidf_properties(spark, documents):
    out = tf_idf(documents).cache()
    # df never exceeds corpus size; tf >= 1; rare terms outweigh common ones
    n_docs = documents.count()
    assert out.filter(F.col("df") > n_docs).count() == 0
    assert out.filter(F.col("tf") < 1).count() == 0
    # a term appearing in every doc has idf ln(1)=0 -> tfidf 0
    ubiquitous = out.filter(F.col("df") == n_docs)
    if ubiquitous.count():
        assert ubiquitous.filter(F.col("tfidf") != 0.0).count() == 0
    # per-doc tf sums to the doc's token count
    tok_sum = out.groupBy("doc_id").agg(F.sum("tf").alias("s"))
    doc_toks = documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("t")
    )
    mism = tok_sum.join(doc_toks, "doc_id").filter(F.col("s") != F.col("t")).count()
    assert mism == 0
    out.unpersist()


def test_cosine_blocked_equals_exact(spark, embeddings):
    """The block-GEMM variant returns the identical pair set as the
    exact-JVM join (float path differs; membership must not)."""
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        cosine_dup_pairs_blocked,
    )

    exact = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(embeddings, 0.4).collect()}
    blocked = {
        (r["id_a"], r["id_b"]) for r in cosine_dup_pairs_blocked(embeddings, 0.4).collect()
    }
    assert exact == blocked
    assert len(exact) > 0
