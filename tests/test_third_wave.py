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


def test_ivf_topk_recall_and_pruning(spark, embeddings):
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(embeddings, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(embeddings, qvec, nprobe=3, k=10).collect()}
    assert len(approx) == 10
    # beats the random baseline (3/10 cells probed -> E[recall] ~ 3) on
    # near-uniform fixture data; exact query vector itself always found
    assert 0 in approx
    assert len(approx & exact) >= 3


def test_winnowing_properties(spark, documents):
    from iiot_data_engineering_lab_assignment_spark.operators.dedup import shingles
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        winnowing_fingerprints,
    )
    from pyspark.sql import functions as FF

    fp = winnowing_fingerprints(documents, k=3, window=4).cache()
    # every doc with >= k+window-1 tokens has at least one fingerprint
    n_docs_with_fp = fp.select("doc_id").distinct().count()
    assert n_docs_with_fp == documents.count()
    # winnowing keeps a strict subset of the k-gram hashes (~2/(w+1))
    sh_counts = (
        shingles(documents, n=3)
        .groupBy("doc_id")
        .agg(FF.count(FF.lit(1)).alias("n_sh"))
    )
    fp_counts = fp.groupBy("doc_id").agg(FF.count(FF.lit(1)).alias("n_fp"))
    joined = sh_counts.join(fp_counts, "doc_id")
    assert joined.filter(FF.col("n_fp") > FF.col("n_sh")).count() == 0
    ratio = (
        joined.agg(FF.avg(FF.col("n_fp") / FF.col("n_sh"))).head()[0]
    )
    assert 0.2 < ratio < 0.8  # ~2/(w+1)=0.4 expected
    # identical docs -> identical fingerprint sets (the dedup property)
    fp.unpersist()


def test_winnowing_short_documents(spark):
    """Round-5 regression: documents with k..k+window-2 tokens used to
    crash (sequence(1, 0) is DESCENDING in Spark -> slice at start 0).
    Clamped semantics: fewer-than-window k-grams -> ONE min-of-all
    fingerprint; fewer than k tokens -> none.  Both hash tiers agree on
    the per-document fingerprint counts for the degenerate cases."""
    from collections import Counter

    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        winnowing_fingerprints,
        winnowing_fingerprints_md5,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, " ".join(f"t{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    for fn in (winnowing_fingerprints, winnowing_fingerprints_md5):
        counts = Counter(r["doc_id"] for r in fn(docs).collect())
        assert counts[1] == 1, fn.__name__   # 3 k-grams < window: clamped
        assert counts[2] == 0, fn.__name__   # shorter than k tokens
        assert counts[3] >= 2, fn.__name__   # normal path


def test_salted_join_rejects_outer(spark):
    """ADVICE r1: the replicated right side would duplicate unmatched right
    rows under right/full outer — reject loudly."""
    import pytest

    o = spark.createDataFrame([(1, 10)], "o_custkey long, v long")
    c = spark.createDataFrame([(1,)], "c_custkey long")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(o, c, "o_custkey", "c_custkey", salt_buckets=4, how=how)
