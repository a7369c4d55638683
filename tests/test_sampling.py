"""Deterministic sampling / splitting operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
    hash_uniform,
    sample_fraction,
    stratified_sample,
    train_val_test_split,
)


def test_split_deterministic_and_repartition_stable(spark, documents):
    """The whole point vs rand(): identical assignment on every run and
    under any physical partitioning."""
    a = train_val_test_split(documents).select("doc_id", "split").collect()
    b = train_val_test_split(documents.repartition(7)).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_proportions_and_total(spark, documents):
    counts = dict(
        train_val_test_split(documents)
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(counts.values())
    assert total == documents.count()
    # 52-bit uniform at n=500: generous tolerance, exact check is determinism
    assert counts["train"] / total == pytest.approx(0.8, abs=0.08)
    assert counts.get("val", 0) / total == pytest.approx(0.1, abs=0.06)
    assert counts.get("test", 0) / total == pytest.approx(0.1, abs=0.06)


def test_membership_stable_under_growth(spark, documents):
    """Appending documents must never move an existing doc between
    splits - the eval-contamination guard."""
    subset = documents.filter(F.col("doc_id") < 100)
    full = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(documents).select("doc_id", "split").collect()
    }
    small = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(subset).select("doc_id", "split").collect()
    }
    assert small == {k: v for k, v in full.items() if k < 100}


def test_sample_fraction_subset_and_monotone(spark, documents):
    """A smaller fraction's sample is a subset of a larger fraction's
    (threshold semantics on one fixed uniform)."""
    s30 = {r["doc_id"] for r in sample_fraction(documents, 0.3).select("doc_id").collect()}
    s60 = {r["doc_id"] for r in sample_fraction(documents, 0.6).select("doc_id").collect()}
    assert s30 <= s60
    n = documents.count()
    assert len(s30) / n == pytest.approx(0.3, abs=0.08)
    assert len(s60) / n == pytest.approx(0.6, abs=0.08)


def test_stratified_sample_respects_per_stratum_fractions(spark, documents):
    before = dict(documents.groupBy("lang").count().collect())
    after = dict(
        stratified_sample(documents, {"en": 0.5}, strata_col="lang")
        .groupBy("lang")
        .count()
        .collect()
    )
    # non-en strata untouched (fraction 1.0 keeps everything)
    for lang, n in before.items():
        if lang != "en":
            assert after.get(lang, 0) == n
    assert after["en"] / before["en"] == pytest.approx(0.5, abs=0.12)


def test_hash_uniform_range_and_salt_independence(spark, documents):
    rows = documents.select(
        hash_uniform("doc_id", "a").alias("ua"),
        hash_uniform("doc_id", "b").alias("ub"),
    ).collect()
    assert all(0.0 <= r["ua"] < 1.0 and 0.0 <= r["ub"] < 1.0 for r in rows)
    # different salts decorrelate: the two streams must not be identical
    assert any(r["ua"] != r["ub"] for r in rows)


def test_sampler_is_scan_level_no_shuffle(spark, documents):
    """Plan hygiene: the sampling filter must evaluate without any
    exchange - it is a pure projection/filter over the scan."""
    plan = sample_fraction(documents, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation_errors(spark, documents):
    with pytest.raises(ValueError):
        sample_fraction(documents, 1.5)
    with pytest.raises(ValueError):
        train_val_test_split(documents, weights=(0.5, 0.2, 0.2))
    with pytest.raises(ValueError):
        stratified_sample(documents, {"en": -0.1})
    with pytest.raises(ValueError):
        stratified_sample(documents, {"en": 0.5}, default_fraction=2.0)


def test_split_is_streaming_safe_and_batch_parity(spark, tmp_path):
    """The sampler is a stateless scan-level expression, so it applies
    unchanged to a Structured Streaming source - and an availableNow
    replay assigns exactly the batch splits (determinism across
    execution modes, not just runs)."""
    import uuid

    batch = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    src = str(tmp_path / "docs")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    name = f"split_parity_{uuid.uuid4().hex[:8]}"
    q = (
        train_val_test_split(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: r["split"]
        for r in spark.sql(f"SELECT doc_id, split FROM {name}").collect()
    }
    want = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            spark.read.parquet(src)
        ).select("doc_id", "split").collect()
    }
    assert got == want and len(got) == 300


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Every near-dup component lands wholly inside one split — the
    property a per-doc hash split does not have.  Checked on the fixture
    corpus: the registry query's (doc_id -> component, split) assignment
    is constant within each component, and multi-doc components exist so
    the check is not vacuous."""
    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    rows = QUERIES["leakage_safe_split"].fn(spark, "/root/testdata/sf0.001").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert len(rows) == 500
    assert any(
        len([r for r in rows if r["component"] == c]) > 1 for c in by_comp
    ), "fixture must contain multi-doc near-dup components"
    assert all(len(s) == 1 for s in by_comp.values())


def test_quality_prune_by_source_keeps_top_fraction(spark):
    """Per-source quantile pruning: within every source the kept set is
    exactly the cume_dist > 0.4 suffix — no kept doc scores below a
    dropped doc of the same source (under the doc_id tiebreak), and each
    source retains ~60% of its docs."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import quality_score
    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    kept = QUERIES["quality_prune_by_source"].fn(spark, sf).collect()
    full = quality_score(load_table(spark, sf, "documents")).select(
        "doc_id", "source", "quality_score"
    ).collect()
    kept_ids = {r["doc_id"] for r in kept}
    by_src = {}
    for r in full:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (r["quality_score"], r["doc_id"]))
        n = len(docs)
        expect = {d["doc_id"] for i, d in enumerate(docs) if (i + 1) / n > 0.4}
        got = {d["doc_id"] for d in docs if d["doc_id"] in kept_ids}
        assert got == expect, src
        assert 0.55 <= len(got) / n <= 0.65


def test_quality_prune_keeps_single_doc_sources(spark, tmp_path):
    """A source with exactly one document keeps it: cume_dist of a 1-row
    partition is 1.0 > 0.4.  (percent_rank would score it 0.0 and
    silently delete the source — the r6 review finding this pins.)"""
    import shutil

    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        src = f"/root/testdata/sf0.001/{t}.parquet"
        shutil.copy(src, sfdir / f"{t}.parquet")
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(40)), "en", "lonely", 200),
            (2, " ".join(f"b{i}" for i in range(40)), "en", "big", 200),
            (3, " ".join(f"c{i}" for i in range(30)), "en", "big", 150),
            (4, " ".join(f"d{i}" for i in range(20)), "en", "big", 100),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(sfdir / "documents.parquet"))
    kept = {
        r["doc_id"]: r["source"]
        for r in QUERIES["quality_prune_by_source"].fn(spark, str(sfdir)).collect()
    }
    assert 1 in kept and kept[1] == "lonely"
    # 'big' has 3 docs: cume_dist 1/3 <= 0.4 drops exactly the worst one.
    assert len([s for s in kept.values() if s == "big"]) == 2


def test_epoch_shuffle_is_stable_permutation(spark, documents):
    """epoch_shuffle: (1) every doc appears exactly once with a unique
    (shard, pos) slot; (2) concatenating shards in shard order yields the
    md5-key-sorted order (the no-global-stage distributed sort claim);
    (3) the order is reproducible across calls but differs across
    epochs."""
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
        epoch_shuffle,
    )

    out = epoch_shuffle(documents, epoch=1, n_shards=16)
    rows = out.collect()
    assert len(rows) == documents.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert len({(r["shard"], r["pos"]) for r in rows}) == len(rows)

    # concatenated shard order == global key order
    concat_order = [
        r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["pos"]))
    ]
    keyed = documents.select(
        "doc_id",
        F.md5(F.concat_ws(":", F.lit("epoch"), F.lit("1"),
                          F.col("doc_id").cast("string"))).alias("k"),
    ).collect()
    key_order = [r["doc_id"] for r in sorted(keyed, key=lambda r: (r["k"], r["doc_id"]))]
    assert concat_order == key_order

    # stable across calls, different across epochs
    again = [
        r["doc_id"]
        for r in sorted(
            epoch_shuffle(documents, epoch=1, n_shards=16).collect(),
            key=lambda r: (r["shard"], r["pos"]),
        )
    ]
    assert again == concat_order
    other = [
        r["doc_id"]
        for r in sorted(
            epoch_shuffle(documents, epoch=2, n_shards=16).collect(),
            key=lambda r: (r["shard"], r["pos"]),
        )
    ]
    assert other != concat_order and sorted(other) == sorted(concat_order)


def test_weighted_sample_per_group_contract(spark):
    """E-S weighted sampling: k per group, deterministic, zero/negative
    weights never sampled, and heavy weights dominate (w -> inf drives
    the key ln(u)/w -> 0-, the maximum)."""
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [(g, i, 1.0) for g in ("a", "b") for i in range(20)]
    rows += [("a", 100, 1e9), ("a", 101, 0.0), ("b", 102, -3.0)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, w double")

    out = weighted_sample_per_group(
        df, k=3, weight_col="w", group_cols=["grp"]
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert all(len(v) == 3 for v in by_grp.values())
    # the 1e9-weight row always wins its group; w<=0 rows never appear
    assert 100 in by_grp["a"]
    assert 101 not in by_grp["a"] and 102 not in by_grp["b"]
    # ranks are 1..k and deterministic across a repartitioned rerun
    ranks = {(r["grp"], r["doc_id"]): r["sample_rank"] for r in out}
    assert sorted(v for (g, _), v in ranks.items() if g == "a") == [1, 2, 3]
    again = weighted_sample_per_group(
        df.repartition(5), k=3, weight_col="w", group_cols=["grp"]
    ).collect()
    assert {(r["grp"], r["doc_id"]): r["sample_rank"] for r in again} == ranks


def test_weighted_sample_global_and_validation(spark):
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)], "doc_id long, w double"
    )
    out = weighted_sample_per_group(df, k=4, weight_col="w").collect()
    assert len(out) == 4 and sorted(r["sample_rank"] for r in out) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_per_group(df, k=0, weight_col="w")


def test_mixture_temperature_weights_flattens_mixture(spark):
    """alpha=0.7 temperature: weights sum to 1, and relative to raw token
    share the biggest source is DOWN-weighted, the smallest UP-weighted."""
    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    rows = QUERIES["mixture_temperature_weights"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4
    hi = max(rows, key=lambda r: r["raw_share"])
    lo = min(rows, key=lambda r: r["raw_share"])
    assert hi["weight"] < hi["raw_share"]
    assert lo["weight"] > lo["raw_share"]


def test_weighted_sample_nan_weights_never_win_and_global_take_ordered(spark):
    """Review r8: NaN sorts above every double in Spark, so an unguarded
    NaN weight would monopolize the sample; and global mode must plan
    TakeOrdered, not a single-partition window sort."""
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(20)] + [(100, float("nan")), (101, None)],
        "doc_id long, w double",
    )
    out = weighted_sample_per_group(df, k=5, weight_col="w")
    ids = {r["doc_id"] for r in out.collect()}
    assert 100 not in ids and 101 not in ids and len(ids) == 5
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mixture_temperature_sample_monotone_rate_and_deterministic(spark):
    """alpha=0.5 temperature sampling: keep RATE per source must be
    non-increasing in source size (f_d = min(1, B*isqrt(n)/(S*n)) is
    proportional to 1/sqrt(n) below the cap), the budget must bind the
    output roughly to half the corpus tokens, and the selection must be
    identical across runs (md5, not rand)."""
    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    q = QUERIES["mixture_temperature_sample"].fn
    a = sorted(map(tuple, q(spark, sf).collect()))
    b = sorted(map(tuple, q(spark, sf).collect()))
    assert a == b and a
    docs = load_table(spark, sf, "documents")
    n_by_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept_by_src: dict[str, int] = {}
    for _, src in a:
        kept_by_src[src] = kept_by_src.get(src, 0) + 1
    rates = sorted(
        (n_by_src[s], kept_by_src.get(s, 0) / n_by_src[s]) for s in n_by_src
    )
    uncapped = [(n, r) for n, r in rates if r < 1.0]
    for (n1, r1), (n2, r2) in zip(uncapped, uncapped[1:]):
        # doc-count rate tracks the token rate (doc lengths are iid per
        # source), so allow slack for the binomial noise at n~100
        assert r2 <= r1 + 0.15, (rates,)
    # half-token budget: kept docs ~ half the corpus (generous tolerance)
    assert 0.25 <= len(a) / docs.count() <= 0.75
