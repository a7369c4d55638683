"""Round-15 tests: the profile-adaptive salted AGGREGATION (r14 verdict
ask #4), the right-outer dual of the profile-adaptive salted join (ask
#5), the sharded-by-default inverted index entry point (ask #3), and
the watermark late-drop accounting row (ask #9).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.aggregates import (
    profile_salted_rollup,
    sensor_rollup,
)
from iiot_data_engineering_lab_assignment_spark.operators.joins import (
    profile_salted_join,
)
from iiot_data_engineering_lab_assignment_spark.operators.text import (
    inverted_index_postings,
)


def _skewed_values(spark):
    """key 1 carries 60% of 10k rows; values vary so AVG/MIN/MAX bite."""
    hot = spark.range(6000).select(
        F.lit(1).alias("k"), (F.col("id") % 100 / 10.0).alias("value")
    )
    cold = spark.range(2, 4002).select(
        F.col("id").alias("k"), (F.col("id") % 100 / 10.0).alias("value")
    )
    return hot.unionByName(cold)


def _rollup_key(r):
    return (
        r["k"],
        round(r["avg_value"], 9),
        r["min_value"],
        r["max_value"],
        r["count_readings"],
    )


def test_profile_salted_rollup_both_strategies_one_plan(spark):
    """ask #4 done-criterion: planted 60%-share key at 4-way parallelism
    -> the plan carries a Union (two-stage salted hot slice + plain cold
    slice), mirroring test_profile_salted_join_both_strategies_one_plan."""
    df = _skewed_values(spark)
    rolled = profile_salted_rollup(df, "k", parallelism=4)
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    # plain side: partial+final HashAggregate; salted side: partial+final
    # per stage x two stages -> strictly more aggregates than one rollup
    assert plan.count("HashAggregate") >= 6, plan


def test_profile_salted_rollup_equals_plain(spark):
    """Salted two-stage decimal algebra must be bit-identical to the
    plain rollup (same values, same count)."""
    df = _skewed_values(spark)
    adaptive = sorted(map(_rollup_key, profile_salted_rollup(df, "k", parallelism=4).collect()))
    plain = sorted(map(_rollup_key, sensor_rollup(df, "k").collect()))
    assert adaptive == plain


def test_profile_salted_rollup_uniform_stays_plain(spark):
    """No needs_salt key -> the plain one-stage rollup IS the plan."""
    df = spark.range(1000).select(
        (F.col("id") % 100).alias("k"), F.lit(1.0).alias("value")
    )
    rolled = profile_salted_rollup(df, "k", parallelism=4)
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert rolled.count() == 100


def test_profile_salted_rollup_extra_group_cols(spark):
    """Hot-key over-approximation with a composite grouping: profiling
    the leading key salts all its subgroups; result still equals plain."""
    df = _skewed_values(spark).withColumn("g", F.col("value") > 5)
    key = lambda r: (r["k"], r["g"], round(r["avg_value"], 9), r["count_readings"])  # noqa: E731
    adaptive = sorted(
        map(key, profile_salted_rollup(df, "k", ["g"], parallelism=4).collect())
    )
    plain = sorted(map(key, sensor_rollup(df, "k", "g").collect()))
    assert adaptive == plain


def _right_skewed_pair(spark):
    """left: 2000-key dim; right: key 1 carries 5k of 6k rows, plus a
    cohort (3000+) with NO left match -> right-outer NULL rows exist."""
    left = spark.range(1, 2001).select(
        F.col("id").alias("lk"), F.concat(F.lit("L"), F.col("id")).alias("lab")
    )
    rhot = spark.range(5000).select(F.lit(1).alias("rk"), F.col("id").alias("pay"))
    rcold = spark.range(3000, 4000).select(
        F.col("id").alias("rk"), F.col("id").alias("pay")
    )
    return left, rhot.unionByName(rcold)


def test_profile_salted_join_right_equals_plain(spark):
    """ask #5: the right-outer dual must be row-identical to the plain
    right join, including unmatched right rows (NULL left columns)."""
    left, right = _right_skewed_pair(spark)
    adaptive = profile_salted_join(left, right, "lk", "rk", parallelism=4, how="right")
    plain = left.join(right, left["lk"] == right["rk"], "right")
    key = lambda r: (r["lk"], r["lab"], r["rk"], r["pay"])  # noqa: E731
    assert sorted(map(key, adaptive.collect()), key=str) == sorted(
        map(key, plain.collect()), key=str
    )
    # caller's column order survives the internal flip
    assert adaptive.columns == ["lk", "lab", "rk", "pay"]


def test_profile_salted_join_right_carries_both_strategies(spark):
    """The flipped plan still unions a salted hot slice with a plain
    cold slice when the RIGHT key is skewed."""
    left, right = _right_skewed_pair(spark)
    adaptive = profile_salted_join(left, right, "lk", "rk", parallelism=4, how="right")
    plan = adaptive._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan


def test_profile_salted_join_full_raises(spark):
    left, right = _right_skewed_pair(spark)
    with pytest.raises(ValueError, match="full outer"):
        profile_salted_join(left, right, "lk", "rk", how="full")


def test_profile_salted_join_right_dup_columns_raise(spark):
    left, right = _right_skewed_pair(spark)
    with pytest.raises(ValueError, match="overlapping"):
        profile_salted_join(
            left.withColumnRenamed("lab", "pay"), right, "lk", "rk", how="right"
        )


def test_inverted_index_default_sharded_equals_one_shard(spark):
    """ask #3: the sharded build is the DEFAULT entry point and is
    id-identical to the single-aggregate form at any shard count."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha "),
            F.when(F.col("id") % 3 == 0, F.lit("beta gamma")).otherwise(
                F.lit("delta")
            ),
        ).alias("text"),
    )
    as_default = {
        r["term"]: (r["df"], r["gap_list"])
        for r in inverted_index_postings(docs, max_postings=16).collect()
    }
    as_one = {
        r["term"]: (r["df"], r["gap_list"])
        for r in inverted_index_postings(docs, max_postings=16, n_doc_shards=1).collect()
    }
    as_eight = {
        r["term"]: (r["df"], r["gap_list"])
        for r in inverted_index_postings(docs, max_postings=16, n_doc_shards=8).collect()
    }
    assert as_default == as_one == as_eight
    assert as_default["alpha"][0] == 200  # df exact past the cap


def test_inverted_index_min_df_applies_post_merge(spark):
    """min_df prunes on the exact GLOBAL df (sum of shard dfs), not a
    per-shard count — a term split across shards must survive."""
    docs = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2, F.lit("rare common")).otherwise(F.lit("common")).alias("text"),
    )
    rows = {r["term"]: r["df"] for r in inverted_index_postings(docs, min_df=2, n_doc_shards=4).collect()}
    assert rows == {"rare": 2, "common": 8}


def test_stream_late_drop_accounting_synthetic(spark, tmp_path):
    """ask #9: planted late cohort (event_id%100<3, >=1h older than max)
    is dropped EXACTLY; absorbed equals the on-time count, read back
    from the materialized streaming result."""
    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        run_stream_late_drop_accounting,
    )

    base = 1_704_067_200_000_000  # 2024-01-01
    hour = 3_600_000_000
    rows = []
    # 40 on-time rows spanning 10 hours (ids chosen so id%100>=3)
    for i in range(40):
        rows.append((i + 10, base + i * hour // 4, 1, "view", 1.0))
    # 4 late rows: id%100<3 and >= 1h older than the max
    for j, eid in enumerate((0, 1, 2, 100)):
        rows.append((eid, base + j * hour, 2, "view", 9.0))
    df = spark.createDataFrame(
        [(e, us, u, t, v, "{}") for e, us, u, t, v in rows],
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros("us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    (got,) = run_stream_late_drop_accounting(spark, str(tmp_path)).collect()
    assert got["n_total"] == 44
    assert got["n_late_injected"] == 4
    assert got["n_absorbed"] == 40
    assert got["n_dropped"] == 4


def test_curation_e2e_plan_shape(spark):
    """The composed six-stage plan must carry the checkpoint boundaries
    (the three reused stages materialize once and downstream plans read
    the pinned RDD — r15 optimization: localCheckpoint replaced persist,
    same boundaries, truncated lineage) and no cartesian — the 1M dress
    rehearsal's shape, pinned at fixture scale."""
    from iiot_data_engineering_lab_assignment_spark.operators.dedup import (
        curation_e2e,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curation_e2e(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # checkpoint boundaries are real: the final plan reads the pinned
    # split_df RDD, not the six-stage lineage
    assert "ExistingRDD" in plan
    assert "InMemoryTableScan" not in plan
    rows = out.collect()
    assert len(rows) > 0
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # shards pack within budget: cum_tokens - n_tokens < (shard_id+1)*budget
    for r in rows:
        assert (r["cum_tokens"] - r["n_tokens"]) // 10_000 == r["shard_id"]
