"""Round-14 tests: fail-loud overflow guards for the cleared-denominator
emitters (r13 verdict ask #2), plus the new r14 operators.

The guard contract: a magnitude beyond an integer-arithmetic envelope must
RAISE in both engines, never silently wrap (Spark non-ANSI BIGINT) or
silently NULL (Spark non-ANSI decimal cast / overflowed product under a
null-skipping SUM).  DuckDB is natively loud (HUGEINT/BIGINT out-of-range
throws); these tests prove the Spark side now matches, at the same
boundary, with an actionable message.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.registry import QUERIES


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, us_epoch, user_id, event_type, value)."""
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
    return str(tmp_path)


_DAY_US = 86_400_000_000
_BASE_US = 1_704_067_200_000_000  # 2024-01-01


def _overflow_series():
    """10 daily readings at value=1e6 -> daily milli-mean x=1e9, prefix
    sums sl ~ 1e10, so sl^2*(n-k)*100 ~ 1e22 — past the 2^63 score emit
    in both engines (but comfortably inside DECIMAL(38,0)/HUGEINT, so
    the failure is AT the emit boundary, not in the products)."""
    return [
        (i, _BASE_US + i * _DAY_US, 1, "view", 1_000_000.0) for i in range(10)
    ]


def test_changepoint_overflow_raises_spark(spark, tmp_path):
    sf = _write_events(spark, tmp_path, _overflow_series())
    with pytest.raises(Exception, match="split score overflowed"):
        QUERIES["changepoint_by_type"].fn(spark, sf).collect()


def test_changepoint_overflow_raises_duckdb(spark, tmp_path):
    """The oracle side of the same boundary: DuckDB's CAST(HUGEINT AS
    BIGINT) throws out-of-range — loud failure in BOTH engines is the
    ask #2 done-criterion."""
    sf = _write_events(spark, tmp_path, _overflow_series())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    with pytest.raises(duckdb.Error):
        con.execute(QUERIES["changepoint_by_type"].oracle).fetchall()


def test_changepoint_in_envelope_still_locates_shift(spark, tmp_path):
    """Guard must not perturb in-envelope results: a planted level shift
    (10 -> 500 after day 5) is located exactly, with exact milli means."""
    rows = [
        (i, _BASE_US + i * _DAY_US, 1, "view", 10.0 if i < 5 else 500.0)
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["changepoint_by_type"].fn(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["days_before"] == 5 and r["days_after"] == 5
    assert r["mean_before_milli"] == 10_000
    assert r["mean_after_milli"] == 500_000
    assert str(r["split_day"]) == "2024-01-05"


def test_changepoint2_locates_two_planted_shifts(spark, tmp_path):
    """ask #6 done-criterion: a 10/200/500 three-level series — depth 1
    finds ONE of the shifts, depth 2 finds the other inside its segment,
    and every segment mean is exact in milli-units."""
    levels = [10.0] * 10 + [200.0] * 10 + [500.0] * 10
    rows = [
        (i, _BASE_US + i * _DAY_US, 1, "view", v) for i, v in enumerate(levels)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["changepoint2_by_type"].fn(spark, sf).collect()
    by_depth = {}
    for r in got:
        by_depth.setdefault(r["depth"], []).append(r)
    (d1,) = by_depth[1]
    # depth-1 picks the variance-maximizing single split of 10/200/500:
    # after day 20 (before-mean 105, after-mean 500)
    assert str(d1["split_day"]) == "2024-01-20"
    assert d1["mean_before_milli"] == 105_000
    assert d1["mean_after_milli"] == 500_000
    d2 = {r["segment"]: r for r in by_depth[2]}
    # segment 0 (days 1-20) contains the 10 -> 200 shift at day 10
    assert str(d2[0]["split_day"]) == "2024-01-10"
    assert d2[0]["mean_before_milli"] == 10_000
    assert d2[0]["mean_after_milli"] == 200_000
    # segment 1 (days 21-30) is constant: tie -> earliest day, equal means
    assert d2[1]["mean_before_milli"] == d2[1]["mean_after_milli"] == 500_000
    assert str(d2[1]["split_day"]) == "2024-01-21"


def test_changepoint2_overflow_raises_spark(spark, tmp_path):
    """Depth-2 inherits the depth-1 fail-loud envelope."""
    sf = _write_events(spark, tmp_path, _overflow_series())
    with pytest.raises(Exception, match="overflowed"):
        QUERIES["changepoint2_by_type"].fn(spark, sf).collect()


def test_linear_trend_value_envelope_raises(spark, tmp_path):
    """|y4| > 3e9 (value > ~300k) would push per-row BIGINT x*y4 toward
    silent wrap territory — the documented 2^63 bound is now enforced."""
    rows = [(i, _BASE_US + i * _DAY_US, 1, "view", 1e6) for i in range(5)]
    sf = _write_events(spark, tmp_path, rows)
    with pytest.raises(Exception, match="product envelope"):
        QUERIES["linear_trend_per_type"].fn(spark, sf).collect()


def test_linear_trend_in_envelope_unchanged(spark, tmp_path):
    """A planted 7-unit/day ramp within the envelope fits exactly."""
    rows = [
        (i, _BASE_US + i * _DAY_US, 1, "view", 100.0 + 7.0 * i)
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["linear_trend_per_type"].fn(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["slope_per_day"] == pytest.approx(7.0, abs=1e-6)


def test_cusum_emit_envelope_raises(spark, tmp_path):
    """A drift big enough that n*(S_k - k*mean) > ~9.2e16 in 1e-4 units
    (200 events, first half at 1e9) would NULL through the BIGINT emit
    cast in non-ANSI Spark — now raises at the boundary DuckDB throws."""
    rows = [
        (i, _BASE_US + i * 1_000_000, 1, "view", 1e9 if i < 100 else 0.0)
        for i in range(200)
    ]
    sf = _write_events(spark, tmp_path, rows)
    with pytest.raises(Exception, match="BIGINT emit envelope"):
        QUERIES["cusum_drift_per_user"].fn(spark, sf).collect()


def test_inverted_index_sharded_merge_equals_unsharded(spark, documents):
    """ask #8 cap-composition proof: the doc-sharded build (per-shard cap
    128, merged) must reproduce the unsharded index exactly — same df,
    same gap list — for every term."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        inverted_index_postings,
        inverted_index_sharded,
    )

    flat = {
        r["term"]: (r["df"], r["gap_list"])
        for r in inverted_index_postings(documents, max_postings=128).collect()
    }
    sharded = inverted_index_sharded(
        documents, n_doc_shards=4, max_postings=128
    ).collect()
    assert {r["term"]: (r["df"], r["gap_list"]) for r in sharded} == flat
    assert all(1 <= r["shards_with_term"] <= 4 for r in sharded)
    assert all(0 <= r["shard"] <= 3 for r in sharded)


def test_inverted_index_sharded_cap_binds_per_shard(spark):
    """A term in every doc: per-shard lists cap at max_postings, the
    merged prefix is the true smallest-ids prefix, df stays exact."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        inverted_index_sharded,
    )

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("stopword").alias("text")
    )
    (row,) = inverted_index_sharded(
        docs, n_doc_shards=4, max_postings=16
    ).collect()
    assert row["df"] == 1000
    assert row["shards_with_term"] == 4
    gaps = [int(g) for g in row["gap_list"].split(",")]
    assert len(gaps) == 16
    # prefix of the global sorted ids: 0..15 -> gaps [0, 1, 1, ...]
    ids = [sum(gaps[: i + 1]) for i in range(len(gaps))]
    assert ids == list(range(16))


def test_pagerank_planted_quality_booleans(spark):
    """ask #7: the provable rank order must actually hold — hub above
    ring above spoke, ring/spokes internally uniform, and spokes at the
    EXACT teleport floor 0.15/31 (no in-links -> no propagated mass)."""
    r = QUERIES["pagerank_planted_quality"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["hub_top"] and r["ring_uniform"]
    assert r["spoke_uniform"] and r["ring_above_spoke"]
    assert r["n_nodes"] == 31
    assert r["spoke_min_pr8"] == round(0.15 / 31 * 1e8)
    # the directed ring's fixed point is exactly 1/n from the uniform init
    assert r["ring_min_pr8"] == round(1.0 / 31 * 1e8)


def _skewed_pair(spark):
    """left: key 1 carries 60% of 10k rows; right: 4001-key dim."""
    hot = spark.range(6000).select(F.lit(1).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(2, 4002).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    left = hot.unionByName(cold)
    right = spark.range(1, 4002).select(
        F.col("id").alias("rk"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return left, right


def test_profile_salted_join_both_strategies_one_plan(spark):
    """ask #5 done-criterion: with a planted 60%-share key at 4-way
    parallelism, the physical plan must carry a Union of TWO joins (the
    salted hot slice and the plain cold slice)."""
    from iiot_data_engineering_lab_assignment_spark.operators.joins import (
        profile_salted_join,
    )

    left, right = _skewed_pair(spark)
    joined = profile_salted_join(left, right, "k", "rk", parallelism=4)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins >= 2, plan


def test_profile_salted_join_equals_plain(spark):
    """Hot/cold split + salting must be row-identical to the plain join."""
    from iiot_data_engineering_lab_assignment_spark.operators.joins import (
        profile_salted_join,
    )

    left, right = _skewed_pair(spark)
    adaptive = profile_salted_join(left, right, "k", "rk", parallelism=4)
    plain = left.join(right, left["k"] == right["rk"])
    key = lambda r: (r["k"], r["payload"], r["rk"], r["label"])  # noqa: E731
    assert sorted(map(key, adaptive.collect())) == sorted(
        map(key, plain.collect())
    )


def test_profile_salted_join_uniform_stays_plain(spark):
    """No needs_salt key -> the plain join IS the plan (no Union, one join)."""
    from iiot_data_engineering_lab_assignment_spark.operators.joins import (
        profile_salted_join,
    )

    left = spark.range(1000).select((F.col("id") % 100).alias("k"), "id")
    right = spark.range(100).select(F.col("id").alias("rk"))
    joined = profile_salted_join(left, right, "k", "rk", parallelism=4)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert joined.count() == 1000


def test_cusum_in_envelope_unchanged(spark, tmp_path):
    """The same shape scaled into the envelope still reports the drift."""
    rows = [
        (i, _BASE_US + i * 1_000_000, 1, "view", 500.0 if i < 100 else 0.0)
        for i in range(200)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["cusum_drift_per_user"].fn(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 200
    assert got[0]["max_cusum"] > 0.0
