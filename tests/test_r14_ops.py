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
