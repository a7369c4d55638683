"""The driver gate, replicated: every oracle-backed registry query must
match DuckDB on row count, column set, and order-insensitive values
(SURVEY.md section 5.2.1)."""

import math

import duckdb
import pytest

from iiot_data_engineering_lab_assignment_spark import registry
from iiot_data_engineering_lab_assignment_spark.schemas import FIXTURE_TABLES

from conftest import SF_DIR

ORACLE_QUERIES = sorted(n for n, s in registry.QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in registry.QUERIES.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(",".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = registry.QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    ores = duck.sql(spec.oracle)
    orows = ores.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in ores.columns)
    assert len(srows) == len(orows)
    assert _sig(sdf.columns, srows) == _sig(ores.columns, orows)


# Empty since r11 (every registered query carries an oracle); the guard
# stays defined conditionally so a future rows-only registration gets a
# smoke test again without emitting an empty-parameter-set skip today.
if ROWS_ONLY_QUERIES:

    @pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
    def test_rows_only_runs(spark, name):
        spec = registry.QUERIES[name]
        out = spec.fn(spark, SF_DIR)
        assert out.count() > 0, f"{name} returned no rows"
