"""Fixture-layout tripwire (round-3 verdict ask #4).

The external driver REGENERATES /root/testdata every round, and the layout
has genuinely shifted between rounds (events.ts has shipped as
TIMESTAMP(NANOS) -> int64-under-nanosAsLong AND as TIMESTAMP(MICROS) NTZ;
round 3 required a mid-round reader patch).  These tests pin every
assumption the engine's scan paths make about the parquet fixtures so a
layout change fails loudly in pytest instead of surfacing as red rows in
the external correctness gate.

Pure pyarrow - no Spark session, so the whole file runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

#: column -> set of acceptable pyarrow dtype strings.  Entries listing
#: several dtypes are the layouts the readers genuinely branch on
#: (sources/readers.py:load_table); anything outside the set is a NEW
#: layout the engine has never seen and must not pass silently.
TS_LAYOUTS = {"int64", "timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"}

EXPECTED: dict[str, dict[str, set[str]]] = {
    "events": {
        "event_id": {"int64"},
        "ts": TS_LAYOUTS,
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32", "int64"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_shipdate": TS_LAYOUTS,
        "l_returnflag": {"string", "large_string"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double"},
        "o_orderdate": TS_LAYOUTS,
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_nationkey": {"int32", "int64"},
        "c_acctbal": {"double"},
    },
    "supplier": {"s_suppkey": {"int64"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_retailprice": {"double"}},
    "nation": {"n_nationkey": {"int32", "int64"}, "n_regionkey": {"int32", "int64"}},
    "region": {"r_regionkey": {"int32", "int64"}},
}


def validate_table(table: str, schema) -> list[str]:
    """Return a list of layout violations for one parquet schema."""
    got = {name: str(t) for name, t in zip(schema.names, schema.types)}
    problems = []
    for col, allowed in EXPECTED[table].items():
        if col not in got:
            problems.append(f"{table}.{col}: MISSING (have {sorted(got)})")
        elif got[col] not in allowed:
            problems.append(f"{table}.{col}: dtype {got[col]!r} not in {sorted(allowed)}")
    return problems


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_layout(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.fail(f"fixture missing: {path}")
    problems = validate_table(table, pq.read_schema(path))
    assert not problems, "; ".join(problems)


def test_sf_dirs_present():
    assert SF_DIRS, "no /root/testdata/sf* fixture directories found"


def test_validator_trips_on_layout_change():
    """Negative control: a simulated driver-side layout change (doc_id
    re-typed, a column dropped) must be flagged - guards the guard."""
    import pyarrow as pa

    mutated = pa.schema(
        [
            pa.field("doc_id", pa.int32()),  # was int64
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("n_chars", pa.int64()),
            # "source" dropped
        ]
    )
    problems = validate_table("documents", mutated)
    assert any("doc_id" in p for p in problems)
    assert any("source" in p and "MISSING" in p for p in problems)
