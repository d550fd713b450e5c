"""Mimics the driver: run every queries() entry at sf0.01 alongside its
oracle_sql() in DuckDB and compare row count, column names, and values
(order-insensitive, exact after the entries' own rounding)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in idx) for row in data
    ), [cols[i] for i in idx]


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows_raw = sdf.collect()
    scols = sdf.columns
    ora = ddb.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in ora.description]
    orows_raw = ora.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows_raw) == len(orows_raw), (
        f"{name}: row count {len(srows_raw)} vs oracle {len(orows_raw)}"
    )
    srows, _ = _rows(scols, [[r[c] for c in scols] for r in srows_raw])
    orows, _ = _rows(ocols, orows_raw)
    mismatches = [
        (a, b) for a, b in zip(srows, orows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}


def test_rows_only_entries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
