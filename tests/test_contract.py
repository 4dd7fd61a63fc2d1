"""Mirror of the driver's correctness gate: run every queries() entry at
small scale and compare row-count + column names + order-insensitive values
against the DuckDB oracle_sql() twin."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("RODDY_CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch {scols} vs {dcols}")
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}")
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} value mismatches, first: "
        f"{sset[mism[0]]} vs {dset[mism[0]]}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert rows, f"{name} returned no rows"
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
