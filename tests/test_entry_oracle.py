"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in osql:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak gate)
        return
    res = ddb.execute(osql[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column mismatch {spark_cols} vs {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(ddb_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["host", "event_id", "value", "rank_in_host"]
