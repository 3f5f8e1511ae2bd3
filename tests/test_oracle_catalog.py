"""Every SQL-expressible catalog entry vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + column names +
order-insensitive value multiset) so a regression in either side of a
(queries(), oracle_sql()) pair fails pytest before the driver sees it.
Rows-only entries are smoke-run for schema stability and rows >= 0.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from texteller_spark.plans.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool) or v is None:
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) or (not isinstance(v, (int, str)) and hasattr(v, "__float__")):
        f = float(v)
        return "nan" if math.isnan(f) else f"{f:.6g}"
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_pair(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(drows)
    assert _multiset(srows, sdf.columns) == _multiset(drows, rel.columns)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_smoke(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.columns  # stable, non-empty schema
    assert sdf.count() >= 0
