"""Local replica of the driver's t2 correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` on DuckDB over the
same parquet, compare row count + column names + values
(order-insensitive, columns sorted by name)."""
from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "to_pydatetime"):
        return _norm(v.to_pydatetime())
    return v


def _spark_result(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def _oracle_result(ddb, name):
    # fetchall keeps per-column python types (iterrows/df would upcast
    # ints to float in mixed rows)
    cur = ddb.execute(entry_mod.oracle_sql()[name])
    colnames = [d[0] for d in cur.description]
    raw = cur.fetchall()
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    cols = [colnames[i] for i in order]
    rows = []
    for r in raw:
        vals = []
        for i in order:
            v = _norm(r[i])
            if isinstance(v, float) and math.isnan(v):
                v = None
            vals.append(v)
        rows.append(tuple(vals))
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    if name not in entry_mod.oracle_sql():
        pytest.skip("rows-only query (no SQL oracle)")
    s_cols, s_rows = _spark_result(spark, name)
    o_cols, o_rows = _oracle_result(ddb, name)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
