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
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr), types


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


# The driver's comparator hashes RAW values, so an oracle column whose
# DuckDB type leaves the int64/float64 family (SUM(BIGINT) -> HUGEINT,
# AVG -> DECIMAL, ...) hash-mismatches even when every value is
# identical — the q43/q59/q68 artifact class (VERDICT r2/r4). _norm()
# above erases that difference, so value comparison alone cannot see
# it. Width differences WITHIN a family are fine (spark int vs duck
# BIGINT was driver-green for q62 etc.); what must never appear on the
# duck side of a numeric column is a type arrow can't carry as
# int64/float64.
_DUCK_INT_OK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}
_DUCK_FLOAT_OK = {"FLOAT", "DOUBLE"}
_SPARK_INTS = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOATS = {"float", "double"}


def _assert_oracle_types(ddb, name, spark_types):
    desc = ddb.execute("DESCRIBE " + entry_mod.oracle_sql()[name]).fetchall()
    duck_types = {r[0]: r[1] for r in desc}
    assert set(duck_types) == set(spark_types), (
        f"{name}: oracle columns {sorted(duck_types)} vs spark {sorted(spark_types)}"
    )
    bad = []
    for c, st in spark_types.items():
        dt = duck_types[c]
        if st in _SPARK_INTS and dt not in _DUCK_INT_OK:
            bad.append((c, st, dt))
        elif st in _SPARK_FLOATS and dt not in _DUCK_FLOAT_OK:
            bad.append((c, st, dt))
        elif st == "boolean" and dt != "BOOLEAN":
            bad.append((c, st, dt))
    assert not bad, (
        f"{name}: oracle/spark numeric family drift {bad} — the driver "
        "hashes raw values, so this mismatches even with identical values; "
        "CAST the oracle column (q43/q59/q68 artifact class)"
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    if name not in entry_mod.oracle_sql():
        pytest.skip("rows-only query (no SQL oracle)")
    s_cols, s_rows, s_types = _spark_result(spark, name)
    o_cols, o_rows = _oracle_result(ddb, name)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    _assert_oracle_types(ddb, name, s_types)
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
