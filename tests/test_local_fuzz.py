"""Property-based differential gate for the driver-local executor:
random full query dicts (filters, aliases, aggregation, distinct,
order/slice) run through BOTH plans/local.py and the Catalyst
compiler over the same rows; any value divergence fails. This is the
fastpath's wrong-answer insurance beyond the hand-written 42-case
battery in test_local_parity.py — null semantics, dtype edges, and
clause interactions get explored instead of enumerated."""
from __future__ import annotations

import math
import os
import sys

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qcache_spark import compile_query
from qcache_spark.errors import MalformedQueryException
from qcache_spark.plans.local import Unsupported, execute_local

ROWS = [
    {"rid": 0, "i": 1, "f": 1.5, "s": "abc"},
    {"rid": 1, "i": 2, "f": None, "s": "ABC"},
    {"rid": 2, "i": 3, "f": -0.5, "s": None},
    {"rid": 3, "i": 4, "f": 2.5, "s": "xyz"},
    {"rid": 4, "i": 0, "f": 0.0, "s": ""},
    {"rid": 5, "i": 7, "f": 1.5, "s": "abcd"},
    {"rid": 6, "i": 2, "f": None, "s": "abc"},
    {"rid": 7, "i": 7, "f": 4.0, "s": None},
    # negative money-scale tie: -2.00005 * 10000 is EXACTLY -20000.5,
    # exercising msum/dsum's away-from-zero rounding on negatives
    {"rid": 8, "i": -3, "f": -2.00005, "s": "neg"},
]

CMP = ["==", "!=", "<", "<=", ">", ">="]


def _filter_tree():
    int_cmp = st.tuples(st.sampled_from(CMP), st.just("i"), st.sampled_from([0, 2, 7]))
    float_cmp = st.tuples(st.sampled_from(CMP), st.just("f"), st.sampled_from([0.0, 1.5]))
    str_cmp = st.tuples(
        st.sampled_from(["==", "!="]), st.just("s"),
        st.sampled_from(["'abc'", "''", "'zz'"]),
    )
    col_cmp = st.tuples(st.sampled_from(CMP), st.just("i"), st.just("f"))
    in_list = st.tuples(st.just("in"), st.just("i"),
                        st.sampled_from([[0, 2], [7], []]))
    like = st.tuples(st.just("like"), st.just("s"), st.sampled_from(["'%b%'", "'a%'"]))
    isnull = st.tuples(st.just("isnull"), st.sampled_from(["f", "s"]))
    leaf = st.one_of(int_cmp, float_cmp, str_cmp, col_cmp, in_list, like, isnull).map(list)

    def extend(children):
        return st.one_of(
            st.tuples(st.sampled_from(["&", "|"]), children, children).map(list),
            st.tuples(st.just("!"), children).map(list),
        )

    return st.recursive(leaf, extend, max_leaves=4)


def _alias_expr():
    num = st.sampled_from(["i", "f", 2, 0.5])
    binary = st.tuples(st.sampled_from(["+", "-", "*", "/", "%", "//"]), num, num).map(list)
    unary = st.tuples(st.sampled_from(["abs", "sqrt", "floor", "exp"]), st.sampled_from(["i", "f"])).map(list)
    return st.one_of(binary, unary)


def _query():
    plain = st.fixed_dictionaries(
        {},
        optional={
            "where": _filter_tree(),
            "select": st.sampled_from(
                [["rid", "i", "f", "s"], ["rid", "s", "i"], ["rid", "f"]]
            ),
            "order_by": st.just(["rid"]),
            "offset": st.sampled_from([0, 2]),
            "limit": st.sampled_from([3, 100]),
        },
    )
    aliased = st.builds(
        lambda w, e: {"where": w, "select": [["=", "x", e], "rid"], "order_by": ["rid"]},
        _filter_tree(),
        _alias_expr(),
    )
    grouped = st.builds(
        lambda w, keys, fns: {
            "where": w,
            "group_by": keys,
            "select": keys + [[fn, c] for fn, c in fns if c not in keys],
            "order_by": keys,
        },
        _filter_tree(),
        # "s" has nulls: exercises null group keys; two keys exercise
        # the factorized radix code combine/decode
        st.sampled_from([["i"], ["s"], ["i", "s"]]),
        st.lists(
            st.sampled_from(
                [("sum", "f"), ("count", "f"), ("min", "f"), ("max", "rid"),
                 ("mean", "f"), ("nunique", "s"), ("sum", "rid"),
                 ("median", "f"), ("std", "f"), ("msum", "f"), ("dsum", "f")]
            ),
            min_size=1, max_size=3, unique_by=lambda e: e[1],
        ),
    )
    dist = st.builds(
        lambda w: {"where": w, "distinct": ["i", "s"], "select": ["i", "s"]},
        _filter_tree(),
    )
    # desc + nulls ordering under slicing (rid tiebreak keeps the
    # slice deterministic across backends)
    ordered = st.builds(
        lambda w, key, off, lim: {
            "where": w, "select": ["rid", "i", "f", "s"],
            "order_by": [key, "rid"], "offset": off, "limit": lim,
        },
        _filter_tree(),
        st.sampled_from(["-f", "f", "-s", "s", "-i"]),
        st.sampled_from([0, 1, 3]),
        st.sampled_from([2, 4, 100]),
    )
    # from-subquery: aggregate inner, filter/alias outer
    from_sub = st.builds(
        lambda w, outer_w: {
            "from": {"where": w, "group_by": ["i"],
                     "select": ["i", ["sum", "rid"], ["mean", "f"]]},
            "where": outer_w,
            "select": ["i", ["=", "y", ["+", "rid", "i"]]],
            "order_by": ["i"],
        },
        _filter_tree(),
        st.sampled_from([[">", "rid", 2], ["<=", "i", 3], ["!", ["isnull", "f"]]]),
    )
    # in-subquery against the root frame (and its negation)
    in_sub = st.builds(
        lambda sub_w, neg: {
            "where": (["!", ["in", "i", {"where": sub_w, "select": ["i"]}]]
                      if neg else ["in", "i", {"where": sub_w, "select": ["i"]}]),
            "select": ["rid", "i"],
            "order_by": ["rid"],
        },
        _filter_tree(),
        st.booleans(),
    )
    return st.one_of(plain, aliased, grouped, dist, ordered, from_sub, in_sub)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _pdf_rows(pdf: pd.DataFrame, cols):
    out = []
    for _, r in pdf.iterrows():
        out.append(tuple(
            _norm(None if pd.isna(r[c]) and not isinstance(r[c], str) else r[c])
            for c in cols
        ))
    return sorted(out)


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(pd.DataFrame(ROWS)).coalesce(1).cache()
    sdf.count()
    pdf = pd.DataFrame(ROWS)  # same construction both sides
    return sdf, pdf


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=_query())
def test_local_matches_catalyst(frames, q):
    sdf, pdf = frames
    try:
        local = execute_local(q, pdf)
    except Unsupported:
        return  # router would fall back — fine by contract
    except MalformedQueryException:
        # both backends must 400 identically
        with pytest.raises(MalformedQueryException):
            compile_query(q, sdf)
        return
    result = compile_query(q, sdf)
    spark_rows = result.sliced.collect()
    cols = result.sliced.columns
    assert list(local.sliced.columns) == cols, (q, local.sliced.columns, cols)
    got = _pdf_rows(local.sliced, cols)
    want = sorted(tuple(_norm(r[c]) for c in cols) for r in spark_rows)
    assert got == want, (q, got, want)
    assert local.unsliced_len == result.unsliced_len(), q
