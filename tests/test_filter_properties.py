"""Property-based filter-semantics test: random filter trees run
through the Spark compiler AND an independent pure-Python evaluator
implementing the reference's pandas two-valued null semantics.
Divergence on ANY generated tree fails — this hardens the hairiest
surface (null handling under negation/disjunction, literal-vs-column
quoting) far beyond the hand-written matrix."""
from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qcache_spark import compile_query

ROWS = [
    {"rid": 0, "i": 1, "f": 1.5, "s": "abc"},
    {"rid": 1, "i": 2, "f": None, "s": "ABC"},
    {"rid": 2, "i": 3, "f": -0.5, "s": None},
    {"rid": 3, "i": 4, "f": 2.5, "s": "xyz"},
    {"rid": 4, "i": 0, "f": 0.0, "s": ""},
    {"rid": 5, "i": 7, "f": 1.5, "s": "abcd"},
]

INT_LITS = [0, 1, 2, 3, 7]
FLOAT_LITS = [-0.5, 0.0, 1.5, 2.5]
STR_LITS = ["abc", "ABC", "xyz", "", "zz"]
CMP = ["==", "!=", "<", "<=", ">", ">="]


def cmp_leaf():
    int_cmp = st.tuples(st.sampled_from(CMP), st.just("i"), st.sampled_from(INT_LITS))
    float_cmp = st.tuples(st.sampled_from(CMP), st.just("f"), st.sampled_from(FLOAT_LITS))
    str_cmp = st.tuples(
        st.sampled_from(["==", "!="]), st.just("s"),
        st.sampled_from([f"'{v}'" for v in STR_LITS]),
    )
    col_cmp = st.tuples(st.sampled_from(CMP), st.just("i"), st.just("f"))
    return st.one_of(int_cmp, float_cmp, str_cmp, col_cmp).map(list)


def other_leaf():
    isnull = st.sampled_from([["isnull", "f"], ["isnull", "s"], ["isnull", "i"]])
    in_int = st.lists(st.sampled_from(INT_LITS), max_size=3).map(
        lambda vals: ["in", "i", vals]
    )
    in_str = st.lists(st.sampled_from(STR_LITS), max_size=3).map(
        lambda vals: ["in", "s", vals]
    )
    like = st.sampled_from(["ab", "AB", "xy", "c", "zz"]).map(
        lambda needle: ["like", "s", f"'%{needle}%'"]
    )
    ilike = st.sampled_from(["ab", "AB", "c"]).map(
        lambda needle: ["ilike", "s", f"'%{needle}%'"]
    )
    return st.one_of(isnull, in_int, in_str, like, ilike)


filters = st.recursive(
    st.one_of(cmp_leaf(), other_leaf()),
    lambda children: st.one_of(
        st.lists(children, min_size=1, max_size=3).map(lambda cs: ["&"] + cs),
        st.lists(children, min_size=1, max_size=3).map(lambda cs: ["|"] + cs),
        children.map(lambda c: ["!", c]),
    ),
    max_leaves=6,
)


def python_eval(row: dict, q) -> bool:
    """Independent reference implementation (pandas semantics)."""
    op = q[0]
    if op == "!":
        return not python_eval(row, q[1])
    if op == "&":
        return all(python_eval(row, sub) for sub in q[1:])
    if op == "|":
        return any(python_eval(row, sub) for sub in q[1:])
    if op == "isnull":
        return row[q[1]] is None
    if op == "in":
        v = row[q[1]]
        return v is not None and v in q[2]
    if op in ("like", "ilike"):
        v = row[q[1]]
        if v is None:
            return False
        pattern = q[2][2:-2]  # strip quotes and %%
        if op == "ilike":
            return pattern.lower() in v.lower()
        return pattern in v
    # comparison; second arg may be a column name or a literal
    left = row[q[1]]
    arg = q[2]
    if isinstance(arg, str) and len(arg) >= 2 and arg[0] == "'" and arg[-1] == "'":
        right = arg[1:-1]
    elif isinstance(arg, str):
        right = row[arg]
    else:
        right = arg
    if op == "!=":
        if left is None or right is None:
            return True
        return left != right
    if left is None or right is None:
        return False
    return {
        "==": left == right,
        "<": left < right,
        "<=": left <= right,
        ">": left > right,
        ">=": left >= right,
    }[op]


@pytest.fixture(scope="module")
def prop_frame(spark):
    return spark.createDataFrame(
        [(r["rid"], r["i"], r["f"], r["s"]) for r in ROWS],
        "rid long, i long, f double, s string",
    ).cache()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=filters)
def test_filter_matches_python_reference(prop_frame, q):
    expected = sorted(r["rid"] for r in ROWS if python_eval(r, q))
    got = sorted(
        r["rid"]
        for r in compile_query({"where": q, "select": ["rid"]}, prop_frame)
        .sliced.collect()
    )
    assert got == expected, f"divergence on {q!r}"
