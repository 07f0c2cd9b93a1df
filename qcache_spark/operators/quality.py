"""Declarative data-quality constraint checks (Deequ-style).

The assertion layer on top of `text.profile_table` (which *describes*
a table, q86): the caller declares what MUST hold — completeness,
uniqueness, value bounds, set membership, regex match rate, row
count — and gets back one verdict row per constraint with the
observed metric. This is the gate a 100 TB ingestion run puts between
"crawled" and "trainable": fail the batch, not the training run.

Spark-first shape: every metric is an aggregate expression, so the
whole suite is ONE column-pruned scan + a single 1-row aggregation
(map-side partials; nothing but one counter row crosses the wire),
then a static unpivot of that row into verdicts. Uniqueness adds
count(distinct col) which Spark plans as an expand — still one pass
over the data. No UDFs, no collect.

Determinism: rates are fixed-point e6 via exact integer floor
division ((cnt * 1000000) div total) — bit-equal in any engine;
min/max/row-count metrics are exact longs scaled by 1e6. The DuckDB
oracle replays the identical integer arithmetic (`//`).

Reference: no constraint surface exists in /root/reference;
north-star pipeline surface (the public model is AWS Deequ's
Check/Constraint API, re-expressed as one Spark aggregation).
"""
from __future__ import annotations

import re
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000

#: kinds and their required spec keys (beyond name/col)
KINDS = {
    "completeness": ("min_rate",),
    "uniqueness": ("min_rate",),
    "min": ("bound",),
    "max": ("bound",),
    "in_set": ("values", "min_rate"),
    "matches": ("pattern", "min_rate"),
    "row_count": ("bound", "op"),
}


def _spec_error(i: int, spec: Mapping[str, Any], msg: str) -> ValueError:
    return ValueError(f"constraint #{i} ({spec.get('name', '?')}): {msg}")


def _validate(constraints: Sequence[Mapping[str, Any]]) -> None:
    if not constraints:
        raise ValueError("no constraints given")
    names = set()
    for i, spec in enumerate(constraints):
        kind = spec.get("kind")
        if kind not in KINDS:
            raise _spec_error(i, spec, f"unknown kind {kind!r}")
        name = spec.get("name")
        if not name or not isinstance(name, str) or name in names:
            raise _spec_error(i, spec, "missing or duplicate name")
        names.add(name)
        if kind != "row_count" and not spec.get("col"):
            raise _spec_error(i, spec, "missing col")
        for key in KINDS[kind]:
            if key not in spec:
                raise _spec_error(i, spec, f"missing {key!r}")
        # TYPE the parameters here: a TypeError later (int(None),
        # float('x'), list(42)) would escape the HTTP layer's
        # ValueError-only 400 contract.
        if "min_rate" in KINDS[kind] and not isinstance(
            spec["min_rate"], (int, float)
        ):
            raise _spec_error(i, spec, "min_rate must be a number")
        if "bound" in KINDS[kind] and (
            not isinstance(spec["bound"], int) or isinstance(spec["bound"], bool)
        ):
            raise _spec_error(i, spec, "bound must be an integer")
        if kind == "in_set" and not isinstance(spec["values"], (list, tuple)):
            raise _spec_error(i, spec, "values must be a list")
        if kind == "matches":
            if not isinstance(spec["pattern"], str):
                raise _spec_error(i, spec, "pattern must be a regex string")
            # Best-effort spec-time validation: a pattern Python's re
            # rejects would almost certainly throw Java-side at
            # execution time — surfacing as a 500 over HTTP instead of
            # the 400 every other malformed spec produces. Java-only
            # constructs Python lacks (\p{...} classes, possessive
            # quantifiers, \h \v \R) are neutralized first so valid
            # Java regexes are never rejected.
            try:
                re.compile(_pythonize_java_regex(spec["pattern"]))
            except re.error as exc:
                raise _spec_error(i, spec, f"invalid regex pattern: {exc}")
        if kind == "row_count" and spec["op"] not in (">=", "<="):
            raise _spec_error(i, spec, "row_count op must be '>=' or '<='")


def _pythonize_java_regex(pattern: str) -> str:
    """Rewrite Java-regex-only constructs into Python-compilable
    stand-ins so `re.compile` can act as a syntax checker for the
    shared subset (unbalanced groups/brackets, dangling quantifiers,
    bad repeat ranges) without false-rejecting valid Java patterns."""
    # \p{L} / \P{IsGreek} -> a single-char stand-in class
    out = re.sub(r"\\[pP]\{[^}]*\}", ".", pattern)
    # Java-only escapes \h \H \v \V \R (whitespace classes)
    out = re.sub(r"\\[hHvVR]", ".", out)
    # possessive quantifiers: X*+ X++ X?+ X{n,m}+ -> greedy forms
    out = re.sub(r"([*+?}])\+", r"\1", out)
    return out


def _div_e6(num: str, den: str) -> str:
    """Guarded exact fixed-point rate SQL: NULL on an empty
    denominator (ANSI mode makes a bare `div` throw DIVIDE_BY_ZERO),
    else (num * 1e6) div den — exact long floor division."""
    return (
        f"CASE WHEN {den} = 0 THEN CAST(NULL AS BIGINT) "
        f"ELSE ({num} * {E6}) div {den} END"
    )


def check_constraints(
    df: DataFrame, constraints: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Evaluate a declarative constraint suite in one aggregation pass.

    Each constraint is a mapping with `name`, `kind`, usually `col`,
    and the kind's parameters:

    - completeness: non-null rate of `col` >= `min_rate`
    - uniqueness:   distinct/non-null ratio of `col` >= `min_rate`
      (1.0 = no duplicate non-null values)
    - min / max:    observed min/max of `col` within `bound` (long)
    - in_set:       rate of rows with `col` in `values` >= `min_rate`
      (nulls count as non-members)
    - matches:      rate of rows whose `col` matches Java-regex
      `pattern` >= `min_rate` (nulls count as non-matching)
    - row_count:    count(*) `op` (one of '>=', '<=') `bound`

    Returns one row per constraint, in declaration order:
    (check_name, column, op, metric_e6, threshold_e6, passed) with
    metric/threshold in exact fixed-point e6 longs and passed an
    integer 0/1 (integer comparison of the two fixed points). A RATE
    over zero eligible rows is vacuously passed with null metric; a
    NULL min/max extremum (all-null or empty column) FAILS — that is
    the silent-degradation case a bounds gate exists to catch.
    """
    _validate(constraints)
    # Pass 1 plan: one aggregation row of RAW counts/extrema.
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_total")]
    # (name, column-or-'*', op, metric SQL over the agg row,
    #  threshold_e6, null_passes). null_passes is True only for RATE
    # metrics, whose denominator can legitimately be zero (a rate over
    # zero eligible rows is vacuously satisfied). An extremum (min/max)
    # is NULL only when the column is all-null or the table is empty —
    # exactly the silent-degradation case a bounds gate exists to
    # catch — so a NULL extremum FAILS the constraint.
    rows: list[tuple[str, str, str, str, int, bool]] = []
    for i, spec in enumerate(constraints):
        kind, a = spec["kind"], f"m{i}"
        col = spec.get("col", "*")
        if kind == "completeness":
            aggs.append(F.count(F.col(col)).alias(a))
            metric = _div_e6(a, "n_total")
            rows.append((spec["name"], col, ">=", metric, _rate_thr(spec), True))
        elif kind == "uniqueness":
            aggs.append(F.countDistinct(F.col(col)).alias(a))
            aggs.append(F.count(F.col(col)).alias(a + "d"))
            metric = _div_e6(a, f"{a}d")
            rows.append((spec["name"], col, ">=", metric, _rate_thr(spec), True))
        elif kind in ("min", "max"):
            # Numeric columns only: casting a string/date extremum to
            # long would yield NULL and pass vacuously forever.
            integral = _require_numeric(df, col, spec)
            fn = F.min if kind == "min" else F.max
            if integral:
                # exact long arithmetic; |value| bounded to ~9.2e12 by
                # the e6 representation (larger extrema overflow long
                # and fail LOUDLY under ANSI rather than wrapping).
                aggs.append(
                    (fn(F.col(col)).cast("long") * F.lit(E6)).alias(a)
                )
            else:
                # fractional types: scale THEN round — a violation
                # like min=-9.7 vs bound=-9 must keep its decimals in
                # the fixed point, not truncate to -9 and pass.
                aggs.append(
                    F.round(fn(F.col(col)).cast("double") * F.lit(E6))
                    .cast("long")
                    .alias(a)
                )
            metric = a
            op = ">=" if kind == "min" else "<="
            rows.append((spec["name"], col, op, metric, int(spec["bound"]) * E6, False))
        elif kind == "in_set":
            member = F.col(col).isin(list(spec["values"])) & F.col(col).isNotNull()
            aggs.append(F.sum(member.cast("long")).alias(a))
            metric = _div_e6(a, "n_total")
            rows.append((spec["name"], col, ">=", metric, _rate_thr(spec), True))
        elif kind == "matches":
            hit = F.col(col).rlike(spec["pattern"]) & F.col(col).isNotNull()
            aggs.append(F.sum(hit.cast("long")).alias(a))
            metric = _div_e6(a, "n_total")
            rows.append((spec["name"], col, ">=", metric, _rate_thr(spec), True))
        elif kind == "row_count":
            metric = f"n_total * {E6}"
            rows.append((spec["name"], "*", spec["op"], metric, int(spec["bound"]) * E6, False))
    one = df.agg(*aggs)
    # Static unpivot of the single aggregated row: ONE explode of a
    # literal struct array over `one` — the agg (and its scan) runs
    # exactly once; a union of per-constraint selects would replay
    # the scan per branch.
    structs = []
    for name, col, op, metric_sql, thr, null_passes in rows:
        metric = F.expr(metric_sql).cast("long")
        cmp = metric >= F.lit(thr) if op == ">=" else metric <= F.lit(thr)
        passed = F.when(
            metric.isNull(), F.lit(1 if null_passes else 0)
        ).otherwise(cmp.cast("int"))
        structs.append(
            F.struct(
                F.lit(name).alias("check_name"),
                F.lit(col).alias("column"),
                F.lit(op).alias("op"),
                metric.alias("metric_e6"),
                F.lit(thr).cast("long").alias("threshold_e6"),
                passed.alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("v")).select("v.*")


def _require_numeric(df: DataFrame, col: str, spec: Mapping[str, Any]) -> bool:
    """min/max only make fixed-point sense on numeric columns —
    anything else would cast to NULL and pass vacuously forever.
    Returns True for integral types (exact long path), False for
    fractional ones (rounded-double path). Unknown columns are left
    for the analyzer's own error."""
    from pyspark.sql import types as T

    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return True
    if isinstance(
        field.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return True
    if isinstance(
        field.dataType, (T.FloatType, T.DoubleType, T.DecimalType)
    ):
        return False
    raise ValueError(
        f"constraint {spec.get('name')!r}: min/max require a numeric "
        f"column; {col!r} is {field.dataType.simpleString()}"
    )


def _rate_thr(spec: Mapping[str, Any]) -> int:
    rate = float(spec["min_rate"])
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"constraint {spec.get('name')!r}: min_rate not in [0,1]")
    return int(round(rate * E6))
