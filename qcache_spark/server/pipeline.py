"""Read-only pipeline-operator endpoint (VERDICT r5 item 5).

The reference's value proposition is queries-over-HTTP (qcache
README.rst: store a table, query it without writing code against the
engine). The training-data operator families this engine adds on top
(dedup, sketches, sampling, text quality) were Python-API only; this
module exposes the flagship ones through the same serving layer:

    POST /qcache/dataset/<key>/pipeline   {"op": <name>, "params": {…}}

Supported ops — all read-only AGGREGATE shapes (the result is a
summary, never a re-materialized table, so the endpoint stays safe to
expose and cheap to serve):

    dedup_count      exact duplicate census over all or a subset of
                     columns → one row {n_rows, n_distinct, n_duplicates}
    cardinality      HLL++ (or exact) distinct count of one column,
                     optionally grouped → one row per group, capped at
                     the top 1000 groups by distinct count (the cap
                     keeps a near-unique group key from
                     re-materializing the dataset over the wire)
    split_counts     deterministic hash split (train_test_split) →
                     one row per split name with its row count
    quality_summary  text quality_score distribution → one row
                     {n_rows, avg_quality, min_quality, max_quality,
                      p50_quality}
    top_values       exact heavy hitters of one column → n rows
                     {value, n_rows}, deterministic tiebreak
    histogram        fixed-width bins over a numeric column → one row
                     per non-empty bin {bin_start, bin_end, n_rows};
                     numpy closed-right-edge convention, bins ≤ 1000
    funnel           strict ordered conversion funnel over event rows
                     → one row per step {step_index, step, n_users}
    percentiles      Greenwald-Khanna approx quantiles of a numeric
                     column, optionally grouped → one flat row per
                     group with a p<prob> column per probability
    ohlc             OHLC bars per (group, epoch-second bucket) →
                     {bucket_start_s, n, open, high, low, close,
                      sum_value_e4}; first 1000 buckets in key order
    percentile_stats exact per-group percentile + winsorized tail
                     stats (the distributed-rank device) → one row
                     per group
    transitions      first-order Markov transition counts over
                     per-user event sequences → top 1000 pairs by
                     count {from_type, to_type, n_transitions,
                      n_users}
    snapshot_diff    two-dataset diff summary: the stored dataset is
                     the LEFT (older) snapshot, params.right names
                     the newer one → (metric, n_rows) rows for
                     added/removed/changed/unchanged plus a
                     col:<name> row per compared column

Discipline matches the query endpoint: any malformed body — bad JSON,
unknown op, unknown/missing/mistyped params, unknown columns — raises
MalformedQueryException, which the HTTP layer maps to a 400 with the
message; unknown dataset stays a 404. Responses go through the same
CSV/JSON content negotiation as query results.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import MalformedQueryException
from ..operators import dedup as _dedup  # noqa: F401  (family anchor)
from ..operators import sketch as _sketch
from ..operators import text as _text
from ..operators.sampling import train_test_split


def _fail(msg: str):
    raise MalformedQueryException(msg)


def _check_columns(df: DataFrame, cols: list, what: str) -> list[str]:
    if (
        not isinstance(cols, list)
        or not cols
        or not all(isinstance(c, str) for c in cols)
    ):
        _fail(f"{what} must be a non-empty list of column names")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        _fail(f"Unknown column(s) in {what}: {missing}")
    return cols


def _check_column(df: DataFrame, col, what: str) -> str:
    if not isinstance(col, str):
        _fail(f"{what} must be a column name string")
    if col not in df.columns:
        _fail(f"Unknown column in {what}: {col!r}")
    return col


def _reject_unknown(params: dict, allowed: set[str], op: str) -> None:
    unknown = set(params) - allowed
    if unknown:
        _fail(f"Unknown parameter(s) for op {op!r}: {sorted(unknown)}")


# Hard bound on rows any pipeline op may return: the endpoint serves
# SUMMARIES; a grouped op on a near-unique key must not re-materialize
# the dataset over HTTP.
_MAX_GROUPS = 1000


def _op_dedup_count(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"columns"}, "dedup_count")
    cols = params.get("columns")
    if cols is not None:
        cols = _check_columns(df, cols, "columns")
    else:
        cols = df.columns
    # two single-row aggregates cross-joined: both partial-aggregate
    # map-side, the distinct is one shuffle on the chosen columns only
    n_rows = df.agg(F.count(F.lit(1)).alias("n_rows"))
    n_distinct = (
        df.select(*cols).distinct().agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return n_rows.crossJoin(n_distinct).select(
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("n_duplicates"),
    )


def _op_cardinality(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"column", "group_by", "rsd", "exact"}, "cardinality")
    if "column" not in params:
        _fail("cardinality requires a 'column' parameter")
    col = _check_column(df, params["column"], "column")
    keys = params.get("group_by", [])
    if not isinstance(keys, list):
        _fail("group_by must be a list of column names")
    if keys:
        keys = _check_columns(df, keys, "group_by")
    rsd = params.get("rsd", 0.05)
    if not isinstance(rsd, (int, float)) or isinstance(rsd, bool) or not (
        0 < rsd <= 0.5
    ):
        _fail("rsd must be a number in (0, 0.5]")
    exact = params.get("exact", False)
    if not isinstance(exact, bool):
        _fail("exact must be a boolean")
    out = _sketch.cardinality_by(df, list(keys), col, rsd=float(rsd), exact=exact)
    if keys:
        # keep the aggregate-summary contract: a (near-)unique group
        # key would otherwise re-materialize the dataset over HTTP.
        # Top groups by distinct count, deterministic tiebreak.
        out = out.orderBy(
            F.col("n_distinct").desc(), *[F.col(k) for k in keys]
        ).limit(_MAX_GROUPS)
    return out


def _op_split_counts(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"key_column", "weights", "seed"}, "split_counts")
    if "key_column" not in params:
        _fail("split_counts requires a 'key_column' parameter")
    key = _check_column(df, params["key_column"], "key_column")
    weights = params.get("weights")
    if (
        not isinstance(weights, dict)
        or not weights
        or not all(isinstance(k, str) for k in weights)
        or not all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in weights.values()
        )
    ):
        _fail("weights must be a non-empty {split_name: number} object")
    seed = params.get("seed", 0)
    if not isinstance(seed, int) or isinstance(seed, bool):
        _fail("seed must be an integer")
    try:
        split = train_test_split(df, key, dict(weights), seed=seed)
    except ValueError as e:  # negative / zero-sum weights
        _fail(f"Invalid weights: {e}")
    # NULL keys get a NULL split by contract (no stable identity →
    # never silently lands in a split); the NULL-count row surfaces
    # them instead of hiding them
    return split.groupBy("split").agg(F.count(F.lit(1)).alias("n_rows"))


def _op_quality_summary(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"text_column"}, "quality_summary")
    col = params.get("text_column", "text")
    col = _check_column(df, col, "text_column")
    from pyspark.sql import types as T

    if not isinstance(df.schema[col].dataType, T.StringType):
        _fail(f"text_column {col!r} must be a string column")
    scored = _text.quality_score(df, col)
    return scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
        F.percentile_approx("quality_score", 0.5).alias("p50_quality"),
    )


def _op_top_values(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"column", "n"}, "top_values")
    if "column" not in params:
        _fail("top_values requires a 'column' parameter")
    col = _check_column(df, params["column"], "column")
    n = params.get("n", 10)
    if not isinstance(n, int) or isinstance(n, bool) or not (1 <= n <= 1000):
        _fail("n must be an integer in [1, 1000]")
    # heavy hitters: one partial-agg shuffle on the column, then a
    # top-n TakeOrdered — deterministic tiebreak on the value itself
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col("value"))
        .limit(n)
    )


def _op_histogram(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(params, {"column", "bins", "min", "max"}, "histogram")
    if "column" not in params:
        _fail("histogram requires a 'column' parameter")
    col = _check_column(df, params["column"], "column")
    from pyspark.sql import types as T

    if not isinstance(
        df.schema[col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        _fail(f"histogram column {col!r} must be numeric")
    bins = params.get("bins", 20)
    if not isinstance(bins, int) or isinstance(bins, bool) or not (1 <= bins <= 1000):
        _fail("bins must be an integer in [1, 1000]")
    for k in ("min", "max"):
        if k in params and (
            not isinstance(params[k], (int, float)) or isinstance(params[k], bool)
        ):
            _fail(f"{k} must be a number")
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    lo, hi = params.get("min"), params.get("max")
    if lo is None or hi is None:
        row = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
        # empty / all-null / all-NaN column: min and max come back
        # null — a well-formed request over degenerate data, so an
        # empty histogram, not a 500 (float(None) raised; ADVICE r6)
        if (lo is None and row["lo"] is None) or (hi is None and row["hi"] is None):
            return vals.limit(0).select(
                F.col("v").alias("bin_start"),
                F.col("v").alias("bin_end"),
                F.lit(0).cast("long").alias("n_rows"),
            )
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    lo, hi = float(lo), float(hi)
    if not (lo < hi):
        # degenerate domain (constant column / empty input): one bin
        return vals.filter(F.col("v") == lo).agg(
            F.lit(lo).alias("bin_start"),
            F.lit(hi).alias("bin_end"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    width = (hi - lo) / bins
    # values exactly at the max edge belong to the LAST bin (the
    # numpy.histogram closed-right-edge convention)
    idx = F.least(
        F.greatest(F.floor((F.col("v") - lo) / width), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return (
        vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            (F.lit(lo) + F.col("bin") * width).alias("bin_start"),
            (F.lit(lo) + (F.col("bin") + 1) * width).alias("bin_end"),
            "n_rows",
        )
        .orderBy("bin_start")
    )


def _op_percentiles(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(
        params, {"column", "probabilities", "group_by", "accuracy"}, "percentiles"
    )
    if "column" not in params:
        _fail("percentiles requires a 'column' parameter")
    col = _check_column(df, params["column"], "column")
    from pyspark.sql import types as T

    if not isinstance(
        df.schema[col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        _fail(f"percentiles column {col!r} must be numeric")
    probs = params.get("probabilities", [0.5, 0.9, 0.99])
    if (
        not isinstance(probs, list)
        or not probs
        or len(probs) > 100
        or not all(
            isinstance(p, (int, float))
            and not isinstance(p, bool)
            and 0.0 <= p <= 1.0
            for p in probs
        )
    ):
        _fail("probabilities must be 1-100 numbers in [0, 1]")
    keys = params.get("group_by", [])
    if not isinstance(keys, list):
        _fail("group_by must be a list of column names")
    if keys:
        keys = _check_columns(df, keys, "group_by")
    accuracy = params.get("accuracy", 10000)
    if not isinstance(accuracy, int) or isinstance(accuracy, bool) or not (
        100 <= accuracy <= 100000
    ):
        _fail("accuracy must be an integer in [100, 100000]")
    from ..operators.sketch import approx_quantiles_by

    out = approx_quantiles_by(df, list(keys), col, [float(p) for p in probs],
                              accuracy=accuracy)
    # one column per requested probability (wire-friendly flat row)
    out = out.select(
        *keys,
        *[
            F.col("quantiles")[i].alias(f"p{str(p).replace('.', '_')}")
            for i, p in enumerate(probs)
        ],
    )
    if keys:
        out = out.orderBy(*[F.col(k) for k in keys]).limit(_MAX_GROUPS)
    return out


def _op_funnel(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(
        params, {"steps", "user_column", "type_column", "ts_column"}, "funnel"
    )
    steps = params.get("steps")
    if (
        not isinstance(steps, list)
        or len(steps) < 1
        or not all(isinstance(s, str) for s in steps)
    ):
        _fail("funnel requires 'steps': a non-empty list of event-type strings")
    if len(set(steps)) != len(steps):
        _fail(f"funnel steps must be distinct, got {steps}")
    user = _check_column(df, params.get("user_column", "user_id"), "user_column")
    typ = _check_column(df, params.get("type_column", "event_type"), "type_column")
    ts = _check_column(df, params.get("ts_column", "ts"), "ts_column")
    from ..operators.funnel import user_funnel

    return user_funnel(df, steps, user_col=user, type_col=typ, ts_col=ts)


def _check_numeric(df: DataFrame, col: str, op: str) -> None:
    from pyspark.sql import types as T

    if not isinstance(
        df.schema[col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        _fail(f"{op} column {col!r} must be numeric")


def _op_ohlc(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(
        params,
        {"ts_column", "value_column", "id_column", "group_by",
         "bucket_seconds"},
        "ohlc",
    )
    ts = _check_column(df, params.get("ts_column", "ts"), "ts_column")
    val = _check_column(df, params.get("value_column", "value"), "value_column")
    _check_numeric(df, val, "ohlc")
    ident = _check_column(df, params.get("id_column", "event_id"), "id_column")
    group = params.get("group_by")
    if group is not None:
        group = _check_column(df, group, "group_by")
    secs = params.get("bucket_seconds", 3600)
    if not isinstance(secs, int) or isinstance(secs, bool) or not (
        1 <= secs <= 86400 * 366
    ):
        _fail("bucket_seconds must be an integer in [1, 31622400]")
    from ..operators.timeseries import ohlc

    out = ohlc(df, ts_col=ts, value_col=val, id_col=ident,
               group_col=group, bucket_seconds=secs)
    order = ([F.col(group)] if group else []) + [F.col("bucket_start_s")]
    return out.orderBy(*order).limit(_MAX_GROUPS)


def _op_percentile_stats(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(
        params, {"group_column", "value_column", "id_column", "pct"},
        "percentile_stats",
    )
    group = _check_column(
        df, params.get("group_column", "event_type"), "group_column"
    )
    val = _check_column(df, params.get("value_column", "value"), "value_column")
    _check_numeric(df, val, "percentile_stats")
    ident = _check_column(df, params.get("id_column", "event_id"), "id_column")
    pct = params.get("pct", 0.99)
    if (
        not isinstance(pct, (int, float))
        or isinstance(pct, bool)
        or not (0.0 < float(pct) <= 1.0)
    ):
        _fail("pct must be a number in (0, 1]")
    from ..operators.timeseries import grouped_percentile_stats

    out = grouped_percentile_stats(
        df, group_col=group, value_col=val, id_col=ident, pct=float(pct)
    )
    return out.orderBy(F.col(group)).limit(_MAX_GROUPS)


def _op_transitions(df: DataFrame, params: dict) -> DataFrame:
    _reject_unknown(
        params, {"user_column", "type_column", "ts_column", "id_column"},
        "transitions",
    )
    user = _check_column(df, params.get("user_column", "user_id"), "user_column")
    typ = _check_column(df, params.get("type_column", "event_type"), "type_column")
    ts = _check_column(df, params.get("ts_column", "ts"), "ts_column")
    ident = _check_column(df, params.get("id_column", "event_id"), "id_column")
    from ..operators.funnel import event_transitions

    out = event_transitions(df, user_col=user, type_col=typ, ts_col=ts,
                            id_col=ident)
    return out.orderBy(
        F.col("n_transitions").desc(), "from_type", "to_type"
    ).limit(_MAX_GROUPS)


def _op_snapshot_diff(df: DataFrame, params: dict,
                      resolve=None) -> DataFrame:
    """Two-dataset op (the endpoint's first): `df` is the LEFT (older)
    snapshot, params['right'] names the stored dataset that is the
    newer one. Result is the aggregate summary (metric, n_rows) —
    4 status rows + one col:<name> row per compared column — never
    the row-level diff (the endpoint serves summaries)."""
    _reject_unknown(params, {"right", "keys", "compare_columns"},
                    "snapshot_diff")
    right_key = params.get("right")
    if not isinstance(right_key, str) or not right_key:
        _fail("snapshot_diff requires 'right': the other dataset's key")
    if resolve is None:
        _fail("snapshot_diff is only available over the HTTP endpoint")
    right = resolve(right_key)  # UnknownDatasetException -> 404 upstream
    keys = params.get("keys")
    if (
        not isinstance(keys, list)
        or not keys
        or not all(isinstance(k, str) for k in keys)
    ):
        _fail("snapshot_diff requires 'keys': a non-empty list of columns")
    for k in keys:
        if k not in df.columns:
            _fail(f"Unknown key column in left snapshot: {k!r}")
        if k not in right.columns:
            _fail(f"Unknown key column in right snapshot: {k!r}")
    compare = params.get("compare_columns")
    if compare is not None:
        _check_columns(df, compare, "compare_columns")
        missing = [c for c in compare if c not in right.columns]
        if missing:
            _fail(f"Unknown column(s) in right snapshot: {missing}")
        if set(compare) & set(keys):
            _fail("compare_columns must not overlap keys")
    from ..operators.diff import snapshot_diff_summary

    return snapshot_diff_summary(df, right, keys, compare)


def _op_check_constraints(df: DataFrame, params: dict) -> DataFrame:
    """Deequ-style constraint suite (operators/quality.py) over the
    stored dataset: params['constraints'] is the declarative spec
    list; the result is one verdict row per constraint (bounded by
    the suite length). Spec validation errors surface as the
    endpoint's 400, same as every other malformed body."""
    _reject_unknown(params, {"constraints"}, "check_constraints")
    specs = params.get("constraints")
    if not isinstance(specs, list) or not specs:
        _fail("check_constraints requires 'constraints': a non-empty list")
    if len(specs) > 100:
        _fail("check_constraints: at most 100 constraints per request")
    if not all(isinstance(s, dict) for s in specs):
        _fail("check_constraints: every constraint must be an object")
    for s in specs:
        col = s.get("col")
        if col is not None and col not in df.columns:
            _fail(f"Unknown column in constraint {s.get('name')!r}: {col!r}")
    from ..operators.quality import check_constraints

    try:
        return check_constraints(df, specs)
    except ValueError as e:
        _fail(str(e))


def _op_drift(df: DataFrame, params: dict, resolve=None) -> DataFrame:
    """Two-dataset PSI drift audit (operators/drift.py): `df` is the
    BASE (older) snapshot, params['right'] names the stored dataset
    to compare against; 'categorical' lists value-bucketed columns,
    'numeric_bins' maps columns to frozen integer edge lists. Returns
    the per-bucket PSI rows (a counter summary, never data)."""
    _reject_unknown(params, {"right", "categorical", "numeric_bins"}, "drift")
    right_key = params.get("right")
    if not isinstance(right_key, str) or not right_key:
        _fail("drift requires 'right': the newer dataset's key")
    if resolve is None:
        _fail("drift is only available over the HTTP endpoint")
    right = resolve(right_key)
    # Normalize BEFORE the truthiness branch: an explicit falsy
    # non-list ('categorical': null/0/"") must hit the isinstance
    # 400, not sail past `if cats:` into a TypeError-500 downstream.
    cats = params.get("categorical") or []
    if not isinstance(cats, list):
        _fail("categorical must be a list of column names")
    bins = params.get("numeric_bins") or {}
    if not isinstance(bins, dict):
        _fail("numeric_bins must map column -> sorted integer edges")
    if cats:
        _check_columns(df, cats, "categorical")
        _check_columns(right, cats, "categorical (right snapshot)")
    for c in bins:
        _check_column(df, c, "numeric_bins")
        _check_column(right, c, "numeric_bins (right snapshot)")
    from ..operators.drift import population_stability

    try:
        out = population_stability(df, right, cats, bins)
    except ValueError as e:
        _fail(str(e))
    # A column's PSI is the SUM of its bucket rows, so (unlike the
    # ranking ops) a silent limit() would under-report drift. Compute
    # once, then refuse over-cap results outright.
    rows = out.orderBy("column", "bucket").limit(_MAX_GROUPS + 1).collect()
    if len(rows) > _MAX_GROUPS:
        _fail(
            f"drift produced more than {_MAX_GROUPS} buckets; a "
            "categorical column is too high-cardinality — bin it via "
            "numeric_bins or pre-bucket the column"
        )
    return df.sparkSession.createDataFrame(rows, out.schema)


_OPS = {
    "dedup_count": _op_dedup_count,
    "cardinality": _op_cardinality,
    "split_counts": _op_split_counts,
    "quality_summary": _op_quality_summary,
    "top_values": _op_top_values,
    "histogram": _op_histogram,
    "funnel": _op_funnel,
    "percentiles": _op_percentiles,
    "ohlc": _op_ohlc,
    "percentile_stats": _op_percentile_stats,
    "transitions": _op_transitions,
    "snapshot_diff": _op_snapshot_diff,
    "check_constraints": _op_check_constraints,
    "drift": _op_drift,
}

# ops that read a second stored dataset named in params (need the
# catalog resolver threaded through)
_TWO_DATASET_OPS = {"snapshot_diff", "drift"}


def run_pipeline_op(df: DataFrame, spec, resolve=None) -> DataFrame:
    """Validate a pipeline request body and return the (lazy) result
    DataFrame. Raises MalformedQueryException on ANY invalid input —
    the HTTP layer's 400 contract. `resolve` maps a dataset key to its
    DataFrame for two-dataset ops (HTTP passes the catalog; the
    Python API may pass any mapping function)."""
    if not isinstance(spec, dict):
        _fail("Pipeline body must be a JSON object")
    unknown = set(spec) - {"op", "params"}
    if unknown:
        _fail(f"Unknown key(s) in pipeline body: {sorted(unknown)}")
    op = spec.get("op")
    if not isinstance(op, str) or op not in _OPS:
        _fail(
            f"Unknown pipeline op: {op!r} (supported: {sorted(_OPS)})"
        )
    params = spec.get("params", {})
    if not isinstance(params, dict):
        _fail("params must be a JSON object")
    if op in _TWO_DATASET_OPS:
        return _OPS[op](df, dict(params), resolve=resolve)
    return _OPS[op](df, dict(params))
