"""Distribution drift between two corpus snapshots (PSI).

The training-data-ops primitive behind "did today's crawl shift?":
given yesterday's and today's snapshot of the same logical table,
report the Population Stability Index per tracked column — the
standard drift score (banking/ML monitoring; PSI < 0.1 stable,
0.1-0.25 moderate, > 0.25 action). `snapshot_diff`
(operators/diff.py) answers *which keyed rows* changed; this answers
whether the *distribution* moved, which is what matters for unkeyed
corpus shards where every row is new.

Spark-first shape: each snapshot is scanned ONCE. Every row emits one
(column, bucket) pair per tracked column via a static explode of
literal/when-chain structs (whole-stage codegen, no UDF), then a
partial aggregation collapses each scan to at most K = sum of
per-column bucket counts rows BEFORE the shuffle — the exchanges
carry O(K) counter rows, never data. Per-column totals are window
aggregates over the counter frame (not a groupBy + join-back, which
would make Catalyst recompute the counts subtree — and its scans —
once per consumer), so at 100 TB the cost is exactly two
column-pruned scans, plan-pinned in pytest.

Determinism: counts are exact longs; the PSI contribution is snapped
to fixed-point 1e-6 per bucket with one fixed parenthesization, so
the per-column total is exact integer addition — bit-equal in any
engine that evaluates the same double expression (the DuckDB oracle
replays the identical formula).

Numeric bucket edges are CALLER-SUPPLIED (production: yesterday's
percentiles), not computed here — drift must be measured against a
frozen binning or the bins themselves absorb the drift.

Reference: no drift surface exists in /root/reference (qcache serves
one live table); north-star pipeline surface.
"""
from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_BUCKET = "<null>"

#: additive smoothing mass per bucket (Laplace 1/2), in e6 fixed
#: point only for documentation — the formula uses the literal 0.5.
SMOOTHING = 0.5


def numeric_bucket_label(edges: Sequence[int]) -> list[str]:
    """The closed-form bucket labels for a sorted edge list:
    (-inf,e1), [e1,e2), ..., [ek,inf). Shared with the SQL oracle
    generator so the two sides cannot drift on formatting."""
    edges = list(edges)
    labels = [f"(-inf,{edges[0]})"]
    for lo, hi in zip(edges, edges[1:]):
        labels.append(f"[{lo},{hi})")
    labels.append(f"[{edges[-1]},inf)")
    return labels


def _numeric_bucket_expr(col: str, edges: Sequence[int]):
    labels = numeric_bucket_label(edges)
    expr = F.when(F.col(col).isNull(), F.lit(NULL_BUCKET))
    expr = expr.when(F.col(col) < edges[0], F.lit(labels[0]))
    for hi, label in zip(edges[1:], labels[1:-1]):
        expr = expr.when(F.col(col) < hi, F.lit(label))
    return expr.otherwise(F.lit(labels[-1]))


def _bucketize(
    snap: DataFrame,
    categorical_cols: Sequence[str],
    numeric_bins: Mapping[str, Sequence[int]],
    n_alias: str,
) -> DataFrame:
    structs = []
    for c in categorical_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(c).cast("string"), F.lit(NULL_BUCKET)).alias(
                    "bucket"
                ),
            )
        )
    for c, edges in numeric_bins.items():
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                _numeric_bucket_expr(c, edges).alias("bucket"),
            )
        )
    return (
        snap.select(F.explode(F.array(*structs)).alias("cb"))
        .select("cb.column", "cb.bucket")
        .groupBy("column", "bucket")
        .agg(F.count(F.lit(1)).alias(n_alias))
    )


def validate_tracking(
    categorical_cols: Sequence[str],
    numeric_bins: Mapping[str, Sequence[int]] | None,
) -> tuple[list[str], dict[str, list[int]]]:
    """Shared spec validation for batch PSI and the streaming
    monitor; returns the normalized (cats, bins) pair."""
    try:
        numeric_bins = {c: list(e) for c, e in (numeric_bins or {}).items()}
    except TypeError:
        raise ValueError(
            "numeric_bins must map column -> a list of integer edges"
        ) from None
    cats = list(categorical_cols)
    if not cats and not numeric_bins:
        raise ValueError("nothing to track: no columns given")
    for c, edges in numeric_bins.items():
        # type check FIRST: sorted() over mixed int/str raises
        # TypeError, which would escape the HTTP layer's
        # ValueError-only 400 contract.
        if not edges or any(
            not isinstance(e, int) or isinstance(e, bool) for e in edges
        ):
            raise ValueError(f"numeric_bins[{c!r}] must be integer edges")
        if sorted(edges) != edges or len(set(edges)) != len(edges):
            raise ValueError(f"numeric_bins[{c!r}] must be sorted distinct edges")
    seen = cats + list(numeric_bins)
    if len(set(seen)) != len(seen):
        raise ValueError("a column appears in both categorical and numeric")
    return cats, numeric_bins


def bucket_counts(
    snap: DataFrame,
    categorical_cols: Sequence[str] = (),
    numeric_bins: Mapping[str, Sequence[int]] | None = None,
    n_alias: str = "n",
) -> DataFrame:
    """One snapshot's (column, bucket, count) histogram under the
    tracking spec — the frozen-reference half of the streaming
    monitor (compute once, reuse per micro-batch)."""
    cats, bins = validate_tracking(categorical_cols, numeric_bins)
    return _bucketize(snap, cats, bins, n_alias)


def psi_from_counts(base_counts: DataFrame, curr_counts: DataFrame) -> DataFrame:
    """PSI rows from two pre-computed histograms (schemas
    (column, bucket, base_n) / (column, bucket, curr_n)): the
    full-outer bucket alignment, per-column totals via a window over
    the counter frame, and the snapped smoothed-PSI formula."""
    from pyspark.sql import Window

    counts = (
        base_counts.join(curr_counts, ["column", "bucket"], "full_outer")
        .select(
            "column",
            "bucket",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("curr_n", F.lit(0)).alias("curr_n"),
        )
    )
    # Per-column totals + bucket count as WINDOW aggregates over the
    # counter frame: a groupBy + join-back would make Catalyst compute
    # the whole counts subtree (and its two snapshot scans) TWICE —
    # the window is one extra O(K)-row exchange instead, and each
    # snapshot is scanned exactly once (plan-pinned in pytest).
    wcol = Window.partitionBy("column")
    joined = (
        counts.withColumn("base_total", F.sum("base_n").over(wcol))
        .withColumn("curr_total", F.sum("curr_n").over(wcol))
        .withColumn("k_buckets", F.count(F.lit(1)).over(wcol))
    )
    # Fixed parenthesization, snapped once per bucket: the oracle
    # replays this exact double expression.
    p = (F.col("base_n").cast("double") + F.lit(0.5)) / (
        F.col("base_total").cast("double") + F.lit(0.5) * F.col("k_buckets")
    )
    q = (F.col("curr_n").cast("double") + F.lit(0.5)) / (
        F.col("curr_total").cast("double") + F.lit(0.5) * F.col("k_buckets")
    )
    psi = F.round((q - p) * F.log(q / p) * F.lit(1e6)).cast("long")
    return joined.select(
        "column",
        "bucket",
        "base_n",
        "curr_n",
        psi.alias("psi_e6"),
    )


def population_stability(
    base: DataFrame,
    curr: DataFrame,
    categorical_cols: Sequence[str] = (),
    numeric_bins: Mapping[str, Sequence[int]] | None = None,
) -> DataFrame:
    """Per-bucket PSI contributions between two snapshots.

    Returns one row per (column, bucket) observed in EITHER snapshot:
    (column, bucket, base_n, curr_n, psi_e6) where psi_e6 =
    round(1e6 * (q - p) * ln(q / p)) with Laplace-smoothed shares
    p = (base_n + 0.5) / (base_N + 0.5 k), q likewise for curr, and
    k the column's observed bucket count (so empty-on-one-side
    buckets contribute a finite, bounded term instead of ±inf). The
    column's PSI is the exact integer sum of its psi_e6 rows.

    `categorical_cols` bucket by value (nulls to '<null>');
    `numeric_bins[col]` is a sorted list of INT edges defining
    (-inf,e1), [e1,e2), ..., [ek,inf) — pass a frozen binning
    (e.g. the base snapshot's historical percentiles).
    """
    cats, bins = validate_tracking(categorical_cols, numeric_bins)
    return psi_from_counts(
        _bucketize(base, cats, bins, "base_n"),
        _bucketize(curr, cats, bins, "curr_n"),
    )


def psi_summary(psi_rows: DataFrame) -> DataFrame:
    """Collapse `population_stability` output to one row per column:
    (column, psi_e6, n_buckets). Exact long addition of the snapped
    per-bucket terms."""
    return psi_rows.groupBy("column").agg(
        F.sum("psi_e6").alias("psi_e6"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
