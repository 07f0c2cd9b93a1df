"""Approximate sketches — the cardinality/quantile/frequency tools a
100 TB pipeline reaches for when exact answers cost a full shuffle of
the key domain.

Everything here is a thin, typed veneer over Spark's JVM sketch
aggregates (Datasketches HLL, count-min, Greenwald-Khanna quantiles) —
partial-aggregation-capable, so a sketch of 100 TB is built map-side
and merged: the shuffle carries one sketch per (partition x group),
never the raw keys. The binary-sketch builders exist precisely for the
merge pattern: sketch each day/partition ONCE, store the bytes, and
answer "distinct users last N days" by unioning N sketches instead of
rescanning N days of data.

No counterpart anywhere in the reference (its aggregates are exact,
qcache/qframe/query.py) — this is north-star surface for the
training-data use case: vocabulary sizes, per-source unique-document
counts, token-length quantiles at corpus scale.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
    exact: bool = False,
) -> DataFrame:
    """Distinct-count of `col` per key group: HLL++ estimate
    (`approx_count_distinct`, relative standard deviation `rsd`) or
    the exact count for small domains. Both are one partial-agg
    shuffle; the approx version's shuffle rows are fixed-size sketches
    regardless of the value domain — the difference between moving
    kilobytes and terabytes at 100 TB."""
    agg = (
        F.count_distinct(F.col(col))
        if exact
        else F.approx_count_distinct(col, rsd=rsd)
    )
    return df.groupBy(*keys).agg(agg.alias("n_distinct"))


def hll_sketch_by(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable Datasketches HLL sketch bytes per key group
    (`hll_sketch_agg`). Store these next to each partition/day of a
    corpus; `hll_union_by` then answers cross-partition distinct
    counts without touching the data again."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll_sketch")
    )


def hll_union_by(
    sketches: DataFrame, keys: list[str], sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Union previously-built HLL sketches across a coarser grouping
    (e.g. per-day sketches -> per-source totals) and estimate. The
    input is sketch BYTES — this never rescans raw data."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias("n_distinct_est")
    )


def hll_estimate(sketches: DataFrame, sketch_col: str = "hll_sketch") -> DataFrame:
    """Point estimate for each sketch row."""
    return sketches.withColumn(
        "n_distinct_est", F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def quantile_rank_audit(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10000,
    estimates: DataFrame | None = None,
) -> DataFrame:
    """Rank-space audit of the Greenwald-Khanna guarantee: for each
    group and probability p, check that the sketch's estimate is a
    value whose rank interval intersects the guaranteed window
    ``[(p - 1/accuracy) x n, (p + 1/accuracy) x n]`` (±1 rank of
    float slack). Returns one row per group: the keys, ``n``
    (non-null count) and one ``ok_p{permille}`` boolean per
    probability.

    This is the externally-checkable form of "the sketch is within
    its documented bound": the exact side (n and TRUE) is replicable
    by any engine, while the estimate itself is engine-specific — the
    same envelope-gate device as the HLL q72 entry. Cost: the sketch
    pass plus ONE broadcast join of the O(groups) estimates and one
    partial-agg count pass — no sort, no full-rank materialization.

    ``estimates`` (tests only): inject an estimate frame in
    ``approx_quantiles_by``'s schema to prove the audit rejects
    out-of-envelope values.

    A group whose values are all null has n = 0 and null ok flags
    (no rank window exists to check)."""
    est = (
        estimates
        if estimates is not None
        else approx_quantiles_by(df, keys, col, probabilities, accuracy)
    )
    j = df.join(F.broadcast(est), keys)
    aggs = [F.count(F.col(col)).alias("n")]
    for i in range(len(probabilities)):
        qi = F.col("quantiles")[i]
        aggs.append(
            F.sum((F.col(col) < qi).cast("long")).alias(f"__lt{i}")
        )
        aggs.append(
            F.sum((F.col(col) <= qi).cast("long")).alias(f"__le{i}")
        )
    g = j.groupBy(*keys).agg(*aggs)
    out = [*keys, "n"]
    sel = [F.col(c) for c in out]
    eps = 1.0 / accuracy
    for i, p in enumerate(probabilities):
        # the estimate occupies the rank interval [lt+1, le] (its
        # duplicate range); GK guarantees SOME rank in the window —
        # intersection, with ±1 rank of float-rounding slack
        lo = F.lit(p - eps) * F.col("n") - 1
        hi = F.lit(p + eps) * F.col("n") + 1
        ok = (F.col(f"__le{i}") >= lo) & ((F.col(f"__lt{i}") + 1) <= hi)
        sel.append(ok.alias(f"ok_p{int(round(p * 1000))}"))
    return g.select(*sel)


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles via percentile_approx (Greenwald-Khanna):
    one pass, bounded memory per group regardless of group size —
    the way to get token-length p50/p95/p99 per source over a corpus
    that does not fit a sort."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return df.groupBy(*keys).agg(
        F.percentile_approx(F.col(col), probs, F.lit(accuracy)).alias("quantiles")
    )
