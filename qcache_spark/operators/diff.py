"""Snapshot diff: what changed between two versions of a keyed table.

The data-ops primitive behind ingestion auditing ("what did today's
crawl replace?"), rollback decisions, and train/serve drift checks:
given two snapshots of the same logical table and its key columns,
classify every key as added / removed / changed / unchanged and count
which columns drove the changes.

Spark-first shape: ONE full-outer join keyed on the key columns — the
only shuffle, and it carries each snapshot exactly once. Row status
and per-column change flags are computed with null-safe comparisons
(`eqNullSafe`) inside the join projection, then a partial aggregation
collapses everything to a handful of counter rows. At 100 TB the cost
is the co-partitioned join of the two snapshots; bucketed storage on
the key makes it exchange-free.

Reference: no diff surface exists in /root/reference (qcache serves
one live table per key); north-star pipeline surface.
"""
from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots on `key_cols`.

    Returns one row per key present in either snapshot:
    (key..., status) with status in {'added','removed','changed',
    'unchanged'} plus one `chg_<col>` boolean per compared column
    ('added'/'removed' rows carry null flags). 'added' means present
    only in `right` (the newer snapshot), 'removed' only in `left`.

    Comparisons are null-safe: a null->value or value->null transition
    counts as a change; null->null does not. Duplicate keys within a
    snapshot are the caller's bug — the join would fan out; diff
    semantics need a keyed table.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} missing from a snapshot")
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys and c in right.columns]
    cols = list(compare_cols)
    overlap = set(cols) & set(keys)
    if overlap:
        raise ValueError(f"compare_cols overlap key_cols: {sorted(overlap)}")

    l = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in keys],
        *[F.col(c).alias(f"__l_{c}") for c in cols],
        F.lit(True).alias("__in_l"),
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in cols],
        F.lit(True).alias("__in_r"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__lk_{k}").eqNullSafe(F.col(f"__rk_{k}")) for k in keys],
    )
    j = l.join(r, cond, "full_outer")
    chg = {
        c: ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")) for c in cols
    }
    any_chg = (
        reduce(lambda a, b: a | b, chg.values()) if cols else F.lit(False)
    )
    status = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(any_chg, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    both = F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull()
    return j.select(
        *[
            F.coalesce(F.col(f"__lk_{k}"), F.col(f"__rk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        *[
            F.when(both, chg[c]).otherwise(F.lit(None)).alias(f"chg_{c}")
            for c in cols
        ],
    )


def snapshot_diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate diff report: (metric, n_rows) — one row per status
    plus one `col:<name>` row per compared column counting rows where
    that column changed. One join + one 1-row aggregation; the unpivot
    explodes the single aggregated row (the profile_table device)."""
    if compare_cols is None:
        common = [
            c for c in left.columns if c not in key_cols and c in right.columns
        ]
    else:
        common = list(compare_cols)
    d = snapshot_diff(left, right, key_cols, common)
    aggs = [
        F.sum((F.col("status") == s).cast("long")).alias(f"n_{s}")
        for s in ("added", "removed", "changed", "unchanged")
    ] + [
        F.sum(F.coalesce(F.col(f"chg_{c}").cast("long"), F.lit(0))).alias(f"n_chg_{c}")
        for c in common
    ]
    one = d.agg(*aggs)
    rows = F.array(
        *(
            [
                F.struct(F.lit(s).alias("metric"), F.col(f"n_{s}").alias("n_rows"))
                for s in ("added", "removed", "changed", "unchanged")
            ]
            + [
                F.struct(
                    F.lit(f"col:{c}").alias("metric"),
                    F.col(f"n_chg_{c}").alias("n_rows"),
                )
                for c in common
            ]
        )
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
