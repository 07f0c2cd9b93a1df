"""Skew-mitigation helpers for hot keys at scale.

AQE's skew-join splitting handles most cases automatically; these
helpers cover the remaining one — a GROUP BY where a handful of keys
own most rows, so one reducer runs for hours while the rest idle.

`salted_aggregate` runs the classic two-phase rewrite for
decomposable aggregates:

    phase 1: groupBy(keys + salt) — the hot key's rows spread over
             `salt_buckets` reducers, each producing a partial row
    phase 2: groupBy(keys) re-combines the ≤ salt_buckets partials

Cost: one extra (tiny) shuffle over the partials. Win: the heaviest
reducer shrinks by ~salt_buckets×. The rewrite is exact for
sum/count/min/max (and their compositions like dsum/msum); avg is
derived as a sum+count pair.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"

# (phase1 partial, phase2 recombine) per aggregate kind
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output column → (fn, input column) with fn in
    sum/count/min/max/avg. Example:

        salted_aggregate(li, ["l_returnflag"],
                         {"qty": ("sum", "l_quantity"),
                          "n": ("count", "l_orderkey"),
                          "avg_price": ("avg", "l_extendedprice")})
    """
    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            phase1_aggs.append(F.sum(col).alias(f"{out}__s"))
            phase1_aggs.append(F.count(col).alias(f"{out}__c"))
            phase2_aggs.append(
                F.try_divide(F.sum(f"{out}__s"), F.sum(f"{out}__c")).alias(out)
            )
            continue
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"Non-decomposable aggregate for salting: {fn}")
        partial, combine = _DECOMPOSABLE[fn]
        phase1_aggs.append(partial(col).alias(f"{out}__p"))
        phase2_aggs.append(combine(f"{out}__p").alias(out))

    salted = df.withColumn(
        SALT_COL, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partials = salted.groupBy(*keys, SALT_COL).agg(*phase1_aggs)
    return partials.groupBy(*keys).agg(*phase2_aggs)


def skewed_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    hot_keys: list | None = None,
    top_n: int = 10,
    min_count: int = 100_000,
) -> DataFrame:
    """Explicit skew-split equi-join: route the hottest join keys
    through a broadcast join and everything else through the normal
    shuffled join, then union.

        left ⋈ right  ==  (left[hot] ⋈_broadcast right[hot])
                          ∪ (left[¬hot] ⋈_shuffle right)

    AQE's skew splitting covers most cases at runtime; this helper is
    for the cases where an explicit, deterministic plan is wanted —
    AQE disabled, a key so hot its split count explodes, or a join
    inside a streaming micro-batch (no AQE re-plan). The split is
    EXACT for inner/left joins: null keys never match `isin` and land
    in the cold branch, preserving their left-join semantics, and the
    right side is filtered only in the hot branch (cold branch sees
    the full right table, so cold matches are complete).

    hot_keys=None detects them with one aggregation on the left
    table's key column: the top_n keys by count, kept only above
    min_count rows (below that, skew does not matter). The detection
    collect is O(top_n) scalars.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    if not isinstance(on, str):
        raise ValueError(
            f"skewed_join splits on ONE key column, got {on!r}; "
            "for composite keys pre-concatenate them into a single column"
        )
    if hot_keys is None:
        hot_rows = (
            left.groupBy(on)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_count)
            .orderBy(F.col("_n").desc())
            .limit(top_n)
            .collect()
        )
        hot_keys = [r[on] for r in hot_rows if r[on] is not None]
    if not hot_keys:
        return left.join(right, on, how)
    l_hot = left.filter(F.col(on).isin(hot_keys))
    l_cold = left.filter(~F.col(on).isin(hot_keys) | F.col(on).isNull())
    r_hot = right.filter(F.col(on).isin(hot_keys))
    joined_hot = l_hot.join(F.broadcast(r_hot), on, how)
    joined_cold = l_cold.join(right, on, how)
    return joined_hot.unionByName(joined_cold)
