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
