"""Distributed as-of join (the time-series "most recent value" join).

Semantics: for each left row, attach the right row with the same key
whose timestamp is the latest one <= the left timestamp ("backward",
inclusive; "forward" is the mirror). This is qcache-adjacent (the
reference has no such operator) but essential for event/feature
pipelines: join each event to the most recent account state, price
tick, model snapshot, ...

Spark-first plan — union + running last(), NOT a range join:

    left  -> (key, t, side=1, payload=NULL, row)
    right -> (key, t, side=0, payload=struct(right cols))
    union -> window PARTITION BY key ORDER BY (t, side, tie)
             last(payload, ignoreNulls) ROWS UNBOUNDED PRECEDING..CURRENT
    keep side=1

Why this shape at 100 TB: exactly ONE shuffle keyed on the join key
(both inputs co-partitioned by it), then a linear in-partition sort
scan carrying O(1) state per key — no per-row probing, no
interval-explosion that a naive `t_right <= t_left` theta-join
produces (Spark would nested-loop it), and no binning heuristics.
Skewed keys behave like any skewed window (AQE handles the shuffle;
the scan stays linear).

Determinism: rows ordered by (t, side, tie) — right rows sort before
left rows at equal t (inclusive bound), and equal-(key, t) right rows
are resolved by the `tie_break` column (highest wins for backward,
lowest for forward), so results are reproducible and an external SQL
engine agrees row-for-row (q57's DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_cols: list[str],
    tie_break: str,
    direction: str = "backward",
    tolerance: "str | int | float | None" = None,
) -> DataFrame:
    """Left as-of join: every left row survives; unmatched rows carry
    NULL right columns (like SQL LEFT JOIN / DuckDB ASOF LEFT JOIN).

    left_on/right_on: ordering (timestamp) columns.
    left_by/right_by: equality key columns.
    right_cols: right columns to attach (must not collide with left).
    tie_break: right column ordering equal-(key, t) right rows; the
        max (backward) / min (forward) tie_break row wins.
    direction: "backward" (latest right t <= left t) or "forward"
        (earliest right t >= left t), both inclusive.
    tolerance: maximum allowed distance |left_t - right_t| for a match
        (inclusive). A string is an SQL interval (e.g. "30 days") for
        timestamp/date on-columns; a number is a plain numeric bound.
        A nearest match farther than the tolerance yields NULL right
        columns. Because the as-of match is by construction the
        NEAREST right row in the join direction, filtering candidates
        to the window up front (pandas merge_asof semantics) and
        nulling the nearest match after the fact are equivalent — so
        the tolerance costs one comparison per row, not a re-join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right_cols collide with left columns: {sorted(collisions)}")

    # The payload carries the right timestamp alongside the attached
    # columns so the tolerance check can compare against the matched
    # row's own t after the running last() (one extra field on the
    # wire, no extra window pass).
    payload = F.struct(
        F.col(right_on).alias("_pt"),
        *[F.col(c) for c in right_cols],
    )
    # The NULL-literal casts need the struct types; derive them from
    # the inputs' (already-fetched) schemas in Python instead of
    # probing `derived.select(...).schema`, which costs a full extra
    # Catalyst analysis round-trip per probe and dominated the
    # operator's per-call latency.
    r_fields = {f.name: f for f in right.schema.fields}
    payload_type = T.StructType(
        [T.StructField("_pt", r_fields[right_on].dataType)]
        + [r_fields[c] for c in right_cols]
    )
    row_type = T.StructType(left.schema.fields)
    l_tag = left.select(
        F.col(left_by).alias("_k"),
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_fields[tie_break].dataType).alias("_tie"),
        F.lit(None).cast(payload_type).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    # Right rows with a NULL key or NULL timestamp can never satisfy
    # `key = key AND t <= t` — drop them so they don't sort as
    # match-everything sentinels.
    r_tag = right.filter(
        F.col(right_by).isNotNull() & F.col(right_on).isNotNull()
    ).select(
        F.col(right_by).alias("_k"),
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tie_break).alias("_tie"),
        payload.alias("_p"),
        F.lit(None).cast(row_type).alias("_row"),
    )

    if direction == "backward":
        order = [F.asc_nulls_first("_t"), F.asc("_side"), F.asc_nulls_first("_tie")]
    else:
        order = [F.desc_nulls_first("_t"), F.asc("_side"), F.desc_nulls_first("_tie")]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    if tolerance is None:
        out_cols += [F.col(f"_m.{c}").alias(c) for c in right_cols]
    else:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        if direction == "backward":
            ok = F.col("_m._pt") >= F.col("_t") - tol
        else:
            ok = F.col("_m._pt") <= F.col("_t") + tol
        out_cols += [
            F.when(ok, F.col(f"_m.{c}")).alias(c) for c in right_cols
        ]
    return matched.select(*out_cols)
