"""Ordered event-funnel analysis over the events table.

`user_funnel` computes strict sequential conversion: a user completes
step i+1 only with an event of that type STRICTLY AFTER their
completion time of step i (first-touch attribution: each step's
completion time is the MIN qualifying timestamp). This is the product
/ training-telemetry "view -> click -> purchase" primitive; the same
shape answers pipeline-stage attrition ("ingested -> deduped ->
accepted") over run-event logs.

Spark-first design: per step, one groupBy(user).min(ts) and one
equi-join back to the event scan — every shuffle in the chain is keyed
on user_id, so AQE plans them into the same exchange layout and a
bucketed/pre-partitioned events table makes the whole funnel
exchange-free after the first hop. No window over a global ordering,
no per-user event-list collection (the naive collect_list approach
materializes a user's whole history per row — unbounded state for hot
users; the min-join formulation carries exactly one timestamp per user
per step).

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
    per_step = []
    prev = None
    for i, step in enumerate(steps):
        evs = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts")
        )
        if prev is None:
            cur = evs.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            cur = (
                evs.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        per_step.append(
            cur.agg(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = cur
    out = per_step[0]
    for frame in per_step[1:]:
        out = out.unionByName(frame)
    return out


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
