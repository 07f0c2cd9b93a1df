"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics the built-in window aggregations can't
express (reference has no streaming at all; this is the north-star
"custom stateful operator" slot).

Example operator: per-user RUNNING PROFILE with anomaly flagging —
keeps (count, value sum, max single value) per user across ALL
triggers, emits one row per user per trigger with the updated
running aggregates and how many events in this batch exceeded
`threshold` × the running mean. The state is a tiny fixed-width tuple
per key, so state size scales with |users|, not |events| — the knob
that matters on an unbounded 100 TB/day stream. GroupStateTimeout can
expire idle users (not used in the availableNow tests).
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG, total DOUBLE, max_value DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("batch_anomalies", T.LongType()),
    ]
)


def _update_user_profile(threshold: float):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            count, total, max_value = state.get
        else:
            count, total, max_value = 0, 0.0, 0.0
        anomalies = 0
        for pdf in pdfs:
            values = pdf["value"]
            running_mean = total / count if count else float(values.mean())
            anomalies += int((values > threshold * running_mean).sum())
            count += int(len(values))
            total += float(values.sum())
            max_value = max(max_value, float(values.max()))
        state.update((count, total, max_value))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": count,
                    "total_value": total,
                    "max_value": max_value,
                    "batch_anomalies": anomalies,
                }
            ]
        )

    return update


def user_profiles_stateful(
    events: DataFrame, threshold: float = 3.0
) -> DataFrame:
    """Streaming: per-user running profiles with custom state.
    `events` must be a streaming DataFrame with (user_id, value)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_profiles_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of the FINAL state (for parity checks)."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("value").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
