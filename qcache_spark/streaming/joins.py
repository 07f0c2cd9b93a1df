"""Stream-static joins: enrich an unbounded event stream with a
bounded dimension table (account state, user profile, price list).

Spark's stream-static equi-join needs NO streaming state at all: each
micro-batch joins against the current dimension snapshot, and with
the broadcast hint the dimension ships to executors once per batch —
no shuffle of the stream side, ever. This is THE scalable enrichment
shape at 100 TB/day: the stream stays append-only and partition-local
while the (comparatively tiny) dimension rides along broadcast.

Contrast with stream-stream joins, which buffer both sides in state
until the watermark closes the join window — only needed when both
sides are unbounded.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    left_on: str,
    right_on: str,
    dim_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Attach `dim_cols` from the dimension to each stream row by
    equi-key. Works identically on a batch frame (the oracle gate) and
    a readStream frame (batch/stream unification, like every builder
    in this package)."""
    collisions = set(dim_cols) & set(stream.columns)
    if collisions:
        raise ValueError(f"dim_cols collide with stream columns: {sorted(collisions)}")
    right = dim.select(F.col(right_on).alias(left_on), *dim_cols)
    return stream.join(F.broadcast(right), left_on, how)
