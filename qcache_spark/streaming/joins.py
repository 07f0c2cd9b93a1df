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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
    suffix: str = "_r",
    streaming: bool = True,
) -> DataFrame:
    """Stream-stream interval join: pair each left row with every
    right row sharing its key whose event time falls in
    ``[left_ts, left_ts + within]`` (views -> purchases within 15
    minutes, orders -> fills, request -> response).

    This is the one join shape that genuinely needs BOTH sides
    buffered in streaming state. The two ingredients Spark requires —
    and that make the state finite — are explicit here: a watermark on
    both inputs, and a time-INTERVAL join condition. Together they let
    the state store evict a buffered row as soon as the other side's
    watermark passes the end of its match window, so state size is
    bounded by (input rate x (watermark + within)) regardless of how
    long the streams run. Without the interval condition the state
    grows forever — Spark would have to keep every row in case a
    match arrives; that formulation is refused upstream rather than
    deployed.

    Batch mode (``streaming=False``) is the same construction minus
    the watermarks — the oracle-gate path, identical results on the
    same input (batch/stream unification, like every builder here).

    The right side's columns are suffixed (``ts`` -> ``ts_r`` etc.);
    the join key stays unsuffixed and appears once. Works on the
    engine-canonical TIMESTAMP_NTZ event time via the same ntz->ltz
    watermark shim as the window builders (UTC-pinned, loud failure
    otherwise).
    """
    from .windows import _restore_ntz, _watermark_ntz

    collide = {c + suffix for c in right.columns} & set(left.columns)
    if collide:
        raise ValueError(f"suffixed right columns collide with left: {sorted(collide)}")

    if streaming:
        l_src, l_ntz = _watermark_ntz(left, left_ts, watermark)
        r_src, r_ntz = _watermark_ntz(right, right_ts, watermark)
    else:
        l_src, l_ntz = left, False
        r_src, r_ntz = right, False
        # batch comparisons between ntz and ltz would cast implicitly;
        # keep both sides as-is (same source type in practice)

    # Suffix EVERY right column, key included: when both sides derive
    # from the same stream (a self-join), unsuffixed key references
    # resolve ambiguously to one lineage attribute (Spark warns
    # "trivially true equals predicate"); distinct names make the
    # resolution purely name-based and unambiguous.
    r_renamed = r_src.select(
        *[F.col(c).alias(c + suffix) for c in r_src.columns]
    )
    rts = right_ts + suffix
    rkey = on + suffix
    cond = (
        (F.col(on) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    joined = l_src.join(r_renamed, cond).drop(rkey)
    # restore per SIDE: with mixed inputs (left ntz, right ltz) a
    # joint flag would wrongly cast the ltz side's output to ntz
    joined = _restore_ntz(joined, l_ntz, left_ts)
    return _restore_ntz(joined, r_ntz, rts)
