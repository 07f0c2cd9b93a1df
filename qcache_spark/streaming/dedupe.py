"""Streaming deduplication with watermark-bounded state.

The streaming face of the dedup family (operators/dedup.py): drop
duplicate records as they arrive, holding state only for the watermark
horizon. On an unbounded stream, plain dropDuplicates would grow state
with every key ever seen; `dropDuplicatesWithinWatermark` expires a
key's state once the watermark passes it, so memory is bounded by
(arrival rate x watermark delay) — the only shape that survives a
100 TB/day ingest feed. Duplicates arriving within the watermark of
each other (the realistic case: retries, at-least-once sources,
double-sent batches) are eliminated; a duplicate arriving later than
the watermark horizon is by contract late data.

Batch/stream unification: both builders take ANY DataFrame — on a
batch frame `dropDuplicatesWithinWatermark` degenerates to exact
dedup, which is what the oracle gate (q58) and the parity test
compare against.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key; state for a key is dropped once
    the watermark moves past its event time.

    Batch frames take the exact-dedup path (Spark rejects
    dropDuplicatesWithinWatermark on batch plans) — same contract when
    all duplicates fall within the watermark, which is what the q58
    gate and the parity test assert."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    from .windows import _restore_ntz, _watermark_ntz

    src, was_ntz = _watermark_ntz(df, event_time_col, watermark)
    return _restore_ntz(
        src.dropDuplicatesWithinWatermark(keys), was_ntz, event_time_col
    )


def content_fingerprint(text_col: str = "text") -> Column:
    """8-byte fingerprint of whitespace/case-normalized text — the
    same normalization exact_dedup uses (operators/dedup.py), so a
    streaming ingest dedupes identically to the batch pass."""
    return F.xxhash64(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )


def dedup_stream_by_content(
    df: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming near-line content dedup: fingerprint the text, drop
    rows whose fingerprint was already seen within the watermark."""
    return dedup_within_watermark(
        df.withColumn("_fp", content_fingerprint(text_col)),
        ["_fp"],
        event_time_col,
        watermark,
    ).drop("_fp")
