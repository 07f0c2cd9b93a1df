"""Streaming drift monitor: per-micro-batch PSI against a frozen
reference histogram.

The online counterpart of `operators/drift.py` (q130's batch audit):
a 100 TB ingestion stream wants "did this hour's arrivals shift?"
answered per micro-batch WITHOUT rescanning the reference corpus.
The reference histogram is computed ONCE (O(buckets) rows, bounded),
held on the driver, and re-materialized as a literal frame inside
each `foreachBatch` — so each batch costs one scan of the BATCH plus
tiny counter arithmetic, never a reference rescan. Metric rows
(batch_id, column, bucket, base_n, curr_n, psi_e6) append to a
parquet metrics directory — the operational record a scheduler
alerts on (`psi_summary` over it gives the per-column score).

Exactly-once note: parquet append in foreachBatch is at-least-once
on batch REPLAY after a crash; metric rows carry batch_id, so a
replayed batch writes duplicate rows that a reader dedups with
`dropDuplicates(["batch_id", "column", "bucket"])` — metrics are
idempotent per key by construction (same batch => same counts).

Stream ≡ batch by construction: each batch's rows equal
`population_stability(reference, batch_frame)` exactly (pytest pins
it; the q133 gate replays both micro-batches in SQL).
"""
from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.drift import bucket_counts, psi_from_counts, validate_tracking

_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("base_n", T.LongType()),
    ]
)


def reference_histogram(
    reference: DataFrame,
    categorical_cols: Sequence[str] = (),
    numeric_bins: Mapping[str, Sequence[int]] | None = None,
) -> list[tuple]:
    """Freeze the reference snapshot's histogram as driver-local rows
    (bounded: O(tracked buckets), the same rows the batch audit
    shuffles). Compute once, pass to `drift_monitor` — micro-batches
    never rescan the reference."""
    rows = (
        bucket_counts(reference, categorical_cols, numeric_bins, "base_n")
        .collect()
    )
    return [(r["column"], r["bucket"], r["base_n"]) for r in rows]


def drift_monitor(
    stream: DataFrame,
    ref_hist: list[tuple],
    metrics_path: str,
    checkpoint_dir: str,
    categorical_cols: Sequence[str] = (),
    numeric_bins: Mapping[str, Sequence[int]] | None = None,
):
    """Attach a PSI monitor to a streaming DataFrame: every
    micro-batch is histogrammed under the same tracking spec and
    scored against `ref_hist` (from `reference_histogram`); metric
    rows append to `metrics_path` parquet. Returns the started
    streaming query (availableNow trigger — drains what's there;
    production would use a processingTime trigger)."""
    cats, bins = validate_tracking(categorical_cols, numeric_bins)
    if not ref_hist:
        raise ValueError("empty reference histogram")
    # The histogram must have been frozen under THIS tracking spec —
    # a cats/bins mismatch would never align any bucket in the
    # full-outer join and every batch would report a huge spurious
    # PSI with no diagnostic. Check the column universe and, for
    # numeric columns, that every reference label belongs to THESE
    # edges' label set.
    tracked = set(cats) | set(bins)
    ref_cols = {r[0] for r in ref_hist}
    if ref_cols != tracked:
        raise ValueError(
            f"reference histogram tracks {sorted(ref_cols)} but the "
            f"monitor tracks {sorted(tracked)}; re-freeze the "
            f"reference under the same spec"
        )
    from ..operators.drift import NULL_BUCKET, numeric_bucket_label

    for c, edges in bins.items():
        allowed = set(numeric_bucket_label(edges)) | {NULL_BUCKET}
        bad = {r[1] for r in ref_hist if r[0] == c} - allowed
        if bad:
            raise ValueError(
                f"reference histogram buckets {sorted(bad)} for column "
                f"{c!r} do not match the monitor's edges {edges}; "
                f"re-freeze the reference under the same binning"
            )

    def _score_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = spark.createDataFrame(ref_hist, _COUNT_SCHEMA)
        curr = bucket_counts(batch_df, cats, bins, "curr_n")
        psi = psi_from_counts(base, curr).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        psi.select(
            "batch_id", "column", "bucket", "base_n", "curr_n", "psi_e6"
        ).write.mode("append").parquet(metrics_path)

    return (
        stream.writeStream.foreachBatch(_score_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
