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


#: trigger kwargs Spark's DataStreamWriter.trigger accepts; anything
#: else is a spec typo that should fail loudly at attach time, not
#: as a Py4J error at start().
_TRIGGER_KEYS = {"availableNow", "once", "processingTime", "continuous"}


def drift_monitor(
    stream: DataFrame,
    ref_hist: list[tuple],
    metrics_path: str,
    checkpoint_dir: str,
    categorical_cols: Sequence[str] = (),
    numeric_bins: Mapping[str, Sequence[int]] | None = None,
    trigger: Mapping[str, object] | None = None,
):
    """Attach a PSI monitor to a streaming DataFrame: every
    micro-batch is histogrammed under the same tracking spec and
    scored against `ref_hist` (from `reference_histogram`); metric
    rows append to `metrics_path` parquet. Returns the started
    streaming query.

    `trigger` is passed through to `DataStreamWriter.trigger`;
    default `{"availableNow": True}` (drain-and-stop — the batch/
    test/catch-up mode). A LIVE monitor passes
    `{"processingTime": "5 minutes"}` and keeps scoring arrivals
    until stopped."""
    cats, bins = validate_tracking(categorical_cols, numeric_bins)
    trigger = dict(trigger) if trigger else {"availableNow": True}
    bad_keys = set(trigger) - _TRIGGER_KEYS
    if bad_keys or len(trigger) != 1:
        raise ValueError(
            f"trigger must be exactly one of {sorted(_TRIGGER_KEYS)}; "
            f"got {sorted(trigger)}"
        )
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
        .trigger(**trigger)
        .start()
    )


def compact_metrics(
    spark,
    metrics_path: str,
    keep_last: int | None = None,
    target_files: int = 4,
) -> dict:
    """Compact + age out the monitor's metrics directory.

    A live monitor appends a handful of tiny parquet files per
    micro-batch forever; at a 5-minute trigger that is ~100k files a
    year — enough to make listing the metrics dir slower than reading
    it. This verb rewrites the directory to `target_files` files,
    dropping replay-duplicate rows (same (batch_id, column, bucket))
    and, with `keep_last=N`, rows older than the newest N batch_ids.

    Safe under a RUNNING monitor: the input snapshot is the file list
    at read time; compacted rows are APPENDED first and only the
    snapshotted input files are deleted after, so a concurrent
    micro-batch's new files are never touched and a concurrent reader
    sees at worst the same row twice — which the documented read
    discipline (`dropDuplicates(["batch_id", "column", "bucket"])`)
    already absorbs. Concurrent COMPACTORS are fenced by the
    single-writer lease (same discipline as the index writers).

    Returns {"files_before", "files_after", "rows", "batches_kept"}.
    """
    from .. import hadoopfs as hfs
    from ..lease import IndexLease

    if keep_last is not None and keep_last < 1:
        raise ValueError("keep_last must be a positive batch count")
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    with IndexLease(spark, metrics_path.rstrip("/")):
        snap = spark.read.parquet(metrics_path)
        in_files = list(snap.inputFiles())
        out = snap.dropDuplicates(["batch_id", "column", "bucket"])
        if keep_last is not None:
            # newest N distinct batch_ids (counter-sized collect)
            batches = [
                r["batch_id"]
                for r in out.select("batch_id").distinct().collect()
            ]
            kept = sorted(batches)[-keep_last:]
            out = out.filter(F.col("batch_id").isin(kept))
        else:
            kept = None
        out = out.coalesce(target_files)
        rows = out.count()
        # append-then-delete-inputs: crash between the two leaves
        # duplicate (idempotent-keyed) rows, never lost metrics
        out.write.mode("append").parquet(metrics_path)
        for f in in_files:
            hfs.delete(spark, f, recursive=False)
        after = hfs.count_files(spark, metrics_path)
    return {
        "files_before": len(in_files),
        "files_after": after,
        "rows": rows,
        "batches_kept": len(kept) if kept is not None else None,
    }
