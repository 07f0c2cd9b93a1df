"""Streaming ingestion through a persistent near-dup index.

The batch admission loop (MinHashIndex.admit for text,
IVFIndex.admit for embeddings — probe the batch against everything
admitted so far, drop near-dups, append the survivors) lifted onto
Structured Streaming. The dedup
state here is the CORPUS itself — unbounded, exact, and shared with
batch jobs — which is precisely the state that does NOT belong in the
streaming state store: `dropDuplicatesWithinWatermark`
(streaming/dedupe.py) bounds its state by the watermark horizon and
therefore forgets; an ingestion corpus must never forget. The right
tool is `foreachBatch` with the on-disk index as the state backend:

- per trigger, cost is O(micro-batch) — the index probe touches only
  the buckets the batch touches (broadcast semi-join), appends are
  new files, the corpus is never re-shuffled;
- the state survives restarts, is queryable by any batch session, and
  is maintained (compacted) independently of the stream;
- exactly-once admission across failure/replay comes from a batch-id
  high-watermark persisted NEXT TO the index: `foreachBatch` may
  redeliver a micro-batch after a crash, and `admit()` is not
  idempotent under redelivery (a replayed row's own first-delivery
  copy is invisible to the probe's self-pair filter, because both
  carry the same id) — so replayed batch ids are skipped instead.

Single-writer contract: one streaming query owns an index for
admission at a time (the same contract `append` itself has). The
reference engine has no streaming surface at all; this is the
Spark-first composition of its dedup semantics with Structured
Streaming.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


_PROGRESS_FILE = "_admission_progress.json"


def _progress_path(index_path: str) -> str:
    return os.path.join(index_path, _PROGRESS_FILE)


def _last_admitted(index_path: str) -> int:
    try:
        with open(_progress_path(index_path)) as f:
            return json.load(f)["last_batch_id"]
    except (OSError, ValueError, KeyError):
        return -1


def _record_admitted(index_path: str, batch_id: int) -> None:
    tmp = _progress_path(index_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    os.replace(tmp, _progress_path(index_path))  # atomic on POSIX


def admit_foreach_batch(
    index,
    on_batch=None,
    **admit_kwargs,
):
    """Build the `foreachBatch` function that admits each micro-batch
    through ``index`` — any persisted index exposing ``path`` and
    ``admit(batch, **kwargs)`` (MinHashIndex for text,
    IVFIndex for embeddings); ``admit_kwargs`` are forwarded verbatim
    (e.g. ``verify_threshold=`` / ``max_bucket_size=`` for MinHash,
    ``threshold=`` / ``n_probe=`` for IVF). Exposed separately from
    :func:`streaming_admit` so tests and callers with custom
    writeStream plumbing can compose it.

    Replay safety: micro-batches with ``batch_id <=`` the persisted
    high-watermark are skipped (already admitted before the crash).
    The watermark is recorded AFTER ``admit()`` returns — a crash
    between the append and the record replays the batch, which is the
    at-least-once corner every foreachBatch sink has; admission makes
    it visible as duplicate postings for that one batch, exactly like
    calling ``append`` twice, and ``on_batch`` (if given) receives
    ``(batch_id, survivors_count)`` for monitoring."""
    if index.path is None:
        raise ValueError(
            "streaming admission requires a persisted index — call "
            "write() first"
        )

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_admitted(index.path):
            return  # replayed after restart: already admitted
        survivors = index.admit(batch_df, **admit_kwargs)
        # admit() returns a LAZY frame whose append already ran; count
        # here is served from the just-written files via the index
        n = None
        if on_batch is not None:
            n = survivors.count()
        _record_admitted(index.path, batch_id)
        if on_batch is not None:
            on_batch(batch_id, n)

    return _admit


def streaming_admit(
    stream_df: DataFrame,
    index,
    checkpoint_dir: str,
    available_now: bool = True,
    on_batch=None,
    **admit_kwargs,
):
    """Start the admission stream: every micro-batch of ``stream_df``
    is probed against ``index`` (text or embeddings — see
    :func:`admit_foreach_batch`) and only near-dup-free survivors are
    appended. ``admit_kwargs`` forward to ``index.admit``. Returns the
    started StreamingQuery.

    ``available_now=True`` (default) drains everything currently
    available and stops — the scheduled-ingest shape (run hourly over
    a landing directory); ``False`` runs continuously with the
    source's own trigger cadence."""
    writer = (
        stream_df.writeStream.foreachBatch(
            admit_foreach_batch(index, on_batch=on_batch, **admit_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("qcache_spark_admission")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
