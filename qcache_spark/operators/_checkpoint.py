"""Shared reliable-checkpoint plumbing for iterative operators
(dedup_clusters, pagerank).

Spark's checkpoint directory is a SparkContext-wide GLOBAL, and
reliable checkpoint files are not reclaimed unless
``spark.cleaner.referenceTracking.cleanCheckpoints`` is enabled (off
by default). Two consequences this helper mitigates/documents:

- Each run claims a UNIQUE SUBDIRECTORY of the caller's
  ``checkpoint_dir``, so concurrent/successive jobs never interleave
  files and the caller can reclaim space with a single recursive
  delete of the subdirectory once the RESULT of the operator has been
  fully consumed (the returned DataFrame's lineage reads the final
  round's checkpoint — deleting earlier is a read-after-free).
- The global redirect is unavoidable with the public API; callers
  running other checkpoint-based jobs in the same session should set
  the cleaner conf or partition their directories by job.
"""
from __future__ import annotations

import os
import uuid


def claim_checkpoint_subdir(sc, base_dir: str, prefix: str) -> str:
    """Point the context's checkpoint location at a fresh
    per-run subdirectory of ``base_dir`` and return its path."""
    sub = os.path.join(base_dir, f"{prefix}-{uuid.uuid4().hex[:12]}")
    sc.setCheckpointDir(sub)
    return sub
