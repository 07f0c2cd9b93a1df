"""Central registry for operator-lifetime persisted DataFrames.

Several operators materialize an intermediate exactly once per call and
let the RETURNED lazy plan read it (curriculum_buckets' range-partitioned
input, triangle_participation's oriented edge set, grouped percentile
ranges, the flagship pipeline's session frames). Eviction therefore has
to be *deferred*: the cache must outlive the function that created it.

Rounds 1-6 solved that per operator family with a module-level
``_CACHE[id(session)]`` dict whose next call evicted the previous one.
That pattern has two measured/observed failures:

1. **Cross-family accumulation** (SCALING.md §12): a session that runs
   many *different* heavy operators pins one persisted frame per family
   with no shared budget — at sf10 the third back-to-back heavy query
   OOMed the driver JVM. A 100 TB pipeline session runs exactly that
   kind of mixed workload.
2. **``id(session)`` reuse** (ADVICE r6): after a session is
   garbage-collected its ``id`` can be recycled, so a new session's
   first call could unpersist a stale handle from a dead JVM-side
   session (a Py4J error mid-call) and entries for dead sessions leaked
   until collision.

This module replaces all of those dicts with ONE registry:

* keyed by ``sparkContext.applicationId`` — unique per SparkContext
  lifetime, immune to Python ``id`` reuse;
* one slot per *family* (same-family registration evicts the previous
  frame, preserving the round-1..6 deferred-eviction contract);
* an LRU **byte budget** across families: registering a new frame first
  checks the app's materialized cache footprint (``getRDDStorageInfo``,
  the same numbers the Spark UI's Storage tab shows) and unpersists the
  least-recently-registered families until under budget. Unpersisting
  is always *correctness-safe* in Spark — a plan whose cache block
  vanished silently recomputes — so aggressive eviction can only cost
  time, never results;
* ``release(spark)`` — an explicit all-families release for workload
  boundaries (bench calls it between queries; the server exposes it).

On a real cluster the same registry governs executor storage memory:
``getRDDStorageInfo`` aggregates cluster-wide block sizes, and the
budget should be set to a fraction of total executor storage memory via
``QCACHE_SPARK_OPCACHE_BUDGET_BYTES``.
"""
from __future__ import annotations

import os
import threading
import weakref
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "register",
    "release",
    "families",
    "cached_bytes",
    "budget_bytes",
]

_LOCK = threading.RLock()
# applicationId -> OrderedDict[family -> persisted DataFrame]
# OrderedDict order = registration recency (oldest first -> evicted first)
_REG: dict[str, "OrderedDict[str, DataFrame]"] = {}
# applicationId -> weakref to its SparkSession: lets register() drop
# registry entries for sessions that have been garbage-collected (their
# frames died with the JVM-side session; the handles would otherwise
# linger forever — the residual of ADVICE r6's id-reuse finding)
_SESSIONS: dict[str, "weakref.ref[SparkSession]"] = {}


def budget_bytes() -> int:
    """The cross-family cache budget. 0 disables budget eviction
    (explicit same-family eviction and release() still work)."""
    return int(
        os.environ.get("QCACHE_SPARK_OPCACHE_BUDGET_BYTES", str(3 << 30))
    )


def _app_id(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def cached_bytes(spark: SparkSession) -> int:
    """Materialized cache footprint of the WHOLE app (memory + disk),
    from the same RDD storage info the Spark UI shows. Includes
    non-registry caches; the budget loop therefore stops when the
    registry has nothing left to give back, not when this hits zero."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def register(
    spark: SparkSession,
    family: str,
    df: DataFrame,
    budget: int | None = None,
) -> DataFrame:
    """Track ``df`` (already ``.persist()``-ed by the caller) as the
    live cache for ``family``. Evicts the family's previous frame, then
    enforces the cross-family byte budget by unpersisting the
    least-recently-registered *other* families while the app's
    materialized cache exceeds the budget. Returns ``df``."""
    limit = budget_bytes() if budget is None else budget
    with _LOCK:
        app = _app_id(spark)
        # reap entries whose session has been garbage-collected: their
        # cached blocks died with the session, only the handles remain
        for dead in [
            a for a, ref in _SESSIONS.items()
            if a != app and ref() is None
        ]:
            _SESSIONS.pop(dead, None)
            _REG.pop(dead, None)
        _SESSIONS[app] = weakref.ref(spark)
        fams = _REG.setdefault(app, OrderedDict())
        prev = fams.pop(family, None)
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # dead session / already-released handle
        # Budget check BEFORE inserting the newcomer: its blocks are
        # not materialized yet (persist is lazy), so the footprint we
        # read is exactly the old families' — the accumulation the
        # budget exists to bound. blocking=True inside the loop so the
        # re-read footprint reflects the eviction.
        if limit > 0:
            while fams and cached_bytes(spark) > limit:
                _, oldest = fams.popitem(last=False)
                try:
                    oldest.unpersist(blocking=True)
                except Exception:
                    break
        fams[family] = df
    return df


def release(spark: SparkSession, family: str | None = None) -> int:
    """Unpersist and forget every registered frame for this app (or
    just one family). Call at workload boundaries — between bench
    queries, between pipeline stages, from the server's release
    endpoint. Returns the number of frames released. Safe to call at
    any time: downstream plans recompute instead of failing."""
    released = 0
    with _LOCK:
        fams = _REG.get(_app_id(spark))
        if not fams:
            return 0
        targets = [family] if family is not None else list(fams.keys())
        for fam in targets:
            frame = fams.pop(fam, None)
            if frame is None:
                continue
            try:
                frame.unpersist(blocking=False)
            except Exception:
                pass
            released += 1
        if not fams:
            _REG.pop(_app_id(spark), None)
    return released


def families(spark: SparkSession) -> list[str]:
    """Currently registered families (oldest first)."""
    with _LOCK:
        return list(_REG.get(_app_id(spark), {}).keys())
