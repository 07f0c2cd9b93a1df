"""Dataset catalog: the reference's key→table cache re-expressed on
Spark's storage layer.

Reference behavior preserved (qcache/dataset_cache.py:1-81):
- key → CacheItem with creation time, last-access time, access count,
  and a byte-size estimate
- LRU-by-size eviction on insert (`ensure_free`): evict
  least-recently-accessed until the new dataset fits; inserting
  something larger than the whole cache raises
  (dataset_cache.py:65-66 → DatasetTooLargeException)
- max-age eviction, applied lazily on access (dataset_cache.py:28-36)
- replacing a key deletes the old entry first (app.py:241-243)

Spark upgrade over the reference: "eviction" unpersists a DataFrame —
with MEMORY_AND_DISK the executor storage layer ALSO spills
gracefully under pressure before our bookkeeping ever evicts, so the
cache degrades to disk instead of dropping data on the floor
(SURVEY.md §4). Size estimates come from the optimized plan's
statistics (parquet/AQE stats) once materialized.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from ..errors import DatasetTooLargeException, UnknownDatasetException


_VERSION_COUNTER = [0]


def _next_version() -> int:
    _VERSION_COUNTER[0] += 1
    return _VERSION_COUNTER[0]


@dataclass
class CacheItem:
    df: DataFrame
    byte_size: int
    enum_columns: frozenset = frozenset()
    creation_time: float = field(default_factory=time.time)
    last_access_time: float = field(default_factory=time.time)
    access_count: int = 0
    # monotonically increasing across ALL items: changes whenever the
    # table content changes (store/replace/update) → safe result-cache key
    version: int = field(default_factory=_next_version)


def estimate_size(df: DataFrame) -> int:
    """Plan-statistics size estimate + the reference's flat overhead
    (qcache/qframe/__init__.py:98-100 adds 100 bytes per dataset)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return int(stats.sizeInBytes()) + 100


class DatasetCatalog:
    """Thread-safe key→DataFrame cache with LRU-by-size + max-age."""

    def __init__(self, max_cache_size_bytes: int = 1 << 30, max_age_seconds: float = 0):
        self.max_size = max_cache_size_bytes
        self.max_age = max_age_seconds
        self._items: dict[str, CacheItem] = {}
        self._lock = threading.RLock()
        # statistics hooks (wired by the server layer)
        self.on_evict = lambda count, duration: None
        self.on_age_evict = lambda: None

    # -- internals ----------------------------------------------------

    def _evict(self, key: str) -> None:
        item = self._items.pop(key)
        item.df.unpersist(blocking=False)

    def _ensure_free(self, byte_count: int) -> int:
        """LRU eviction until byte_count fits; returns datasets evicted
        (dataset_cache.py:60-81)."""
        if byte_count > self.max_size:
            raise DatasetTooLargeException(
                f"Dataset of size {byte_count} is larger than the cache ({self.max_size})"
            )
        current = sum(i.byte_size for i in self._items.values())
        if current + byte_count <= self.max_size:
            return 0
        t0 = time.perf_counter()
        evicted = 0
        for key in sorted(self._items, key=lambda k: self._items[k].last_access_time):
            if current + byte_count <= self.max_size:
                break
            current -= self._items[key].byte_size
            self._evict(key)
            evicted += 1
        self.on_evict(evicted, time.perf_counter() - t0)
        return evicted

    # -- public -------------------------------------------------------

    def insert(
        self,
        key: str,
        df: DataFrame,
        enum_columns: frozenset = frozenset(),
        materialize: bool = True,
    ) -> CacheItem:
        with self._lock:
            if key in self._items:
                self._evict(key)
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            if materialize:
                df.count()
            size = estimate_size(df)
            self._ensure_free(size)
            item = CacheItem(df=df, byte_size=size, enum_columns=frozenset(enum_columns))
            self._items[key] = item
            return item

    def get(self, key: str) -> CacheItem:
        """Access-tracked lookup; lazily age-evicts
        (dataset_cache.py:28-36). Raises UnknownDatasetException on
        miss (→ HTTP 404)."""
        with self._lock:
            item = self._items.get(key)
            if item is None:
                raise UnknownDatasetException(key)
            if self.max_age and time.time() - item.creation_time > self.max_age:
                self._evict(key)
                self.on_age_evict()
                raise UnknownDatasetException(key)
            item.last_access_time = time.time()
            item.access_count += 1
            return item

    def replace_df(self, key: str, df: DataFrame) -> CacheItem:
        """Atomic copy-on-write swap used by the update statement: the
        new plan is persisted and materialized BEFORE the old entry is
        dropped, so concurrent readers never see a half-written table
        (SURVEY.md §1.3)."""
        with self._lock:
            old = self.get(key)
            new_df = df.persist(StorageLevel.MEMORY_AND_DISK)
            new_df.count()
            size = estimate_size(new_df)
            item = CacheItem(
                df=new_df,
                byte_size=size,
                enum_columns=old.enum_columns,
                creation_time=old.creation_time,
                last_access_time=time.time(),
                access_count=old.access_count,
            )
            old.df.unpersist(blocking=False)
            self._items[key] = item
            return item

    def delete(self, key: str) -> bool:
        with self._lock:
            if key in self._items:
                self._evict(key)
                return True
            return False

    def __contains__(self, key: str) -> bool:
        with self._lock:
            return key in self._items

    def __len__(self) -> int:
        return len(self._items)

    @property
    def size(self) -> int:
        with self._lock:
            return sum(i.byte_size for i in self._items.values())

    def keys(self) -> list[str]:
        with self._lock:
            return list(self._items)
