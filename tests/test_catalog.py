"""Catalog tests: LRU-by-size, max-age, replace semantics
(reference behavior: qcache/dataset_cache.py + test_api.py:298-389)."""
from __future__ import annotations

import time

import pytest

from qcache_spark.cache import DatasetCatalog
from qcache_spark.errors import DatasetTooLargeException, UnknownDatasetException


def make_df(spark, n=10, tag=0):
    return spark.range(n).selectExpr("id", f"id * {tag + 1} as v")


def test_insert_get_delete(spark):
    cat = DatasetCatalog(max_cache_size_bytes=1 << 30)
    cat.insert("a", make_df(spark))
    item = cat.get("a")
    assert item.df.count() == 10
    assert item.access_count == 1
    assert item.byte_size > 0
    assert cat.delete("a") is True
    with pytest.raises(UnknownDatasetException):
        cat.get("a")


def test_lru_eviction_by_size(spark):
    cat = DatasetCatalog(max_cache_size_bytes=1 << 30)
    cat.insert("a", make_df(spark, 10, 0))
    cat.insert("b", make_df(spark, 10, 1))
    size = cat.size
    # shrink the cache so two datasets fit but not three, then insert c
    cat.max_size = int(size * 1.2)
    time.sleep(0.01)
    cat.get("b")  # b is now more recently used than a
    evicted = {"n": 0}
    cat.on_evict = lambda count, duration: evicted.__setitem__("n", evicted["n"] + count)
    cat.insert("c", make_df(spark, 10, 2))
    assert evicted["n"] >= 1
    assert "a" not in cat  # least recently accessed went first
    assert "b" in cat and "c" in cat


def test_too_large_dataset_raises(spark):
    cat = DatasetCatalog(max_cache_size_bytes=10)
    with pytest.raises(DatasetTooLargeException):
        cat.insert("a", make_df(spark))


def test_max_age_eviction(spark):
    cat = DatasetCatalog(max_cache_size_bytes=1 << 30, max_age_seconds=0.05)
    cat.insert("a", make_df(spark))
    assert cat.get("a") is not None
    time.sleep(0.1)
    aged = {"n": 0}
    cat.on_age_evict = lambda: aged.__setitem__("n", aged["n"] + 1)
    with pytest.raises(UnknownDatasetException):
        cat.get("a")
    assert aged["n"] == 1


def test_replace_df_keeps_metadata(spark):
    cat = DatasetCatalog(max_cache_size_bytes=1 << 30)
    cat.insert("a", make_df(spark), enum_columns=frozenset(["v"]))
    before = cat.get("a")
    item = cat.replace_df("a", make_df(spark, 5, 3))
    assert item.df.count() == 5
    assert item.enum_columns == frozenset(["v"])
    assert item.creation_time == before.creation_time
