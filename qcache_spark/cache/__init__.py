from .catalog import CacheItem, DatasetCatalog, estimate_size

__all__ = ["CacheItem", "DatasetCatalog", "estimate_size"]
