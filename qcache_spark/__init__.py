"""qcache_spark — a PySpark-native analytics engine with the query
surface of tobgu/qcache (reference, read-only at /root/reference),
re-expressed as lazy Catalyst plans, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Layers (SURVEY.md §7):
- plans/      query-dict → DataFrame compiler (the qframe analogue)
- sources/    ingest (CSV/JSON/parquet) with type hints & stand-ins
- cache/      dataset catalog: LRU-by-size + max-age (dataset_cache analogue)
- server/     HTTP API parity layer (app.py analogue)
- operators/  dedup, similarity, text, multimodal (beyond-reference)
- streaming/  Structured Streaming windows/sessionization
"""
from .errors import (
    DatasetTooLargeException,
    MalformedQueryException,
    UnknownDatasetException,
)
from .opcache import release as release_operator_caches
from .plans import QueryResult, compile_query, compile_update
from .session import get_spark, load_table, load_tables

__all__ = [
    "release_operator_caches",
    "MalformedQueryException",
    "UnknownDatasetException",
    "DatasetTooLargeException",
    "QueryResult",
    "compile_query",
    "compile_update",
    "get_spark",
    "load_table",
    "load_tables",
]

__version__ = "0.1.0"
