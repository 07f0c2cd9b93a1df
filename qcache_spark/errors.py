"""Error types mirroring the reference engine's error contract.

Reference: qcache/qframe/common.py:4-8 (MalformedQueryException),
qcache/app.py:188-192 (mapped to HTTP 400 with {"error": msg}).
"""
from __future__ import annotations


class MalformedQueryException(Exception):
    """Raised for any invalid query: unknown clause, column, operator,
    function, or arity. Maps to HTTP 400 in the serving layer."""


class UnknownDatasetException(Exception):
    """Dataset key not present in the catalog. Maps to HTTP 404."""


class DatasetTooLargeException(Exception):
    """Dataset bigger than the whole cache (reference:
    qcache/dataset_cache.py:65-66)."""


def raise_malformed(message: str, q: object) -> None:
    raise MalformedQueryException(f"{message}: {q!r}")


def assert_integer(name: str, i: object) -> None:
    # bool is an int subclass but is not a valid offset/limit
    if not isinstance(i, int) or isinstance(i, bool):
        raise_malformed(f"Invalid type for {name}", i)


def assert_list(name: str, value: object) -> None:
    if not isinstance(value, list):
        raise_malformed(f"Invalid format for {name}", value)


def assert_len(q, expected: int, error_message: str = "Invalid number of arguments") -> None:
    if len(q) != expected:
        raise_malformed(error_message, q)
