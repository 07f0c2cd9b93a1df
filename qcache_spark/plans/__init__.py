from .compiler import QueryResult, compile_query
from .update import compile_update

__all__ = ["QueryResult", "compile_query", "compile_update"]
