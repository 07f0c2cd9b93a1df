from . import dedup, graph, multimodal, similarity, skew, text  # noqa: F401

__all__ = ["dedup", "graph", "multimodal", "similarity", "skew", "text"]
