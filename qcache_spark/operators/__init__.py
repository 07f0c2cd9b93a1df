from . import dedup, multimodal, similarity, skew, text  # noqa: F401

__all__ = ["dedup", "multimodal", "similarity", "skew", "text"]
