from . import dedup, hashing, metrics, multimodal, similarity, text, vector

__all__ = ["dedup", "hashing", "metrics", "multimodal", "similarity", "text", "vector"]
