from .windowed import STREAMING_QUERIES

__all__ = ["STREAMING_QUERIES"]
