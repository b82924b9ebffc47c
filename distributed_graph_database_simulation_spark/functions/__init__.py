from .portable import dec, dsum, dsum_expr

__all__ = ["dec", "dsum", "dsum_expr"]
