"""Central query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 appears here as
``name -> (spark_fn, oracle_sql | None)``. ``spark_fn(spark, sf_dir)`` returns
a DataFrame; ``oracle_sql`` is ANSI SQL DuckDB runs on the same parquet views.
``None`` marks genuinely non-SQL-expressible ops (traversal-order-dependent
DFS, iterative float PageRank) — the driver then records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.graph_queries import GRAPH_QUERIES
from .operators.relational import RELATIONAL_QUERIES

ALL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
ALL_QUERIES.update(GRAPH_QUERIES)
ALL_QUERIES.update(RELATIONAL_QUERIES)


def _late_imports() -> None:
    """Pull in optional suites; tolerate partial builds during development."""
    global ALL_QUERIES
    for mod, attr in [
        (".operators.dedup", "DEDUP_QUERIES"),
        (".operators.similarity", "SIMILARITY_QUERIES"),
        (".operators.text_analysis", "TEXT_QUERIES"),
        (".operators.multimodal", "MULTIMODAL_QUERIES"),
        (".streaming.windowed", "STREAMING_QUERIES"),
    ]:
        try:
            import importlib

            m = importlib.import_module(mod, package=__package__)
            ALL_QUERIES.update(getattr(m, attr))
        except (ImportError, AttributeError):
            pass


_late_imports()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in ALL_QUERIES.items() if sql is not None}
