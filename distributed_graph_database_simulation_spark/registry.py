"""Central query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 appears here as
``name -> (spark_fn, oracle_sql | None)``. ``spark_fn(spark, sf_dir)`` returns
a DataFrame; ``oracle_sql`` is ANSI SQL DuckDB runs on the same parquet views.
``None`` marks genuinely non-SQL-expressible ops (traversal-order-dependent
DFS, iterative float PageRank, probabilistic SimHash/ANN, HLL sketches) — the
driver then records a rows-only check; their invariants are pinned in tests.

Imports are deliberately eager: a broken suite must fail the smoke test
loudly, not silently shrink the registry (a swallowed ImportError here once
meant losing a whole suite from the correctness gate without any signal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.dedup import DEDUP_QUERIES
from .operators.graph_queries import GRAPH_QUERIES
from .operators.multimodal import MULTIMODAL_QUERIES
from .operators.relational import RELATIONAL_QUERIES
from .operators.similarity import SIMILARITY_QUERIES
from .operators.text_analysis import TEXT_QUERIES
from .operators.udf_surface import UDF_SURFACE_QUERIES
from .streaming.windowed import STREAMING_QUERIES

ALL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for suite in (
    GRAPH_QUERIES,
    RELATIONAL_QUERIES,
    DEDUP_QUERIES,
    SIMILARITY_QUERIES,
    TEXT_QUERIES,
    MULTIMODAL_QUERIES,
    UDF_SURFACE_QUERIES,
    STREAMING_QUERIES,
):
    overlap = ALL_QUERIES.keys() & suite.keys()
    if overlap:
        raise ValueError(f"duplicate registry names: {sorted(overlap)}")
    ALL_QUERIES.update(suite)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in ALL_QUERIES.items() if sql is not None}
