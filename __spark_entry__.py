"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (distributed superstep BFS on
the reference fixture graphs) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator registry
(distributed_graph_database_simulation_spark.registry); every
deterministic operator carries an exact DuckDB oracle — including the
unrolled-CTE family (fixed-iteration plain/weighted/personalized
PageRank, k-core and k-truss peeling, coreness, Luby MIS and
iterated-MIS coloring, two-pass Brandes betweenness) and the
watermark-gated streaming file sink — The single remaining
rows-only entry is the HLL estimate (``rel_approx_distinct``); its
checked sibling ``rel_approx_distinct_checked`` value-matches exactly,
and the formerly rows-only HyperBall-harmonic and JL-projection entries
were converted to the same checked form in round 11. The first CHECK_WINDOW
registry entries form the driver's gate; ``registry.STAGED_NEXT_ROTATION``
lists pre-verified tail entries queued for the next rotation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_graph_database_simulation_spark import registry
from distributed_graph_database_simulation_spark.operators.graph_queries import (
    bfs_levels_fixture,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BFS levels over the reference graphs (SURVEY.md §7)."""
    return bfs_levels_fixture(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
