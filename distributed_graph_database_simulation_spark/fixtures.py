"""Reference graph fixtures as edge lists (FIXTURES.md §2).

Exact conversion of ``/root/reference/G{1,2,3,5,6,7}.txt`` (no G4 exists).
Used both by the Spark ``queries()`` entries and — via :func:`edges_values_sql`
— inlined into the DuckDB oracle SQL as a VALUES CTE, so both sides of the
driver's differential check consume identical data.

Also defines a deterministic **synthetic scale graph** derived from the
``orders`` table so graph traversal is exercised on data that grows with the
scale factor; the derivation is plain integer arithmetic expressible
identically in Spark and ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.graph_text import EDGE_SCHEMA, GRAPH_SCHEMA

# (graph_id, n)
GRAPHS: list[tuple[int, int]] = [(1, 2), (2, 2), (3, 2), (5, 5), (6, 5), (7, 7)]

# (graph_id, src, dst) — matrix cell == 1  =>  directed edge src -> dst.
EDGES: list[tuple[int, int, int]] = [
    # G1: identity matrix — self-loops only
    (1, 0, 0), (1, 1, 1),
    # G2
    (2, 0, 1), (2, 1, 0),
    # G3 (same as G2)
    (3, 0, 1), (3, 1, 0),
    # G5
    (5, 0, 1), (5, 0, 4), (5, 1, 0), (5, 1, 2), (5, 1, 3), (5, 2, 1),
    (5, 3, 1), (5, 4, 0),
    # G6
    (6, 0, 1), (6, 0, 2), (6, 0, 3), (6, 1, 0), (6, 1, 4), (6, 2, 0),
    (6, 3, 0), (6, 4, 1),
    # G7
    (7, 0, 1), (7, 0, 4), (7, 1, 0), (7, 1, 2), (7, 2, 1), (7, 2, 3),
    (7, 3, 2), (7, 4, 0), (7, 4, 5), (7, 4, 6), (7, 5, 4), (7, 6, 4),
]

# Hand-computed pins (FIXTURES.md §3): ascending-neighbor-order DFS
# (secondary_server.c:157) and BFS levels == shortest unweighted distance.
DFS_LEAF_PINS = {
    (1, 0): {0},
    (2, 0): {1},
    (3, 0): {1},
    (5, 0): {2, 3, 4},
    (6, 0): {2, 3, 4},
    (7, 0): {3, 5, 6},
}
BFS_LEVEL_PINS = {
    (1, 0): {(0, 0)},
    (2, 0): {(0, 0), (1, 1)},
    (5, 0): {(0, 0), (1, 1), (4, 1), (2, 2), (3, 2)},
    (7, 0): {(0, 0), (1, 1), (4, 1), (2, 2), (5, 2), (6, 2), (3, 3)},
}


def fixture_graphs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GRAPHS, GRAPH_SCHEMA)


def fixture_edges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(EDGES, EDGE_SCHEMA)


def edges_values_sql() -> str:
    """The fixture edge list as a SQL VALUES relation (for DuckDB oracles)."""
    rows = ", ".join(f"({g},{s},{d})" for g, s, d in EDGES)
    return f"(VALUES {rows}) AS fixture_edges(graph_id, src, dst)"


# --- synthetic scale graph over `orders` -------------------------------
# Deterministic pseudo-random directed graph whose size tracks the scale
# factor: each order contributes the edge
#   src = o_orderkey % V,  dst = (o_orderkey * 37 + o_custkey) % V
# on V=101 vertices (prime-ish to spread mod classes), excluding self-loops.
SCALE_V = 101
SCALE_GRAPH_SQL = f"""
SELECT DISTINCT
    CAST(o_orderkey % {SCALE_V} AS INT)                        AS src,
    CAST((o_orderkey * 37 + o_custkey) % {SCALE_V} AS INT)     AS dst
FROM orders
WHERE o_orderkey % {SCALE_V} <> (o_orderkey * 37 + o_custkey) % {SCALE_V}
"""


def scale_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SCALE_GRAPH_SQL)
