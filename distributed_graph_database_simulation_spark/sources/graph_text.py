"""The reference's on-disk graph format and matrix<->edge-list conversion.

Reference format (writer ``primary_server.c:82-89``, reader
``secondary_server.c:91-100``): line 1 is the vertex count ``n``, followed by
``n`` rows of ``n`` space-separated ints; cell ``[i][j] == 1`` means a directed
edge ``i -> j`` (edge test ``secondary_server.c:158``). Self-loops allowed
(G1.txt is the identity matrix); symmetry is NOT assumed.

Spark-first representation (SURVEY.md §1.3): a sparse **edge list**
``(graph_id int, src int, dst int)`` plus ``graphs(graph_id int, n int)`` —
``n`` is header-declared and not derivable from edges because isolated
vertices exist. The dense->sparse change is what makes 100 TB of graphs
feasible; the text format survives only as an ingest/egress codec.

Parsing stays entirely JVM-side: ``spark.read.text(wholetext=True)`` +
``split``/``posexplode`` — one task per file, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "graph_id INT, src INT, dst INT"
GRAPH_SCHEMA = "graph_id INT, n INT"

# The reference caps graphs at MAX_NODES=100 (client.c:11). We keep it as a
# configurable guard for the applyInPandas kernels (they materialize one graph
# per group), not a storage limit — the edge-list model itself is unbounded.
DEFAULT_MAX_NODES = 100_000


def read_graph_text(spark: SparkSession, path: str | list[str]) -> tuple[DataFrame, DataFrame]:
    """Read reference-format graph file(s) -> (graphs_df, edges_df).

    ``path`` may contain globs; ``graph_id`` is parsed from the filename
    convention ``G<k>.txt`` (reference ``graphIdx``, ``primary_server.c:43-51``
    — there it yields lock index k-1; we keep the user-visible k).
    """
    # NB: Spark's trim/rtrim strip spaces only (not \n), so empty trailing
    # lines/cells are filtered explicitly; posexplode runs BEFORE the filters
    # so src/dst positions stay aligned with matrix indices.
    raw = spark.read.text(path, wholetext=True).select(
        F.regexp_extract(F.input_file_name(), r"G(\d+)\.txt", 1).cast("int").alias("graph_id"),
        F.split(F.col("value"), "\n").alias("lines"),
    )
    graphs = raw.select("graph_id", F.trim(F.element_at("lines", 1)).cast("int").alias("n"))
    edges = (
        raw.select("graph_id", F.posexplode(F.slice("lines", 2, F.size("lines") - 1)).alias("src", "row"))
        .filter(F.trim("row") != "")
        .select("graph_id", "src", F.posexplode(F.split(F.trim("row"), r"\s+")).alias("dst", "cell"))
        .filter(F.col("cell") == "1")
        .select("graph_id", F.col("src").cast("int"), F.col("dst").cast("int"))
    )
    return graphs, edges


def matrix_to_edges(spark: SparkSession, graph_id: int, matrix: list[list[int]]) -> tuple[DataFrame, DataFrame]:
    """Client-ingest boundary: a dense 0/1 matrix -> (graphs_df, edges_df).

    Mirrors the shm hand-off (``client.c:74-79``): slot 0 carried ``n``, then
    the row-major matrix. Here the unpivot is ``posexplode`` + ``filter``.
    """
    n = len(matrix)
    rows_df = spark.createDataFrame(
        [(graph_id, i, [int(v) for v in row]) for i, row in enumerate(matrix)],
        "graph_id INT, src INT, cells ARRAY<INT>",
    )
    edges = (
        rows_df.select("graph_id", "src", F.posexplode("cells").alias("dst", "cell"))
        .filter(F.col("cell") == 1)
        .select("graph_id", "src", F.col("dst").cast("int"))
    )
    graphs = spark.createDataFrame([(graph_id, n)], GRAPH_SCHEMA)
    return graphs, edges


def edges_to_matrix(edges_df: DataFrame, n: int, max_nodes: int = DEFAULT_MAX_NODES) -> list[list[int]]:
    """Collect ONE small graph back to a dense matrix (egress only).

    Guarded by ``max_nodes`` because this is inherently driver-side — the
    reference invariant n<=100 makes it cheap; never call on a big graph.
    """
    if n > max_nodes:
        raise ValueError(f"refusing to densify graph with n={n} > max_nodes={max_nodes}")
    matrix = [[0] * n for _ in range(n)]
    for row in edges_df.select("src", "dst").collect():
        matrix[row["src"]][row["dst"]] = 1
    return matrix


def write_graph_text(edges_df: DataFrame, n: int, path: str, max_nodes: int = DEFAULT_MAX_NODES) -> None:
    """Export one graph in the reference text format (``primary_server.c:82-89``)."""
    matrix = edges_to_matrix(edges_df, n, max_nodes)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for row in matrix:
            f.write(" ".join(str(v) for v in row) + "\n")
