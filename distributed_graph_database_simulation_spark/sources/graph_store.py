"""Parquet-backed graph store: the reference's write path, Spark-first.

Reference semantics (SURVEY.md §2a rows 1-2): AddGraph (op=1) and ModifyGraph
(op=2) share one code path — ``fopen(..., "w")`` truncates, so modify is a
full replace (``primary_server.c:71-90``); only the response string differs.
We therefore expose both as **partition overwrite** of the graph's slice of a
parquet dataset partitioned by ``graph_id``. No merge/upsert is invented.

Concurrency: the reference's per-graph writer-priority RW lock
(``load_balancer.c:36-40``, ``secondary_server.c:74-113``) is a no-op here —
parquet snapshot isolation gives readers immutable files and the overwrite is
atomic at commit (SURVEY.md §2a row 7). Shutdown (op=5) is ``spark.stop()``.

Scale posture: ``partitionBy("graph_id")`` means a read of one graph prunes to
one partition directory; a 100 TB store of millions of graphs scans only what
the query touches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph_text import EDGE_SCHEMA, GRAPH_SCHEMA


class GraphStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self.edges_path = os.path.join(base_dir, "edges")
        self.graphs_path = os.path.join(base_dir, "graphs")
        # Dynamic partition overwrite (set per-write in _write): writing
        # graph_id=k replaces only k's partition, leaving other graphs'
        # files untouched (per-graph isolation without any lock machinery).

    # -- write path (primary server) -----------------------------------
    def add_graph(self, graph_id: int, n: int, edges_df: DataFrame) -> str:
        """op=1: create/overwrite a named graph. Returns the reference's
        response string (``primary_server.c:97``)."""
        self._write(graph_id, n, edges_df)
        return "File added successfully"

    def modify_graph(self, graph_id: int, n: int, edges_df: DataFrame) -> str:
        """op=2: identical write path, different response
        (``primary_server.c:97-99``)."""
        self._write(graph_id, n, edges_df)
        return "File modified successfully"

    def _write(self, graph_id: int, n: int, edges_df: DataFrame) -> None:
        out = (
            edges_df.select(
                F.lit(graph_id).cast("int").alias("graph_id"),
                F.col("src").cast("int"),
                F.col("dst").cast("int"),
            )
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("graph_id")
            .parquet(self.edges_path)
        )
        dim = self.spark.createDataFrame([(graph_id, n)], GRAPH_SCHEMA)
        (
            dim.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("graph_id")
            .parquet(self.graphs_path)
        )

    # -- read path (secondary servers) ----------------------------------
    def edges(self, graph_id: int | None = None) -> DataFrame:
        df = self.spark.read.schema(EDGE_SCHEMA).parquet(self.edges_path)
        if graph_id is not None:
            df = df.filter(F.col("graph_id") == graph_id)  # partition pruning
        return df

    def graphs(self) -> DataFrame:
        return self.spark.read.schema(GRAPH_SCHEMA).parquet(self.graphs_path)


def edge_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Edge-level change set between two graph snapshots: what a
    ModifyGraph full replace (``primary_server.c:71-90`` — truncate and
    rewrite) actually CHANGED. The reference cannot answer this (the old
    file is gone); with immutable parquet snapshots it is two keyed
    anti-joins — 'removed' = old ∖ new, 'added' = new ∖ old — each a
    one-shuffle set difference that partition-prunes to the graphs
    present in the inputs. Returns (graph_id, src, dst, change string).
    """
    keys = ["graph_id", "src", "dst"]
    o = old_edges.select(*keys).distinct()
    n = new_edges.select(*keys).distinct()
    removed = o.join(n, keys, "left_anti").withColumn("change", F.lit("removed"))
    added = n.join(o, keys, "left_anti").withColumn("change", F.lit("added"))
    return removed.unionByName(added)
