"""PySpark-native analytics engine with the query surface of the reference
graph-database simulation (vaibhavkhanna03/Distributed-Graph-Database-Simulation)
plus the relational / LLM-data-pipeline operator set mandated by the north star.

Layout
------
- ``session``    : SparkSession builder tuned for local[32] testing, cluster-safe.
- ``sources``    : table loaders, the reference's ``n + matrix`` text graph format.
- ``operators``  : graph traversal/analytics, relational queries, dedup,
                   similarity search, text analysis, multimodal plumbing.
- ``functions``  : reusable column expressions (portable hashes, vector math).
- ``plans``      : explain/plan-inspection helpers.
- ``streaming``  : Structured Streaming variants of the event operators.

Design stance (SURVEY.md §1.3): graphs are **edge-list DataFrames**
(``graph_id, src, dst``) + a ``graphs(graph_id, n)`` dimension, not dense
matrices; everything relational is plain DataFrame/Catalyst; the only
imperative pieces are the BFS superstep driver loop and two per-graph
``applyInPandas`` kernels (DFS, small-graph BFS).
"""

__version__ = "0.1.0"
