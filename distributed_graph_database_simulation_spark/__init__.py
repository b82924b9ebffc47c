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

# Python UDF workers (applyInPandas / mapInPandas kernels) deserialize
# module-level helpers by name, so the package must be importable in the
# worker interpreter. The JVM captures PYTHONPATH when the SparkContext
# launches; exporting here — at import time, not in the session factory —
# covers any session built after this import, including bare sessions the
# driver's harness creates. (On a real cluster the equivalent is --py-files.)
import os as _os

_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _pkg_parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        f"{_pkg_parent}{_os.pathsep}{_os.environ['PYTHONPATH']}"
        if _os.environ.get("PYTHONPATH")
        else _pkg_parent
    )
del _os, _pkg_parent
