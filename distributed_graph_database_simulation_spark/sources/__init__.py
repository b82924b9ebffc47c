from .tables import TABLES, load_table, register_views
from .graph_text import read_graph_text, write_graph_text, matrix_to_edges, edges_to_matrix
from .graph_store import GraphStore

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_graph_text",
    "write_graph_text",
    "matrix_to_edges",
    "edges_to_matrix",
    "GraphStore",
]
