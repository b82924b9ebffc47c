"""BFS/DFS against FIXTURES.md §3 hand-computed pins, plus property tests."""

import random

import pytest

from distributed_graph_database_simulation_spark import fixtures
from distributed_graph_database_simulation_spark.operators.graph_traversal import (
    bfs_levels,
    bfs_levels_small,
    dfs_leaves,
)
from distributed_graph_database_simulation_spark.operators.graph_analytics import (
    connected_components,
    degrees,
    pagerank,
    triangle_count,
)

PIN_STARTS = [(g, s) for (g, s) in fixtures.BFS_LEVEL_PINS]


@pytest.fixture(scope="module")
def edges(spark):
    return fixtures.fixture_edges_df(spark)


@pytest.fixture(scope="module")
def graphs(spark):
    return fixtures.fixture_graphs_df(spark)


@pytest.mark.parametrize("impl", ["superstep", "kernel"])
def test_bfs_pins(spark, edges, impl):
    fn = bfs_levels if impl == "superstep" else bfs_levels_small
    out = fn(spark, edges, PIN_STARTS)
    got = {}
    for r in out.collect():
        got.setdefault((r["graph_id"],), set()).add((r["vertex"], r["level"]))
    for (g, s), expected in fixtures.BFS_LEVEL_PINS.items():
        assert got[(g,)] == expected, f"graph {g}"


def test_dfs_leaf_pins(spark, edges):
    out = dfs_leaves(spark, edges, list(fixtures.DFS_LEAF_PINS))
    got = {}
    for r in out.collect():
        got.setdefault(r["graph_id"], set()).add(r["vertex"])
    for (g, s), expected in fixtures.DFS_LEAF_PINS.items():
        assert got[g] == expected, f"graph {g}"


def test_dfs_deep_path_runs_iteratively(spark):
    # 5000-vertex chain: far past CPython's default recursion limit (1000),
    # so this passes only with the explicit-stack kernel — no
    # setrecursionlimit escape hatch. Leaf set of a chain is the far end.
    n = 5000
    chain = spark.createDataFrame(
        [(42, i, i + 1) for i in range(n - 1)], "graph_id INT, src INT, dst INT"
    ).coalesce(1)
    out = dfs_leaves(spark, chain, [(42, 0)])
    assert {r["vertex"] for r in out.collect()} == {n - 1}


def test_dfs_max_nodes_guard_enforced(spark):
    chain = spark.createDataFrame(
        [(42, i, i + 1) for i in range(99)], "graph_id INT, src INT, dst INT"
    ).coalesce(1)
    with pytest.raises(Exception, match="kernel cap"):
        dfs_leaves(spark, chain, [(42, 0)], max_nodes=10).collect()


def test_bfs_isolated_start(spark, edges):
    # start vertex with no outgoing/incoming edges in that graph: level-0 row only
    out = bfs_levels_small(spark, edges, [(5, 2)])
    # vertex 2 has edges in G5; use a start that's isolated via a fresh graph id
    iso = spark.createDataFrame([(99, 0, 1)], "graph_id INT, src INT, dst INT")
    out = bfs_levels_small(spark, iso, [(99, 3)])
    assert {(r["vertex"], r["level"]) for r in out.collect()} == {(3, 0)}
    out2 = bfs_levels(spark, iso, [(99, 3)])
    assert {(r["vertex"], r["level"]) for r in out2.collect()} == {(3, 0)}


def _random_graph(rng, n, density):
    return [(11, s, d) for s in range(n) for d in range(n) if s != d and rng.random() < density]


def test_bfs_superstep_equals_kernel_random(spark):
    rng = random.Random(42)
    rows = _random_graph(rng, 40, 0.08)
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    a = bfs_levels(spark, df, [(11, 0)])
    b = bfs_levels_small(spark, df, [(11, 0)])
    sa = {(r["vertex"], r["level"]) for r in a.collect()}
    sb = {(r["vertex"], r["level"]) for r in b.collect()}
    assert sa == sb and len(sa) > 1


def test_connected_components_pins(spark, graphs, edges):
    out = connected_components(spark, graphs, edges)
    comp = {(r["graph_id"], r["vertex"]): r["component"] for r in out.collect()}
    # G1: two self-loop singletons -> components {0},{1}
    assert comp[(1, 0)] == 0 and comp[(1, 1)] == 1
    # G5 fully connected undirected -> all component 0
    assert all(comp[(5, v)] == 0 for v in range(5))
    # G7 connected -> all 0
    assert all(comp[(7, v)] == 0 for v in range(7))


def test_degrees_pins(spark, graphs, edges):
    out = degrees(graphs, edges)
    d = {(r["graph_id"], r["vertex"]): (r["out_degree"], r["in_degree"]) for r in out.collect()}
    assert d[(5, 0)] == (2, 2)  # 0->1, 0->4 ; 1->0, 4->0
    assert d[(5, 1)] == (3, 3)
    assert d[(1, 0)] == (1, 1)  # self-loop counts both ways
    assert d[(7, 4)] == (3, 3)


def test_triangle_count(spark):
    # one triangle 0-1-2 plus a dangling edge
    rows = [(1, 0, 1), (1, 1, 2), (1, 2, 0), (1, 2, 3)]
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    out = triangle_count(df).collect()
    assert {(r["graph_id"], r["triangles"]) for r in out} == {(1, 1)}


def test_pagerank_sums_to_one(spark, graphs, edges):
    out = pagerank(spark, graphs, edges, iterations=5)
    import pandas as pd

    pdf = out.toPandas()
    sums = pdf.groupby("graph_id")["rank"].sum()
    for g, s in sums.items():
        assert abs(s - 1.0) < 1e-6, (g, s)


def test_pagerank_dangling_and_edgeless(spark):
    """Dangling mass via 1 - sum(received) must match the explicit
    semantics: a pure sink vertex redistributes, and a graph with NO edges
    at all converges to the uniform distribution."""
    # graph 1: 0 -> 1, vertex 1 is dangling; graph 2: two vertices, no edges
    graphs = spark.createDataFrame([(1, 2), (2, 2)], "graph_id INT, n INT")
    edges = spark.createDataFrame([(1, 0, 1)], "graph_id INT, src INT, dst INT")
    out = pagerank(spark, graphs, edges, iterations=20)
    ranks = {(r.graph_id, r.vertex): r.rank for r in out.collect()}
    # edgeless graph: exactly uniform at every iteration
    assert abs(ranks[(2, 0)] - 0.5) < 1e-12
    assert abs(ranks[(2, 1)] - 0.5) < 1e-12
    # dangling fixed point: r0 = 0.15/2 + 0.85*r1/2, r1 = same + 0.85*r0,
    # mass sums to 1
    assert abs(ranks[(1, 0)] + ranks[(1, 1)] - 1.0) < 1e-9
    assert ranks[(1, 1)] > ranks[(1, 0)]  # sink receives strictly more


def test_label_propagation_two_cliques(spark):
    """Two disconnected triangles must converge to two communities labeled
    by their minimum vertex ids (deterministic sync LPA, min tie-break)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        label_propagation,
    )

    tri_a = [(0, 1), (1, 2), (2, 0)]
    tri_b = [(3, 4), (4, 5), (5, 3)]
    edges = spark.createDataFrame(
        [(1, s, d) for s, d in tri_a + tri_b], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, 6)], "graph_id INT, n INT")
    out = {
        r.vertex: r.label
        for r in label_propagation(spark, graphs, edges, iterations=4).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_dfs_scale_graph_matches_independent_dfs(spark, sf_dir):
    """Kernel DFS on the ~100-vertex scale graph vs an INDEPENDENT
    iterative DFS (explicit stack, not the kernel's recursion) — same
    ascending-neighbor contract, so the leaf sets must agree exactly."""
    from distributed_graph_database_simulation_spark import fixtures
    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        dfs_leaves_scale,
    )

    got = {r.vertex for r in dfs_leaves_scale(spark, sf_dir).collect()}

    edges = fixtures.scale_edges_df(spark, sf_dir).collect()
    adj: dict[int, list[int]] = {}
    for r in edges:
        adj.setdefault(r.src, []).append(r.dst)
    for v in adj.values():
        v.sort()

    visited = {0}
    leaves: set[int] = set()
    # iterative preorder with per-node child counting (mirrors the
    # reference's child_count flag, secondary_server.c:156-173)
    stack: list[tuple[int, int, int]] = [(0, 0, 0)]  # (vertex, next_idx, n_children)
    while stack:
        u, i, kids = stack.pop()
        ns = adj.get(u, [])
        advanced = False
        while i < len(ns):
            v = ns[i]
            i += 1
            if v not in visited:
                visited.add(v)
                stack.append((u, i, kids + 1))
                stack.append((v, 0, 0))
                advanced = True
                break
        if not advanced and not (i < len(ns)) and kids == 0:
            leaves.add(u)

    assert got == leaves


def test_multi_source_bfs_equals_per_source_bfs(spark):
    """k landmarks in one loop must equal k independent single-source runs."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        multi_source_bfs,
    )

    rng = random.Random(7)
    rows = _random_graph(rng, 35, 0.09)
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    sources = spark.createDataFrame(
        [(11, 0), (11, 5), (11, 17)], "graph_id INT, source INT"
    )
    multi = {
        (r.source, r.vertex, r.level)
        for r in multi_source_bfs(spark, df, sources).collect()
    }
    single = set()
    for s in (0, 5, 17):
        for r in bfs_levels(spark, df, [(11, s)]).collect():
            single.add((s, r.vertex, r.level))
    assert multi == single
    assert len({s for s, _, _ in multi}) == 3


def test_harmonic_closeness_matches_python_reference(spark, sf_dir):
    """Sampled harmonic centrality on the scale graph vs an independent
    Python BFS over the same deterministic pivots."""
    from collections import deque

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        _PIVOT_KNUTH,
        _PIVOT_MOD,
        harmonic_closeness_sampled,
    )
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    k = 6
    scale_edges = scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    edge_rows = [(r.src, r.dst) for r in scale_edges.collect()]
    adj = {}
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
    pivots = sorted(
        range(SCALE_V), key=lambda v: ((v * _PIVOT_KNUTH) % _PIVOT_MOD, v)
    )[:k]
    expected = {}
    for p in pivots:
        dist = {p: 0}
        q = deque([p])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if d > 0:
                micro, n = expected.get(v, (0, 0))
                expected[v] = (micro + round(1_000_000.0 / d), n + 1)
    got = {
        r.vertex: (r.harmonic_micro, r.n_pivots_reached)
        for r in harmonic_closeness_sampled(
            spark,
            spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT"),
            scale_edges,
            k_pivots=k,
        ).collect()
    }
    for v in range(SCALE_V):
        assert got[v] == expected.get(v, (0, 0)), v


def test_multi_source_bfs_with_derived_sources_on_text_reader(spark):
    """Regression: a window-derived pivot frame + the text-reader edge plan
    used to fail Spark's constraint rewrite ("key not found: source#N") at
    the periodic visited re-checkpoint; the loop now disables constraint
    propagation for its duration (and restores it)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        harmonic_closeness_sampled,
    )
    from distributed_graph_database_simulation_spark.sources.graph_text import (
        read_graph_text,
    )

    _graphs, g7_edges = read_graph_text(spark, "/root/reference/G7.txt")
    graphs = spark.createDataFrame([(7, 7)], "graph_id INT, n INT")
    out = harmonic_closeness_sampled(spark, graphs, g7_edges, k_pivots=3).collect()
    assert len(out) == 7
    assert any(r.harmonic_micro > 0 for r in out)
    # conf restored
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") in ("true", "True")


def test_clustering_coefficient_matches_python_reference(spark, sf_dir):
    """Per-vertex clustering coefficient on the scale graph vs an
    independent Python adjacency-set computation (micro-unit exact)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        clustering_coefficient,
    )
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    scale_edges = scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    nbrs = {}
    for r in scale_edges.collect():
        if r.src != r.dst:
            nbrs.setdefault(r.src, set()).add(r.dst)
            nbrs.setdefault(r.dst, set()).add(r.src)
    expected = {}
    for v in range(SCALE_V):
        ns = nbrs.get(v, set())
        deg = len(ns)
        tri = sum(1 for a in ns for b in ns if a < b and b in nbrs.get(a, set()))
        coeff = 0 if deg < 2 else (1_000_000 * 2 * tri) // (deg * (deg - 1))
        expected[v] = (deg, tri, coeff)
    graphs = spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.degree, r.triangles, r.coeff_micro)
        for r in clustering_coefficient(graphs, scale_edges).collect()
    }
    assert got == expected
    assert any(c > 0 for _, _, c in got.values())


def test_clustering_coefficient_triangle_plus_dangler(spark):
    """Literal pin: triangle 0-1-2 with a dangling edge 2-3."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2), (1, 2, 0), (1, 2, 3)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, 4)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.degree, r.triangles, r.coeff_micro)
        for r in clustering_coefficient(graphs, edges).collect()
    }
    assert got[0] == (2, 1, 1_000_000)
    assert got[1] == (2, 1, 1_000_000)
    assert got[2] == (3, 1, 333_333)  # floor(1e6 * 2/6)
    assert got[3] == (1, 0, 0)


def test_diameter_double_sweep_on_path_and_scale(spark, sf_dir):
    """Exact on a path graph (double sweep is exact on trees); sanity lower
    bound vs true eccentricity structure on the scale graph."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        diameter_double_sweep, undirected,
    )
    from distributed_graph_database_simulation_spark.fixtures import scale_edges_df

    # path 0-1-2-3-4-5 (undirected): diameter 5, farthest-from-2 is 5
    path = spark.createDataFrame(
        [(9, i, i + 1) for i in range(5)], "graph_id INT, src INT, dst INT"
    )
    row = diameter_double_sweep(spark, undirected(path), start=2).collect()[0]
    assert row.diameter_lower_bound == 5 and row.far_vertex in (0, 5)

    scale_edges = undirected(scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    ))
    row = diameter_double_sweep(spark, scale_edges, start=0).collect()[0]
    assert row.diameter_lower_bound >= 1


def test_personalized_pagerank_matches_python_reference(spark):
    """PPR on a small digraph vs an independent dense power iteration with
    restart-to-sources semantics (dangling mass restarts too)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        personalized_pagerank,
    )

    rng = random.Random(13)
    rows = _random_graph(rng, 25, 0.12)
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, 25)], "graph_id INT, n INT")
    srcs = [0, 7]
    sources = spark.createDataFrame([(11, s) for s in srcs], "graph_id INT, vertex INT")

    n, d, iters = 25, 0.85, 10
    adj = {}
    for _, s, t in rows:
        adj.setdefault(s, []).append(t)
    tele = [1.0 / len(srcs) if v in srcs else 0.0 for v in range(n)]
    rank = tele[:]
    for _ in range(iters):
        received = [0.0] * n
        dangling = 0.0
        for v in range(n):
            outs = adj.get(v, [])
            if outs:
                for t in outs:
                    received[t] += rank[v] / len(outs)
            else:
                dangling += rank[v]
        rank = [
            (1 - d) * tele[v] + d * (received[v] + dangling * tele[v])
            for v in range(n)
        ]

    got = {
        r.vertex: r.rank
        for r in personalized_pagerank(
            spark, graphs, edges, sources, iterations=iters
        ).collect()
    }
    for v in range(n):
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
    # mass conserved; a vertex unreachable from the sources ranks 0
    assert abs(sum(got.values()) - 1.0) < 1e-9
    reachable = set(srcs)
    frontier = list(srcs)
    while frontier:
        u = frontier.pop()
        for t in adj.get(u, []):
            if t not in reachable:
                reachable.add(t)
                frontier.append(t)
    for v in range(n):
        if v not in reachable:
            assert got[v] == 0.0, v


def _tarjan_scc(n, edge_list):
    """Iterative Tarjan (no recursion) — independent SCC ground truth."""
    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, []).append(t)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if not recurse:
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(comp)
    return {v: min(comp) for comp in sccs for v in comp}


def test_scc_matches_tarjan_on_random_digraphs(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )

    for seed in (3, 17):
        rng = random.Random(seed)
        n = 30
        rows = [(11, s, d) for s in range(n) for d in range(n)
                if s != d and rng.random() < 0.07]
        expected = _tarjan_scc(n, [(s, d) for _, s, d in rows])
        edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
        graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
        got = {
            r.vertex: r.scc_id
            for r in strongly_connected_components(spark, graphs, edges).collect()
        }
        assert got == expected, f"seed {seed}"


def test_scc_literal_structures(spark):
    """Two cycles bridged by a DAG edge + a tail: exact SCC structure."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )

    rows = [
        # cycle A: 0->1->2->0 ; cycle B: 3->4->3 ; bridge 2->3; tail 4->5
        (1, 0, 1), (1, 1, 2), (1, 2, 0),
        (1, 3, 4), (1, 4, 3),
        (1, 2, 3), (1, 4, 5),
    ]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(1, 6)], "graph_id INT, n INT")
    got = {
        r.vertex: r.scc_id
        for r in strongly_connected_components(spark, graphs, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_scc_path_graph_trims_in_one_round(spark):
    """A pure path (all-singleton SCCs) must resolve via trim, not one
    round per vertex — 60 vertices with max_rounds=3 only works if the
    trim fixpoint peels the whole chain."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )

    n = 60
    rows = [(1, i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.scc_id
        for r in strongly_connected_components(
            spark, graphs, edges, max_rounds=3
        ).collect()
    }
    assert got == {v: v for v in range(n)}


def test_scc_scale_graph_matches_tarjan(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    scale_edges = scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    expected = _tarjan_scc(
        SCALE_V, [(r.src, r.dst) for r in scale_edges.collect()]
    )
    graphs = spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT")
    got = {
        r.vertex: r.scc_id
        for r in strongly_connected_components(spark, graphs, scale_edges).collect()
    }
    # Tarjan reference assigns every vertex (isolated ones are their own
    # SCC); ours zero-fills from the vertex universe the same way
    assert got == expected


def test_scc_kernel_equals_superstep_random(spark):
    """Kernel (Tarjan) ≡ superstep (FW-BW coloring) on random digraphs —
    the same two-regimes equivalence pin CC and PageRank carry."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        scc_kernel,
    )

    for seed in (5, 23):
        rng = random.Random(seed)
        n = 25
        rows = [(11, s, d) for s in range(n) for d in range(n)
                if s != d and rng.random() < 0.08]
        edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
        graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
        a = {(r.vertex, r.scc_id) for r in scc_kernel(graphs, edges).collect()}
        b = {
            (r.vertex, r.scc_id)
            for r in strongly_connected_components(spark, graphs, edges).collect()
        }
        assert a == b, f"seed {seed}"


def test_scc_kernel_long_cycle(spark):
    """A 2000-vertex directed cycle: one SCC — the long-cycle regime the
    superstep coloring scheme would pay O(|C|) supersteps for."""
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        scc_kernel,
    )

    n = 2000
    rows = [(1, i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT").coalesce(1)
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    got = {r.scc_id for r in scc_kernel(graphs, edges).collect()}
    assert got == {0}


def _py_brandes_from_pivots(n, edge_list, pivots):
    """Independent Brandes dependency accumulation (BFS DAG, endpoints
    excluded), summed over the given pivot sources."""
    from collections import deque

    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, []).append(t)
    delta_sum = {v: 0.0 for v in range(n)}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0.0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = {v: 0.0 for v in dist}
        for u in reversed(order):
            for v in adj.get(u, ()):
                if v in dist and dist[v] == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if u != s:
                delta_sum[u] += delta[u]
    return delta_sum


def test_betweenness_sampled_matches_python_brandes(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        _PIVOT_KNUTH, _PIVOT_MOD, betweenness_sampled,
    )

    rng = random.Random(31)
    n, k = 28, 5
    rows = [(11, s, d) for s in range(n) for d in range(n)
            if s != d and rng.random() < 0.1]
    pivots = sorted(range(n), key=lambda v: ((v * _PIVOT_KNUTH) % _PIVOT_MOD, v))[:k]
    expected = _py_brandes_from_pivots(n, [(s, d) for _, s, d in rows], pivots)
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.delta_sum, r.bc_estimate)
        for r in betweenness_sampled(spark, graphs, edges, k_pivots=k).collect()
    }
    assert set(got) == set(range(n))
    for v in range(n):
        assert abs(got[v][0] - expected[v]) < 1e-9, (v, got[v][0], expected[v])
        assert abs(got[v][1] - expected[v] * n / k) < 1e-6
    assert any(d > 0 for d, _ in got.values())


def test_betweenness_path_graph_literal(spark):
    """On a directed path with a pivot at the head, interior vertices carry
    descending dependency (classic Brandes hand answer)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        betweenness_sampled,
    )

    n = 5
    rows = [(1, i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.delta_sum
        for r in betweenness_sampled(spark, graphs, edges, k_pivots=n).collect()
    }
    # all n pivots: vertex v (interior) lies on paths from every s < v to
    # every t > v; delta from source s at v = (n-1-v) if s <= v... verify by
    # the independent reference instead of deriving by hand
    expected = _py_brandes_from_pivots(n, [(s, d) for _, s, d in rows], list(range(n)))
    for v in range(n):
        assert abs(got[v] - expected[v]) < 1e-9
    assert got[2] > got[4]


def test_sssp_predecessors_form_valid_shortest_path_tree(spark):
    """Distances ≡ Python Dijkstra; every pred edge is tight
    (dist[pred] + w == dist[v]); reconstructed paths are valid and
    weight-exact."""
    import heapq

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        reconstruct_path,
        sssp_with_predecessors,
    )

    rng = random.Random(77)
    n = 30
    rows = [
        (s, d, rng.randrange(1, 20))
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.12
    ]
    w = {}
    adj = {}
    for s, d, wt in rows:
        if (s, d) not in w or wt < w[(s, d)]:
            w[(s, d)] = wt
    for (s, d), wt in w.items():
        adj.setdefault(s, []).append((d, wt))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, wt in adj.get(u, ()):
            nd = du + wt
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))

    edges = spark.createDataFrame(
        [(s, d, wt) for (s, d), wt in w.items()], "src INT, dst INT, weight BIGINT"
    )
    out = sssp_with_predecessors(spark, edges, 0)
    got = {r.vertex: (r.distance, r.pred) for r in out.collect()}
    assert {v: d for v, (d, _) in got.items()} == dist
    for v, (d, p) in got.items():
        if v == 0:
            assert p is None
            continue
        assert (p, v) in w and got[p][0] + w[(p, v)] == d, (v, p)
    # reconstruct a few paths; each must be edge-valid and weight-exact
    reachable = sorted(set(dist) - {0})[:5]
    for t in reachable:
        path = reconstruct_path(out, t)
        assert path[0] == 0 and path[-1] == t
        assert sum(w[(a, b)] for a, b in zip(path, path[1:])) == dist[t]


def test_weighted_pagerank_matches_python_reference(spark):
    """Weighted PageRank vs an independent dense power iteration with
    weight-proportional transitions; uniform weights must reduce to plain
    PageRank exactly."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        pagerank, pagerank_weighted,
    )

    rng = random.Random(41)
    n, iters, d = 20, 8, 0.85
    rows = [
        (1, s, t, rng.randrange(1, 10))
        for s in range(n) for t in range(n)
        if s != t and rng.random() < 0.15
    ]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT, weight INT")
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")

    out_w = {}
    for _, s, t, wt in rows:
        out_w[s] = out_w.get(s, 0) + wt
    rank = [1.0 / n] * n
    for _ in range(iters):
        received = [0.0] * n
        dangling = sum(rank[v] for v in range(n) if v not in out_w)
        for _, s, t, wt in rows:
            received[t] += rank[s] * wt / out_w[s]
        rank = [
            (1 - d) / n + d * (received[v] + dangling / n) for v in range(n)
        ]
    got = {
        r.vertex: r.rank
        for r in pagerank_weighted(spark, graphs, edges, iterations=iters).collect()
    }
    for v in range(n):
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # unit weights -> identical to plain pagerank (same formula, same order)
    from pyspark.sql import functions as F

    unit = edges.withColumn("weight", F.lit(1))
    plain = {
        r.vertex: r.rank
        for r in pagerank(spark, graphs, edges.drop("weight"), iterations=iters).collect()
    }
    weighted_unit = {
        r.vertex: r.rank
        for r in pagerank_weighted(spark, graphs, unit, iterations=iters).collect()
    }
    for v in range(n):
        assert abs(weighted_unit[v] - plain[v]) < 1e-12



# ---------------------------------------------------------------------------
# HyperBall (approximate neighborhood function) + effective diameter
# ---------------------------------------------------------------------------

_HB_M = 64
_HB_W = 54  # 60-bit hash, log2m = 6


def _hb_py_init(v):
    """Python mirror of graph_analytics._hb_init_state's hashing."""
    import hashlib

    h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
    reg = h % _HB_M
    w = h // _HB_M
    rho = _HB_W + 1 if w == 0 else _HB_W + 1 - w.bit_length()
    return reg, rho


def _hb_py_estimate(regs):
    """Python mirror of graph_analytics._hb_estimates's per-vertex formula."""
    import math

    zeros = _HB_M - len(regs)
    z = sum(2.0 ** -r for r in regs.values()) + zeros
    e_raw = 0.709 * _HB_M * _HB_M / z
    if zeros > 0 and e_raw <= 2.5 * _HB_M:
        return _HB_M * math.log(_HB_M / zeros)
    return e_raw


def _hb_py_simulate(n, edge_rows, max_t=10_000):
    """Independent HyperBall simulation: dict-of-registers per vertex,
    identical hash / merge / estimate / convergence semantics.
    Returns {t: nf_est}."""
    counters = {}
    for v in range(n):
        reg, rho = _hb_py_init(v)
        counters[v] = {reg: rho}
    out = {v: [] for v in range(n)}
    for s, d in edge_rows:
        out[s].append(d)

    def checksum():
        return sum(sum(c.values()) + len(c) for c in counters.values())

    nf = {0: sum(_hb_py_estimate(c) for c in counters.values())}
    prev = checksum()
    for t in range(1, max_t + 1):
        new = {}
        for v in range(n):
            merged = dict(counters[v])
            for w in out[v]:
                for reg, rho in counters[w].items():
                    if merged.get(reg, 0) < rho:
                        merged[reg] = rho
            new[v] = merged
        counters = new
        cs = checksum()
        if cs == prev:
            break
        nf[t] = sum(_hb_py_estimate(c) for c in counters.values())
        prev = cs
    return nf


def test_hyperball_matches_python_simulation(spark):
    """Spark HyperBall must reproduce an independent Python simulation of
    the same deterministic register algebra exactly (md5 hashes, max-merge,
    linear-counting correction, checksum-based convergence)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball,
    )

    rng = random.Random(19)
    n = 30
    rows = [(11, s, d) for (_, s, d) in _random_graph(rng, n, 0.07)]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {r.t: r.nf_est for r in hyperball(spark, graphs, edges).collect()}
    want = _hb_py_simulate(n, [(s, d) for (_, s, d) in rows])
    assert set(got) == set(want)
    for t in want:
        assert got[t] == pytest.approx(want[t], rel=1e-6)
    assert len(want) >= 2  # graph actually propagated


def test_hyperball_estimates_exact_nf_on_path_graph(spark):
    """Directed path 0->1->...->9: exact N(t) known in closed form; the
    m=64 estimate (small balls -> linear-counting regime) must land within
    10% at every t and converge in exactly diameter supersteps."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball,
    )

    n = 10
    edges = spark.createDataFrame(
        [(1, v, v + 1) for v in range(n - 1)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    nf = {r.t: r.nf_est for r in hyperball(spark, graphs, edges).collect()}
    assert max(nf) == n - 1  # converges after exactly diameter steps
    for t in range(n):
        exact = sum(min(t, n - 1 - v) + 1 for v in range(n))
        assert nf[t] == pytest.approx(exact, rel=0.10)


def test_hyperball_on_scale_graph_reachable_pairs(spark, sf_dir):
    """Orders-derived scale graph, symmetrized: strongly connected with a
    tiny diameter, so the converged N(t) must estimate |V|^2 reachable
    pairs within the HLL envelope, after very few supersteps."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball,
        undirected,
    )
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    edges = undirected(
        scale_edges_df(spark, sf_dir).selectExpr(
            "CAST(1 AS INT) AS graph_id", "src", "dst"
        )
    )
    graphs = spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT")
    nf = {r.t: r.nf_est for r in hyperball(spark, graphs, edges).collect()}
    t_max = max(nf)
    assert t_max <= 6  # near-complete graph closes almost immediately
    assert nf[t_max] == pytest.approx(SCALE_V * SCALE_V, rel=0.15)


def test_effective_diameter_interpolates_exact_nf(spark):
    """effective_diameter on an EXACT neighborhood function of the path
    graph must equal the hand-computed interpolated value, and alpha=1
    must return the true diameter."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        effective_diameter,
    )

    n = 10
    rows = [
        (1, t, float(sum(min(t, n - 1 - v) + 1 for v in range(n))))
        for t in range(n)
    ]
    nf = spark.createDataFrame(rows, "graph_id INT, t INT, nf_est DOUBLE")
    target = 0.9 * rows[-1][2]
    exact = {t: v for (_, t, v) in rows}
    t_hit = min(t for t in exact if exact[t] >= target)
    want = (t_hit - 1) + (target - exact[t_hit - 1]) / (exact[t_hit] - exact[t_hit - 1])
    got = effective_diameter(nf).collect()[0]
    assert got.effective_diameter == pytest.approx(want, rel=1e-12)
    full = effective_diameter(nf, alpha=1.0).collect()[0]
    assert full.effective_diameter == pytest.approx(float(n - 1), rel=1e-12)


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------

def _py_ktruss(edge_rows, k):
    """Independent reference: iterated support peeling over adjacency sets.
    edge_rows: undirected edges as (u, v) in any orientation."""
    edges = {tuple(sorted(e)) for e in edge_rows if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        support = {
            (u, v): len(adj[u] & adj[v]) for (u, v) in edges
        }
        kept = {e for e in edges if support[e] >= k - 2}
        if kept == edges:
            return {e: support[e] for e in edges}
        edges = kept


def test_ktruss_matches_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        ktruss,
    )

    rng = random.Random(47)
    n = 22
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(s + 1, n)
        if rng.random() < 0.25
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    for k in (3, 4, 5):
        got = {
            (r.src, r.dst): r.support for r in ktruss(spark, df, k).collect()
        }
        want = _py_ktruss(edge_rows, k)
        assert got == want, f"k={k}"


def test_ktruss_literals(spark):
    """K5 survives every truss up to 5 (each edge closes 3 triangles);
    a path graph has an empty 3-truss; a triangle with a pendant edge
    peels to exactly the triangle."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        ktruss,
    )

    k5 = [(1, u, v) for u in range(5) for v in range(u + 1, 5)]
    df = spark.createDataFrame(k5, "graph_id INT, src INT, dst INT")
    out = ktruss(spark, df, 5).collect()
    assert len(out) == 10 and all(r.support == 3 for r in out)
    assert ktruss(spark, df, 6).count() == 0

    path = spark.createDataFrame(
        [(1, v, v + 1) for v in range(6)], "graph_id INT, src INT, dst INT"
    )
    assert ktruss(spark, path, 3).count() == 0

    pendant = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2), (1, 0, 2), (1, 2, 3)],
        "graph_id INT, src INT, dst INT",
    )
    tri = {(r.src, r.dst) for r in ktruss(spark, pendant, 3).collect()}
    assert tri == {(0, 1), (1, 2), (0, 2)}


# ---------------------------------------------------------------------------
# Maximal independent set (Luby, deterministic priorities)
# ---------------------------------------------------------------------------

def _py_mis(g, n, edge_rows, max_rounds=1000):
    """Independent reference with the identical documented hash rule."""
    import hashlib

    nbrs = {v: set() for v in range(n)}
    for s, d in edge_rows:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    active = set(range(n))
    chosen = {}
    for rnd in range(1, max_rounds + 1):
        if not active:
            break
        pri = {
            v: int(hashlib.md5(f"{g}|{v}|{rnd}".encode()).hexdigest()[:15], 16)
            for v in active
        }
        winners = {
            v
            for v in active
            if all((pri[v], v) > (pri[w], w) for w in nbrs[v] if w in active)
        }
        for v in winners:
            chosen[v] = rnd
        dead = set(winners)
        for v in winners:
            dead |= nbrs[v]
        active -= dead
    return chosen


def test_mis_matches_python_reference_and_is_maximal(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        maximal_independent_set,
    )

    rng = random.Random(53)
    n = 40
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.1
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.round
        for r in maximal_independent_set(spark, graphs, df).collect()
    }
    want = _py_mis(11, n, edge_rows)
    assert got == want
    # independence + maximality, checked structurally (not via the reference)
    mis = set(got)
    nbrs = {v: set() for v in range(n)}
    for s, d in edge_rows:
        nbrs[s].add(d)
        nbrs[d].add(s)
    assert all(not (nbrs[v] & mis) for v in mis)
    assert all(v in mis or (nbrs[v] & mis) for v in range(n))


def test_mis_isolated_vertices_and_scale_graph(spark, sf_dir):
    """Isolated vertices always enter the MIS; on the near-complete scale
    graph the MIS is tiny but nonempty, independent, and maximal."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        maximal_independent_set,
    )
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    iso = spark.createDataFrame([(2, 0, 1)], "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(2, 5)], "graph_id INT, n INT")
    got = {r.vertex for r in maximal_independent_set(spark, graphs, iso).collect()}
    assert {2, 3, 4} <= got and len(got & {0, 1}) == 1

    edges = scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    sg = spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT")
    mis = {r.vertex for r in maximal_independent_set(spark, sg, edges).collect()}
    nbr = {}
    for r in edges.collect():
        nbr.setdefault(r.src, set()).add(r.dst)
        nbr.setdefault(r.dst, set()).add(r.src)
    assert mis
    assert all(not (nbr.get(v, set()) & mis) for v in mis)
    assert all(v in mis or (nbr.get(v, set()) & mis) for v in range(SCALE_V))


# ---------------------------------------------------------------------------
# Temporal reachability (earliest arrival over time-respecting paths)
# ---------------------------------------------------------------------------

def _py_temporal_earliest(edge_rows, source, t0):
    """Independent reference: Dijkstra-flavored earliest-arrival search.
    edge_rows: (src, dst, ts)."""
    import heapq

    by_src = {}
    for s, d, ts in edge_rows:
        by_src.setdefault(s, []).append((d, ts))
    best = {source: t0}
    heap = [(t0, source)]
    while heap:
        at, v = heapq.heappop(heap)
        if at > best.get(v, float("inf")):
            continue
        for d, ts in by_src.get(v, ()):
            if ts >= at and ts < best.get(d, float("inf")):
                best[d] = ts
                heapq.heappush(heap, (ts, d))
    return best


def test_temporal_reachability_matches_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        temporal_reachability,
    )

    rng = random.Random(61)
    n = 30
    edge_rows = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(100))
        for _ in range(220)
    ]
    edge_rows = [(s, d, t) for (s, d, t) in edge_rows if s != d]
    edges = spark.createDataFrame(
        [(11, s, d, t) for s, d, t in edge_rows],
        "graph_id INT, src INT, dst INT, ts BIGINT",
    )
    sources = spark.createDataFrame(
        [(11, 0, 0), (11, 7, 50)], "graph_id INT, source INT, t0 BIGINT"
    )
    got = {
        (r.source, r.vertex): r.earliest
        for r in temporal_reachability(spark, edges, sources).collect()
    }
    want = {}
    for src, t0 in ((0, 0), (7, 50)):
        for v, t in _py_temporal_earliest(edge_rows, src, t0).items():
            want[(src, v)] = t
    assert got == want


def test_temporal_reachability_respects_time_ordering(spark):
    """An edge that departs before you arrive is unusable: 0-1 at t=5 then
    1-2 at t=3 must NOT reach 2; the reverse ordering must."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        temporal_reachability,
    )

    sources = spark.createDataFrame([(1, 0, 0)], "graph_id INT, source INT, t0 BIGINT")
    late_then_early = spark.createDataFrame(
        [(1, 0, 1, 5), (1, 1, 2, 3)], "graph_id INT, src INT, dst INT, ts BIGINT"
    )
    got = {
        r.vertex: r.earliest
        for r in temporal_reachability(spark, late_then_early, sources).collect()
    }
    assert got == {0: 0, 1: 5}

    early_then_late = spark.createDataFrame(
        [(1, 0, 1, 3), (1, 1, 2, 5)], "graph_id INT, src INT, dst INT, ts BIGINT"
    )
    got = {
        r.vertex: r.earliest
        for r in temporal_reachability(spark, early_then_late, sources).collect()
    }
    assert got == {0: 0, 1: 3, 2: 5}


# ---------------------------------------------------------------------------
# Greedy coloring (iterated MIS) + sampled triangles (Doulion)
# ---------------------------------------------------------------------------

def test_greedy_coloring_proper_and_matches_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        greedy_coloring,
    )

    rng = random.Random(71)
    n = 30
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.15
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.color for r in greedy_coloring(spark, graphs, df).collect()
    }
    # independent reference: iterate the SAME documented MIS rule per color
    nbrs = {v: set() for v in range(n)}
    for s, d in edge_rows:
        nbrs[s].add(d)
        nbrs[d].add(s)
    remaining = set(range(n))
    want = {}
    color = 0
    while remaining:
        sub_edges = [
            (s, d) for s, d in edge_rows if s in remaining and d in remaining
        ]
        mis = set(_py_mis(11, n, sub_edges)) & remaining
        # _py_mis runs over all n vertices; restrict to the remaining set
        # by re-running on the induced subgraph's vertex set:
        mis = _py_mis_subset(11, remaining, sub_edges)
        for v in mis:
            want[v] = color
        remaining -= mis
        color += 1
    assert got == want
    # proper coloring + degree bound
    for s, d in edge_rows:
        assert got[s] != got[d]
    max_deg = max(len(nbrs[v]) for v in range(n))
    assert max(got.values()) <= max_deg


def _py_mis_subset(g, vertex_set, edge_rows, max_rounds=1000):
    """Luby MIS over an explicit vertex subset (reference for the coloring
    inner loop)."""
    import hashlib

    nbrs = {v: set() for v in vertex_set}
    for s, d in edge_rows:
        nbrs[s].add(d)
        nbrs[d].add(s)
    active = set(vertex_set)
    chosen = set()
    for rnd in range(1, max_rounds + 1):
        if not active:
            break
        pri = {
            v: int(hashlib.md5(f"{g}|{v}|{rnd}".encode()).hexdigest()[:15], 16)
            for v in active
        }
        winners = {
            v
            for v in active
            if all((pri[v], v) > (pri[w], w) for w in nbrs[v] if w in active)
        }
        chosen |= winners
        dead = set(winners)
        for v in winners:
            dead |= nbrs[v]
        active -= dead
    return chosen


def test_triangle_count_sampled_exact_at_p1_and_envelope(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        triangle_count,
        triangle_count_sampled,
    )

    rng = random.Random(83)
    n = 60
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.3
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    exact = triangle_count(df).collect()[0].triangles
    assert exact > 100
    full = triangle_count_sampled(df, sample_ppm=1_000_000).collect()[0]
    assert full.triangles_est == pytest.approx(float(exact), rel=1e-12)
    est = triangle_count_sampled(df, sample_ppm=500_000).collect()[0]
    assert est.triangles_est == pytest.approx(float(exact), rel=0.4)
    # determinism of the hash coin
    est2 = triangle_count_sampled(df, sample_ppm=500_000).collect()[0]
    assert est.triangles_est == est2.triangles_est


# ---------------------------------------------------------------------------
# Articulation points / bridges kernel
# ---------------------------------------------------------------------------

def _py_cut_bruteforce(n, edge_rows):
    """Brute-force reference: v is an articulation point iff removing it
    increases the component count among the remaining vertices; (u, v) is
    a bridge iff removing it disconnects u from v."""
    adj = {v: set() for v in range(n)}
    for s, d in edge_rows:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)

    def components(excl_v=None, excl_e=None):
        seen, comps = set(), 0
        for start in range(n):
            if start == excl_v or start in seen:
                continue
            comps += 1
            stack = [start]
            seen.add(start)
            while stack:
                v = stack.pop()
                for w in adj[v]:
                    if w == excl_v or w in seen:
                        continue
                    if excl_e and {v, w} == set(excl_e):
                        continue
                    seen.add(w)
                    stack.append(w)
        return comps

    base = components()
    arts = {v for v in range(n) if components(excl_v=v) > base - (0 if adj[v] else 1)}
    edges_c = {tuple(sorted((s, d))) for s, d in edge_rows if s != d}
    bridges = {e for e in edges_c if components(excl_e=e) > base}
    return arts, bridges


def test_articulation_kernel_matches_bruteforce(spark):
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        articulation_kernel,
    )

    rng = random.Random(97)
    n = 25
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.08
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    out = articulation_kernel(graphs, df).collect()
    got_arts = {r.vertex for r in out if r.kind == "articulation"}
    got_bridges = {(r.src, r.dst) for r in out if r.kind == "bridge"}
    want_arts, want_bridges = _py_cut_bruteforce(n, edge_rows)
    assert got_arts == want_arts
    assert got_bridges == want_bridges


def test_articulation_kernel_literals(spark):
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        articulation_kernel,
    )

    # path: internal vertices are articulation points, every edge a bridge
    path = spark.createDataFrame(
        [(1, v, v + 1) for v in range(4)], "graph_id INT, src INT, dst INT"
    )
    g1 = spark.createDataFrame([(1, 5)], "graph_id INT, n INT")
    out = articulation_kernel(g1, path).collect()
    assert {r.vertex for r in out if r.kind == "articulation"} == {1, 2, 3}
    assert {(r.src, r.dst) for r in out if r.kind == "bridge"} == {
        (0, 1), (1, 2), (2, 3), (3, 4)
    }
    # cycle: no cuts at all
    cyc = spark.createDataFrame(
        [(2, v, (v + 1) % 5) for v in range(5)], "graph_id INT, src INT, dst INT"
    )
    g2 = spark.createDataFrame([(2, 5)], "graph_id INT, n INT")
    assert articulation_kernel(g2, cyc).count() == 0
    # bowtie (two triangles sharing vertex 2): shared vertex only, no bridges
    bow = spark.createDataFrame(
        [(3, 0, 1), (3, 1, 2), (3, 0, 2), (3, 2, 3), (3, 3, 4), (3, 2, 4)],
        "graph_id INT, src INT, dst INT",
    )
    g3 = spark.createDataFrame([(3, 5)], "graph_id INT, n INT")
    out = articulation_kernel(g3, bow).collect()
    assert {r.vertex for r in out if r.kind == "articulation"} == {2}
    assert not [r for r in out if r.kind == "bridge"]


# ---------------------------------------------------------------------------
# Contraction (large-star/small-star) connected components
# ---------------------------------------------------------------------------

def test_contraction_cc_equals_superstep_cc_random(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components,
        connected_components_contraction,
    )

    rng = random.Random(107)
    rows = _random_graph(rng, 45, 0.05) + [(12, s, d) for (_, s, d) in _random_graph(rng, 20, 0.08)]
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, 45), (12, 20)], "graph_id INT, n INT")
    a = {
        (r.graph_id, r.vertex): r.component
        for r in connected_components(spark, graphs, df).collect()
    }
    b = {
        (r.graph_id, r.vertex): r.component
        for r in connected_components_contraction(spark, graphs, df).collect()
    }
    assert a == b


def test_contraction_cc_logarithmic_on_path(spark):
    """A 300-vertex path: min-label propagation needs ~300 supersteps;
    contraction must finish within 20 rounds (O(log n)) and still label
    every vertex with component 0."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components_contraction,
    )

    n = 300
    df = spark.createDataFrame(
        [(1, v, v + 1) for v in range(n - 1)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    out = connected_components_contraction(spark, graphs, df, max_rounds=20)
    comps = {r.vertex: r.component for r in out.collect()}
    assert len(comps) == n
    assert set(comps.values()) == {0}


def _hb_py_harmonic(n, edge_rows, max_t=10_000):
    """Independent HyperBall-harmonic simulation: identical register
    algebra to _hb_py_simulate, accumulating clamped per-vertex ball-size
    deltas / t (the documented estimator)."""
    counters = {}
    for v in range(n):
        reg, rho = _hb_py_init(v)
        counters[v] = {reg: rho}
    out = {v: [] for v in range(n)}
    for s, d in edge_rows:
        out[s].append(d)
    prev = {v: _hb_py_estimate(c) for v, c in counters.items()}
    acc = {v: 0.0 for v in range(n)}

    def checksum():
        return sum(sum(c.values()) + len(c) for c in counters.values())

    cs_prev = checksum()
    for t in range(1, max_t + 1):
        new = {}
        for v in range(n):
            merged = dict(counters[v])
            for w in out[v]:
                for reg, rho in counters[w].items():
                    if merged.get(reg, 0) < rho:
                        merged[reg] = rho
            new[v] = merged
        counters = new
        cs = checksum()
        if cs == cs_prev:
            break
        cs_prev = cs
        for v in range(n):
            est = _hb_py_estimate(counters[v])
            acc[v] += max(est - prev[v], 0.0) / t
            prev[v] = est
    return acc


def test_hyperball_harmonic_matches_python_simulation(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball_harmonic,
    )

    rng = random.Random(113)
    n = 25
    rows = [(11, s, d) for (_, s, d) in _random_graph(rng, n, 0.09)]
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.harmonic_est
        for r in hyperball_harmonic(spark, graphs, edges).collect()
    }
    want = _hb_py_harmonic(n, [(s, d) for (_, s, d) in rows])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-6, abs=1e-9)


def test_hyperball_harmonic_envelope_on_path(spark):
    """Directed path: exact out-harmonic H(v) = sum_{k=1..n-1-v} 1/k; the
    estimate must track it (median relative error under 15%) and rank the
    head of the path first."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball_harmonic,
    )

    n = 12
    edges = spark.createDataFrame(
        [(1, v, v + 1) for v in range(n - 1)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.harmonic_est
        for r in hyperball_harmonic(spark, graphs, edges).collect()
    }
    exact = {v: sum(1.0 / k for k in range(1, n - v)) for v in range(n)}
    rel = sorted(
        abs(got[v] - exact[v]) / exact[v] for v in range(n - 1)
    )
    assert rel[len(rel) // 2] < 0.15
    assert max(got, key=got.get) == 0
    assert got[n - 1] == pytest.approx(0.0, abs=1e-9)


def test_landmark_distance_oracle_upper_bounds_and_exactness(spark):
    """Oracle estimates must equal min over landmarks of d(u,l)+d(l,v)
    (checked vs Python BFS tables) and therefore upper-bound the true
    distance; pairs whose shortest path crosses a landmark are exact."""
    from collections import deque

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        estimate_distances,
        landmark_distance_oracle,
    )

    rng = random.Random(127)
    n = 30
    edge_rows = [
        (s, d) for s in range(n) for d in range(n) if s != d and rng.random() < 0.08
    ]
    edges = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    lms = [0, 9, 17]
    landmarks = spark.createDataFrame(
        [(11, l) for l in lms], "graph_id INT, source INT"
    )
    fwd, bwd = landmark_distance_oracle(spark, edges, landmarks)
    pair_rows = [(11, u, v) for u in range(0, n, 3) for v in range(1, n, 4) if u != v]
    pairs = spark.createDataFrame(pair_rows, "graph_id INT, u INT, v INT")
    got = {
        (r.u, r.v): r.dist_upper
        for r in estimate_distances(fwd, bwd, pairs).collect()
    }

    def bfs_from(start, adj):
        dist = {start: 0}
        q = deque([start])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        return dist

    adj_f, adj_b = {}, {}
    for s, d in edge_rows:
        adj_f.setdefault(s, []).append(d)
        adj_b.setdefault(d, []).append(s)
    d_from = {l: bfs_from(l, adj_f) for l in lms}
    d_to = {l: bfs_from(l, adj_b) for l in lms}  # reversed = distance TO l
    checked_exact = 0
    for (g, u, v) in pair_rows:
        cands = [
            d_to[l][u] + d_from[l][v]
            for l in lms
            if u in d_to[l] and v in d_from[l]
        ]
        want = min(cands) if cands else None
        assert got[(u, v)] == want
        true_d = bfs_from(u, adj_f).get(v)
        if want is not None:
            assert true_d is not None and want >= true_d
            if true_d == want:
                checked_exact += 1
    assert checked_exact > 0


def _py_coreness(n, edge_rows):
    """Independent reference: textbook min-degree peeling."""
    adj = {v: set() for v in range(n)}
    for s, d in edge_rows:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(adj[v]) for v in range(n)}
    core = {}
    remaining = set(range(n))
    k = 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.discard(v)
        for w in adj[v]:
            if w in remaining:
                deg[w] -= 1
    return core


def test_core_numbers_match_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        core_numbers,
    )

    rng = random.Random(131)
    n = 35
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.12
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {r.vertex: r.coreness for r in core_numbers(spark, graphs, df).collect()}
    assert got == _py_coreness(n, edge_rows)


def test_core_numbers_consistent_with_kcore(spark):
    """coreness >= k exactly characterizes membership of the k-core."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        core_numbers,
        kcore,
    )

    rng = random.Random(137)
    n = 25
    rows = [
        (11, s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.2
    ]
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    cores = {r.vertex: r.coreness for r in core_numbers(spark, graphs, df).collect()}
    for k in (1, 2, 3):
        members = {r.vertex for r in kcore(spark, graphs, df, k).collect()}
        assert members == {v for v, c in cores.items() if c >= k}


def test_modularity_matches_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        label_propagation,
        modularity,
    )

    rng = random.Random(139)
    # two dense clusters + sparse bridge: positive modularity expected
    rows = []
    for base in (0, 10):
        for s in range(base, base + 10):
            for d in range(s + 1, base + 10):
                if rng.random() < 0.6:
                    rows.append((11, s, d))
    rows.append((11, 3, 14))
    df = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(11, 20)], "graph_id INT, n INT")
    assignment = spark.createDataFrame(
        [(11, v, 0 if v < 10 else 1) for v in range(20)],
        "graph_id INT, vertex INT, community INT",
    )
    got = modularity(df, assignment).collect()[0].modularity
    # independent reference
    ue = {(s, d) for (_, s, d) in rows} | {(d, s) for (_, s, d) in rows}
    canon = {(s, d) for (s, d) in ue if s < d}
    m = len(canon)
    comm = {v: 0 if v < 10 else 1 for v in range(20)}
    deg = {}
    for s, d in ue:
        deg[s] = deg.get(s, 0) + 1
    q = 0.0
    for c in (0, 1):
        e_c = sum(1 for (s, d) in canon if comm[s] == c and comm[d] == c)
        d_c = sum(dv for v, dv in deg.items() if comm[v] == c)
        q += e_c / m - (d_c / (2 * m)) ** 2
    assert got == pytest.approx(q, rel=1e-12)
    assert got > 0.3


def test_eccentricity_kernel_matches_bruteforce_and_double_sweep(spark):
    from collections import deque

    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        eccentricity_kernel,
    )

    rng = random.Random(151)
    n = 20
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.15
    ]
    df = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {r.vertex: r.eccentricity for r in eccentricity_kernel(graphs, df).collect()}
    adj = {v: set() for v in range(n)}
    for s, d in edge_rows:
        adj[s].add(d)
        adj[d].add(s)
    for start in range(n):
        dist = {start: 0}
        q = deque([start])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        want = max(dist.values()) if len(dist) == n else -1
        assert got[start] == want
    # path graph literal: ecc(v) = max(v, n-1-v); diameter n-1
    path = spark.createDataFrame(
        [(1, v, v + 1) for v in range(5)], "graph_id INT, src INT, dst INT"
    )
    g2 = spark.createDataFrame([(1, 6)], "graph_id INT, n INT")
    ecc = {r.vertex: r.eccentricity for r in eccentricity_kernel(g2, path).collect()}
    assert ecc == {v: max(v, 5 - v) for v in range(6)}


def test_graph_summary_on_reference_fixtures(spark):
    """Summary stats over the G1/G5/G7 fixture graphs vs hand-computed
    values (G1 = 2-vertex identity matrix: two self-loops, no simple
    edges; G5 = 5-vertex tree; G7 = 7-vertex tree)."""
    from distributed_graph_database_simulation_spark import fixtures
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        graph_summary,
    )

    edges = fixtures.fixture_edges_df(spark)
    graphs = fixtures.fixture_graphs_df(spark)
    out = {r.graph_id: r for r in graph_summary(graphs, edges).collect()}
    g1 = out[1]
    assert (g1.n_vertices, g1.n_self_loops, g1.n_undirected_edges) == (2, 2, 0)
    assert g1.n_isolated == 2 and g1.density == 0.0
    g5 = out[5]
    assert (g5.n_vertices, g5.n_undirected_edges, g5.n_self_loops) == (5, 4, 0)
    assert g5.density == pytest.approx(4 / 10)
    assert (g5.min_degree, g5.max_degree, g5.n_isolated) == (1, 3, 0)
    assert g5.avg_degree == pytest.approx(8 / 5)
    g7 = out[7]
    assert (g7.n_vertices, g7.n_undirected_edges) == (7, 6)
    assert g7.density == pytest.approx(6 / 21)


def _py_matching(g, edge_rows, max_rounds=1000):
    """Independent maximal-matching reference with the identical documented
    edge-priority hash rule (local max at BOTH endpoints wins)."""
    import hashlib

    active = {(min(s, d), max(s, d)) for s, d in edge_rows if s != d}
    chosen = {}
    for rnd in range(1, max_rounds + 1):
        if not active:
            break
        pri = {
            e: (int(hashlib.md5(f"{g}|{e[0]}|{e[1]}|{rnd}".encode())
                    .hexdigest()[:15], 16), e[0], e[1])
            for e in active
        }
        winners = {
            e for e in active
            if all(pri[e] >= pri[f] for f in active if set(e) & set(f))
        }
        for e in winners:
            chosen[e] = rnd
        matched = {v for e in winners for v in e}
        active = {e for e in active if not (set(e) & matched)}
    return chosen


def test_matching_matches_python_reference_and_is_maximal(spark):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        maximal_matching,
    )

    rng = random.Random(71)
    n = 40
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.12
    ]
    df = spark.createDataFrame(
        [(13, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(13, n)], "graph_id INT, n INT")
    got = {
        (r.src, r.dst): r.round
        for r in maximal_matching(spark, graphs, df).collect()
    }
    assert got == _py_matching(13, edge_rows)
    # matching + maximality, checked structurally: matched edges are
    # vertex-disjoint, and every input edge touches a matched vertex
    matched_v = [v for e in got for v in e]
    assert len(matched_v) == len(set(matched_v))
    mv = set(matched_v)
    assert all(s in mv or d in mv for s, d in edge_rows if s != d)


def test_densest_subgraph_peels_to_planted_core(spark):
    """Peeling must recover a planted near-clique inside a sparse
    periphery, replaying exactly the documented integer peel predicate
    (deg * n * 10 <= 11 * m2); verified against an independent Python
    peeling of the same graph."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        densest_subgraph,
    )

    n = 40
    core = [(s, d) for s in range(8) for d in range(s + 1, 8)]  # K8
    rng = random.Random(17)
    periphery = [
        (s, d) for s in range(8, n) for d in range(s + 1, n) if rng.random() < 0.04
    ]
    edge_rows = core + periphery + [(0, 20), (3, 25)]  # bridge the core in
    df = spark.createDataFrame(
        [(9, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(9, n)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.peel_round, r.in_densest)
        for r in densest_subgraph(spark, graphs, df).collect()
    }
    # independent Python replay
    ue = {(s, d) for s, d in edge_rows if s != d} | {
        (d, s) for s, d in edge_rows if s != d
    }
    active, peel, t = set(range(n)), {}, 0
    while active:
        t += 1
        sub = {(s, d) for s, d in ue if s in active and d in active}
        m2, nt = len(sub), len(active)
        deg = {v: 0 for v in active}
        for s, _ in sub:
            deg[s] += 1
        removed = {v for v in active if deg[v] * nt * 10 <= 11 * m2}
        for v in removed:
            peel[v] = (t, nt, m2)
        active -= removed
    hist = {}
    for v, (pt, nt, m2) in peel.items():
        hist[pt] = (nt, m2)
    best_t = min(
        (t for t in hist if hist[t][1] / hist[t][0]
         == max(m2 / nt for nt, m2 in hist.values()))
    )
    want = {v: (pt, pt >= best_t) for v, (pt, _, _) in peel.items()}
    assert got == want
    densest = {v for v, (_, ind) in got.items() if ind}
    assert set(range(8)) <= densest  # the K8 core survives to the best prefix
    assert len(densest) < n // 2     # and the sparse periphery does not
