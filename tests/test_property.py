"""Property tests (SURVEY.md §5): randomized invariants via hypothesis.

- matrix <-> edge-list round-trip is lossless for arbitrary 0/1 matrices
  (including self-loops and isolated vertices);
- superstep BFS levels == single-source shortest unweighted path lengths,
  cross-checked against a pure-Python reference BFS on random digraphs;
- the distributed BFS and the applyInPandas kernel agree exactly.

One shared Spark session; graphs are kept small (n <= 8) so each example is
a sub-second job and hypothesis can run dozens of cases.
"""

from __future__ import annotations

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_database_simulation_spark.operators.graph_traversal import (
    bfs_levels,
    bfs_levels_small,
)
from distributed_graph_database_simulation_spark.sources import (
    edges_to_matrix,
    matrix_to_edges,
)

matrices = st.integers(min_value=1, max_value=8).flatmap(
    lambda n: st.lists(
        st.lists(st.integers(0, 1), min_size=n, max_size=n),
        min_size=n,
        max_size=n,
    )
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_bfs_levels(matrix: list[list[int]], start: int) -> dict[int, int]:
    n = len(matrix)
    level = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in range(n):
            if matrix[u][v] == 1 and v not in level:
                level[v] = level[u] + 1
                q.append(v)
    return level


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(matrix=matrices)
@_SETTINGS
def test_matrix_edge_roundtrip(sess, matrix):
    n = len(matrix)
    _, edges = matrix_to_edges(sess, 1, matrix)
    assert edges_to_matrix(edges, n) == matrix


@given(matrix=matrices)
@_SETTINGS
def test_bfs_levels_match_reference_bfs(sess, matrix):
    _, edges = matrix_to_edges(sess, 1, matrix)
    got = {
        r.vertex: r.level
        for r in bfs_levels(sess, edges, [(1, 0)]).collect()
    }
    assert got == _py_bfs_levels(matrix, 0)


@given(matrix=matrices)
@_SETTINGS
def test_superstep_and_kernel_bfs_agree(sess, matrix):
    _, edges = matrix_to_edges(sess, 1, matrix)
    big = {
        (r.vertex, r.level)
        for r in bfs_levels(sess, edges, [(1, 0)]).collect()
    }
    small = {
        (r.vertex, r.level)
        for r in bfs_levels_small(sess, edges, [(1, 0)]).collect()
    }
    assert big == small


def _py_components(matrix: list[list[int]]) -> dict[int, int]:
    """Union-find over the undirected closure — an independent algorithm
    (not label propagation) giving vertex -> min id of its component."""
    n = len(matrix)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(n):
            if matrix[i][j] == 1:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n)}


@given(matrix=matrices)
@_SETTINGS
def test_connected_components_match_union_find(sess, matrix):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components,
    )

    n = len(matrix)
    graphs, edges = matrix_to_edges(sess, 1, matrix)
    got = {
        r.vertex: r.component
        for r in connected_components(sess, graphs, edges).collect()
    }
    assert got == _py_components(matrix)


def _py_pagerank(matrix: list[list[int]], iterations: int, damping: float = 0.85) -> dict[int, float]:
    """Independent dense power iteration with dangling redistribution."""
    n = len(matrix)
    rank = [1.0 / n] * n
    for _ in range(iterations):
        received = [0.0] * n
        dangling = 0.0
        for u in range(n):
            out = [v for v in range(n) if matrix[u][v] == 1]
            if out:
                share = rank[u] / len(out)
                for v in out:
                    received[v] += share
            else:
                dangling += rank[u]
        rank = [
            (1.0 - damping) / n + damping * (received[v] + dangling / n)
            for v in range(n)
        ]
    return dict(enumerate(rank))


@given(matrix=matrices)
@_SETTINGS
def test_pagerank_matches_dense_power_iteration(sess, matrix):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        pagerank,
    )

    graphs, edges = matrix_to_edges(sess, 1, matrix)
    got = {
        r.vertex: r.rank for r in pagerank(sess, graphs, edges, iterations=4).collect()
    }
    want = _py_pagerank(matrix, iterations=4)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def _py_dijkstra(matrix: list[list[int]], start: int) -> dict[int, int]:
    """Independent Dijkstra (heap) on the same deterministic edge weights
    the SSSP query derives: w = (src*7 + dst) % 9 + 1."""
    import heapq

    n = len(matrix)
    dist = {start: 0}
    heap = [(0, start)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v in range(n):
            if matrix[u][v] == 1:
                nd = d + (u * 7 + v) % 9 + 1
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
    return dist


@given(matrix=matrices)
@_SETTINGS
def test_sssp_matches_dijkstra(sess, matrix):
    from pyspark.sql import functions as F
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        sssp,
    )

    _, edges = matrix_to_edges(sess, 1, matrix)
    weighted = edges.select(
        "src", "dst",
        ((F.col("src") * 7 + F.col("dst")) % 9 + 1).cast("bigint").alias("weight"),
    )
    got = {r.vertex: r.distance for r in sssp(sess, weighted, start=0).collect()}
    assert got == _py_dijkstra(matrix, 0)


def _py_label_propagation(matrix: list[list[int]], iterations: int) -> dict[int, int]:
    """Independent dense sync LPA: most-frequent neighbor label over the
    undirected closure, min tie-break, isolated vertices keep their own."""
    n = len(matrix)
    neigh = [set() for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if matrix[i][j] == 1:
                neigh[i].add(j)
                neigh[j].add(i)
    labels = list(range(n))
    for _ in range(iterations):
        nxt = []
        for v in range(n):
            if not neigh[v]:
                nxt.append(labels[v])
                continue
            counts: dict[int, int] = {}
            for u in neigh[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt.append(best[0])
        labels = nxt
    return dict(enumerate(labels))


@given(matrix=matrices)
@_SETTINGS
def test_label_propagation_matches_dense_lpa(sess, matrix):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        label_propagation,
    )

    graphs, edges = matrix_to_edges(sess, 1, matrix)
    got = {
        r.vertex: r.label
        for r in label_propagation(sess, graphs, edges, iterations=3).collect()
    }
    assert got == _py_label_propagation(matrix, iterations=3)


def _py_kcore(matrix: list[list[int]], k: int) -> set[int]:
    """Independent k-core peeling on the undirected closure (self-loops
    count once, matching `undirected()`'s distinct edge set)."""
    n = len(matrix)
    und = {(i, j) for i in range(n) for j in range(n) if matrix[i][j] == 1}
    und |= {(j, i) for i, j in und}
    surv = set(range(n))
    while True:
        deg = {v: 0 for v in surv}
        for s, d in und:
            if s in surv and d in surv:
                deg[s] += 1
        new = {v for v in surv if deg[v] >= k}
        if new == surv:
            return surv
        surv = new


@given(matrix=matrices, k=st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_kcore_matches_python_peeling(sess, matrix, k):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        kcore,
    )

    graphs, edges = matrix_to_edges(sess, 1, matrix)
    got = {r.vertex for r in kcore(sess, graphs, edges, k=k).collect()}
    assert got == _py_kcore(matrix, k)


@given(matrix=matrices)
@_SETTINGS
def test_pagerank_kernel_matches_superstep(sess, matrix):
    """The whole-graph numpy kernel and the superstep loop implement the
    same per-iteration update; on random digraphs they must agree far
    below the oracle's micro resolution."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        pagerank,
    )
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        pagerank_kernel,
    )

    graphs, edges = matrix_to_edges(sess, 1, matrix)
    loop = {
        r.vertex: r.rank
        for r in pagerank(sess, graphs, edges, iterations=4).collect()
    }
    kern = {
        r.vertex: r.rank
        for r in pagerank_kernel(graphs, edges, iterations=4).collect()
    }
    assert loop.keys() == kern.keys()
    for v in loop:
        assert abs(loop[v] - kern[v]) < 1e-9, (v, loop[v], kern[v])


@given(matrix=matrices)
@_SETTINGS
def test_connected_components_kernel_matches_superstep(sess, matrix):
    """Union-find kernel vs min-label superstep fixed point: exact integer
    equality (component = min vertex id in both)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components,
    )
    from distributed_graph_database_simulation_spark.operators.graph_kernels import (
        connected_components_kernel,
    )

    graphs, edges = matrix_to_edges(sess, 1, matrix)
    loop = {
        (r.vertex, r.component)
        for r in connected_components(sess, graphs, edges).collect()
    }
    kern = {
        (r.vertex, r.component)
        for r in connected_components_kernel(graphs, edges).collect()
    }
    assert loop == kern


# Token lists, rendered to text with single spaces — matches the operator's
# whitespace normalization, so the Python reference below is exact.
_token_docs = st.lists(
    st.lists(
        st.text(alphabet="abcxyz09", min_size=1, max_size=4),
        min_size=1,
        max_size=200,
    ),
    min_size=1,
    max_size=6,
)


@given(docs=_token_docs)
@_SETTINGS
def test_chunk_windows_matches_python(sess, docs):
    """Chunking == an independent Python sliding-window implementation for
    arbitrary token sequences (1..200 tokens spans the 1-chunk, boundary,
    and multi-chunk regimes for CHUNK=64/STRIDE=48)."""
    import hashlib

    from distributed_graph_database_simulation_spark.operators import pipeline

    df = sess.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_md5, r.n_tokens)
        for r in pipeline.chunk_windows_df(df).collect()
    }
    expected = {}
    for i, toks in enumerate(docs):
        starts = [0]
        while starts[-1] + pipeline.CHUNK < len(toks):
            starts.append(starts[-1] + pipeline.STRIDE)
        for cid, s in enumerate(starts):
            window = toks[s : s + pipeline.CHUNK]
            expected[(i, cid)] = (
                hashlib.md5(" ".join(window).encode()).hexdigest(),
                len(window),
            )
    assert got == expected


# --- media codec round-trip properties (pure Python, no Spark) ------------

@given(data=st.binary(max_size=512), rate=st.integers(min_value=1, max_value=192_000))
def test_wav_roundtrip_property(data, rate):
    from distributed_graph_database_simulation_spark.operators import multimodal

    meta, samples = multimodal.parse_wav(multimodal.encode_wav_pcm8(data, rate))
    assert meta["sample_rate"] == rate
    assert meta["n_samples"] == len(data)
    assert bytes(samples) == data


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, data):
    from distributed_graph_database_simulation_spark.operators import multimodal

    pixels = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    meta, decoded = multimodal.parse_bmp(multimodal.encode_bmp_rgb24(pixels, w, h))
    assert meta == {"width": w, "height": h, "bits_per_pixel": 24}
    assert decoded == pixels


@given(matrix=matrices)
@_SETTINGS
def test_derived_degree_cap_matches_python_percentile(sess, matrix):
    """The histogram-based exact-p90 cap (graph_queries._derived_degree_cap)
    equals the rank-selection reference: sort undirected degrees ascending,
    r* = floor(9n/10), cap = degs[r*-1] (min degree when r* == 0)."""
    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        _derived_degree_cap,
    )

    n = len(matrix)
    pairs = {
        (u, v)
        for u in range(n)
        for v in range(n)
        if matrix[u][v] == 1 and u != v
    }
    ue_pairs = sorted(pairs | {(v, u) for u, v in pairs})
    if not ue_pairs:
        return  # empty graphs have no degree distribution to cap
    ue = sess.createDataFrame(ue_pairs, "src INT, dst INT")
    degs = sorted(
        len([1 for s, d in ue_pairs if d == x])
        for x in {d for _, d in ue_pairs}
    )
    r_star = (9 * len(degs)) // 10
    expected = degs[r_star - 1] if r_star >= 1 else degs[0]
    assert _derived_degree_cap(ue) == expected


# --- layout-operator properties -------------------------------------------

chunk_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),   # doc_id
        st.integers(min_value=0, max_value=3),    # chunk_id
        st.integers(min_value=1, max_value=300),  # n_tokens
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),
)


@given(chunk_lists, st.integers(min_value=16, max_value=512))
@_SETTINGS
def test_pack_sequences_properties(spark, rows, seq_len):
    """For arbitrary chunk sets and sequence lengths: row preservation,
    offsets in range, per-shard token-mass accounting, and exact agreement
    with the independent Python packer."""
    from distributed_graph_database_simulation_spark.operators import pipeline
    from tests.test_pipeline_ops import _py_pack_sequences

    chunks = spark.createDataFrame(rows, "doc_id long, chunk_id int, n_tokens int")
    got = {
        (r.doc_id, r.chunk_id): (r.shard, r.seq_id, r.seq_offset, r.n_tokens)
        for r in pipeline.pack_sequences_df(chunks, seq_len=seq_len).collect()
    }
    assert got == _py_pack_sequences(rows, seq_len)
    assert all(0 <= off < seq_len for _, _, off, _ in got.values())


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
@_SETTINGS
def test_cap_per_source_properties(spark, rows, cap):
    """For arbitrary doc/source sets and caps: per-source counts bounded,
    admitted set matches the deterministic hash-order reference."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    docs = spark.createDataFrame(rows, "doc_id long, source string")
    by_source: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source in rows:
        scr = (doc_id * 2654435761) % 1_000_003
        by_source.setdefault(source, []).append((scr, doc_id))
    expected = {
        doc_id
        for lst in by_source.values()
        for rank, (_, doc_id) in enumerate(sorted(lst))
        if rank < cap
    }
    got = {r.doc_id for r in pipeline.cap_per_source_df(docs, cap).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# r10 oracle lemmas — pure-function properties the de-quadratized DuckDB
# oracles rely on. No Spark session: these certify the MATH (losslessness
# of the prefix filters, Morton key structure, temperature budget bounds),
# independent of either engine, over hypothesis-random inputs far weirder
# than the shipped corpora.
# ---------------------------------------------------------------------------

_doc_sets = st.lists(
    st.sets(st.integers(0, 30), min_size=1, max_size=12),
    min_size=2,
    max_size=10,
)

_FAST = settings(max_examples=100, deadline=None)


def _jaccard(a, b):
    return len(a & b) / len(a | b)


@given(docs=_doc_sets)
@_FAST
def test_jaccard_prefix_filter_is_lossless(docs):
    """The AllPairs lemma behind _NGRAM_ORACLE_CORE / DEDUP_CLUSTERS_SQL:
    joining only each set's first (n - ceil(t*n) + 1) sorted elements must
    produce a candidate superset of every pair with J >= t."""
    import math

    t = 0.5
    prefixes = [sorted(s)[: len(s) - math.ceil(t * len(s)) + 1] for s in docs]
    cand = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            # size filter + prefix intersection, as in the SQL
            if (
                len(docs[j]) >= t * len(docs[i])
                and len(docs[i]) >= t * len(docs[j])
                and set(prefixes[i]) & set(prefixes[j])
            ):
                cand.add((i, j))
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if _jaccard(docs[i], docs[j]) >= t:
                assert (i, j) in cand, (docs[i], docs[j])


@given(docs=_doc_sets)
@_FAST
def test_containment_prefix_filter_is_lossless(docs):
    """The DEDUP_CONTAINMENT_SQL lemma: for max-containment >= t the
    SMALLER set's prefix (its own size bound) joined against the larger
    set's FULL contents finds every qualifying pair."""
    import math

    t = 0.8
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            n_common = len(a & b)
            if n_common < t * min(len(a), len(b)):
                continue  # not a qualifying pair
            small = a if (len(a), i) <= (len(b), j) else b
            large = b if small is a else a
            prefix = set(
                sorted(small)[: len(small) - math.ceil(t * len(small)) + 1]
            )
            assert prefix & large, (sorted(a), sorted(b))


@given(
    a=st.integers(0, (1 << 16) - 1),
    b=st.integers(0, (1 << 16) - 1),
    a2=st.integers(0, (1 << 16) - 1),
    b2=st.integers(0, (1 << 16) - 1),
)
@_FAST
def test_morton_key_is_bijective_and_axis_monotone(a, b, a2, b2):
    """The PIPE_ZORDER_LAYOUT_SQL bit algebra: the 2-column interleave is
    injective over rank pairs, and monotone along each axis with the other
    held fixed (the property that makes min/max file envelopes narrow)."""

    def z(x, y, bits=16):
        v = 0
        for i in range(bits):
            v |= ((x >> i) & 1) << (2 * i)
            v |= ((y >> i) & 1) << (2 * i + 1)
        return v

    if (a, b) != (a2, b2):
        assert z(a, b) != z(a2, b2)
    if a < a2:
        assert z(a, b) < z(a2, b)
    if b < b2:
        assert z(a, b) < z(a, b2)


@given(
    sizes=st.lists(st.integers(1, 100_000), min_size=1, max_size=8),
    keep_ppm=st.integers(1, 1_000_000),
)
@_FAST
def test_temperature_thresholds_respect_budget_and_bounds(sizes, keep_ppm):
    """pipe_temperature_mix's integer thresholds: every t_g lands in
    [0, 1e6], and the EXPECTED admitted volume sum(n_g * t_g / 1e6) never
    exceeds the budget keep_ppm/1e6 * N (floor-div rounds down, min-cap
    only reduces)."""
    import math

    N = sum(sizes)
    s = [math.isqrt(n) for n in sizes]
    S = sum(s)
    expected = 0.0
    for n_g, s_g in zip(sizes, s):
        t = min(1_000_000, (keep_ppm * N * s_g) // (S * n_g))
        assert 0 <= t <= 1_000_000
        expected += n_g * t / 1_000_000
    assert expected <= keep_ppm / 1_000_000 * N + 1e-9
