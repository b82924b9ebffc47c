"""Graph-to-ML operators: deterministic random walks, sentence layout,
neighborhood feature aggregation (operators/graph_ml.py).

Registry is frozen, so these are test-pinned: exact equality against
independent Python references that re-implement the documented contracts
(md5 hash-mod neighbor choice, iterated mean aggregation) from scratch.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from distributed_graph_database_simulation_spark.operators.graph_ml import (
    aggregate_neighbor_features,
    random_walks,
    walks_as_sentences,
)


def _py_walks(g, n, edge_rows, walks_per_vertex, walk_length, seed):
    """Independent reference: same documented hash rule, plain Python."""
    nbrs = {}
    for s, d in edge_rows:
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s] = sorted(nbrs[s])
    rows = set()
    for start in range(n):
        for k in range(walks_per_vertex):
            v = start
            rows.add((g, start, k, 0, start))
            for step in range(1, walk_length + 1):
                out = nbrs.get(v)
                if not out:
                    break
                h = int(
                    hashlib.md5(
                        f"{g}|{start}|{k}|{step}|{seed}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                v = out[h % len(out)]
                rows.add((g, start, k, step, v))
    return rows


def test_random_walks_match_python_reference(spark):
    """Walk set must equal the independent Python implementation exactly."""
    rng = random.Random(23)
    n = 25
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.12
    ]
    edges = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {
        (r.graph_id, r.start, r.walk_no, r.step, r.vertex)
        for r in random_walks(
            spark, graphs, edges, walks_per_vertex=2, walk_length=6, seed=5
        ).collect()
    }
    want = _py_walks(11, n, edge_rows, 2, 6, 5)
    assert got == want
    # walks actually moved somewhere
    assert any(step > 0 for (_, _, _, step, _) in got)


def test_random_walks_are_valid_paths_and_deterministic(spark, sf_dir):
    """Every consecutive (step, step+1) pair must be a real edge; two runs
    must be identical."""
    from distributed_graph_database_simulation_spark.fixtures import (
        SCALE_V,
        scale_edges_df,
    )

    edges = scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    graphs = spark.createDataFrame([(1, SCALE_V)], "graph_id INT, n INT")
    w1 = random_walks(spark, graphs, edges, walk_length=4, seed=9).collect()
    w2 = random_walks(spark, graphs, edges, walk_length=4, seed=9).collect()
    s1 = {(r.start, r.walk_no, r.step, r.vertex) for r in w1}
    assert s1 == {(r.start, r.walk_no, r.step, r.vertex) for r in w2}
    edge_set = {(r.src, r.dst) for r in edges.collect()}
    pos = {(r.start, r.walk_no, r.step): r.vertex for r in w1}
    hops = 0
    for (start, k, step), v in pos.items():
        nxt = pos.get((start, k, step + 1))
        if nxt is not None:
            assert (v, nxt) in edge_set
            hops += 1
    assert hops > 0


def test_random_walks_stop_at_sinks(spark):
    """Directed path graph: a walk from the sink is just its start row,
    and no walk exceeds the remaining path length."""
    n = 5
    edges = spark.createDataFrame(
        [(1, v, v + 1) for v in range(n - 1)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    rows = random_walks(spark, graphs, edges, walk_length=10).collect()
    by_start = {}
    for r in rows:
        by_start.setdefault(r.start, []).append((r.step, r.vertex))
    assert sorted(by_start[n - 1]) == [(0, n - 1)]
    # the only walk from v is v, v+1, ..., n-1 (single out-neighbor chain)
    for start, steps in by_start.items():
        assert sorted(steps) == [(i, start + i) for i in range(n - start)]


def test_walks_as_sentences_orders_by_step(spark):
    edges = spark.createDataFrame(
        [(1, v, v + 1) for v in range(4)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, 5)], "graph_id INT, n INT")
    walks = random_walks(spark, graphs, edges, walk_length=10)
    sent = {r.start: r.walk for r in walks_as_sentences(walks).collect()}
    assert sent[0] == [0, 1, 2, 3, 4]
    assert sent[3] == [3, 4]
    assert sent[4] == [4]


def _py_neighbor_agg(edge_rows, feats, hops):
    """Independent iterated-mean reference with the documented universe
    semantics: every feature vertex appears each hop; sinks carry None
    aggregates and n_neighbors=0; None-mean neighbors count toward
    n_neighbors but are skipped by mean/sum. feats: {v: {col: val}}."""
    cols = sorted(next(iter(feats.values())).keys())
    universe = set(feats)
    current = {v: dict(f) for v, f in feats.items()}
    for _ in range(hops):
        hop_result = {}
        for v in universe:
            vals = {c: [] for c in cols}
            cnt = 0
            for s, d in edge_rows:
                if s == v and d in universe:
                    cnt += 1
                    for c in cols:
                        if current[d][c] is not None:
                            vals[c].append(current[d][c])
            hop_result[v] = {
                "n_neighbors": cnt,
                **{
                    f"{c}_mean": (sum(vals[c]) / len(vals[c])) if vals[c] else None
                    for c in cols
                },
                **{f"{c}_sum": sum(vals[c]) if vals[c] else None for c in cols},
            }
        current = {v: {c: r[f"{c}_mean"] for c in cols} for v, r in hop_result.items()}
        last = hop_result
    return last


@pytest.mark.parametrize("hops", [1, 2])
def test_aggregate_neighbor_features_matches_reference(spark, hops):
    rng = random.Random(31)
    n = 20
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.15
    ]
    feats = {v: {"fa": float(v), "fb": float((v * 7) % 5)} for v in range(n)}
    edges = spark.createDataFrame(
        [(1, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    vf = spark.createDataFrame(
        [(1, v, f["fa"], f["fb"]) for v, f in feats.items()],
        "graph_id INT, vertex INT, fa DOUBLE, fb DOUBLE",
    )
    got = {
        r.vertex: r.asDict()
        for r in aggregate_neighbor_features(vf, edges, ["fa", "fb"], hops=hops).collect()
    }
    want = _py_neighbor_agg(edge_rows, feats, hops)
    assert set(got) == set(want)
    for v, w in want.items():
        g = got[v]
        assert g["n_neighbors"] == w["n_neighbors"]
        for c in ("fa_mean", "fa_sum", "fb_mean", "fb_sum"):
            if w[c] is None:
                assert g[c] is None
            else:
                assert g[c] == pytest.approx(w[c], rel=1e-12)


# ---------------------------------------------------------------------------
# Weisfeiler-Leman labels / graph fingerprints
# ---------------------------------------------------------------------------

def _py_wl(n, edge_rows, iterations):
    """Independent WL reference with the documented hash contract."""
    nbrs = {v: set() for v in range(n)}
    for s, d in edge_rows:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    labels = {v: str(len(nbrs[v])) for v in range(n)}
    for _ in range(iterations):
        new = {}
        for v in range(n):
            nls = sorted(labels[w] for w in nbrs[v])
            new[v] = hashlib.md5(
                (labels[v] + "|" + ",".join(nls)).encode()
            ).hexdigest()
        labels = new
    return labels


def _py_wl_fp(n, edge_rows, iterations=3):
    labels = _py_wl(n, edge_rows, iterations)
    return hashlib.md5(",".join(sorted(labels.values())).encode()).hexdigest()


def test_wl_labels_match_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        wl_labels,
    )

    rng = random.Random(101)
    n = 20
    edge_rows = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.15
    ]
    edges = spark.createDataFrame(
        [(11, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(11, n)], "graph_id INT, n INT")
    got = {r.vertex: r.label for r in wl_labels(spark, graphs, edges).collect()}
    assert got == _py_wl(n, edge_rows, 3)


def test_wl_fingerprint_isomorphism_invariant(spark):
    """A relabeled copy of a graph must fingerprint identically; a graph
    with a different degree sequence must differ — all in ONE multi-graph
    call (the many-graphs corpus shape)."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        wl_fingerprint,
    )

    rng = random.Random(103)
    n = 12
    base = [
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.3
    ]
    perm = list(range(n))
    rng.shuffle(perm)
    relabeled = [(min(perm[s], perm[d]), max(perm[s], perm[d])) for s, d in base]
    other = base[:-2]  # drop two edges -> different degree sequence
    rows = (
        [(1, s, d) for s, d in base]
        + [(2, s, d) for s, d in relabeled]
        + [(3, s, d) for s, d in other]
    )
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame(
        [(1, n), (2, n), (3, n)], "graph_id INT, n INT"
    )
    fps = {r.graph_id: r.fingerprint for r in wl_fingerprint(spark, graphs, edges).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert fps[1] == _py_wl_fp(n, base)


# ---------------------------------------------------------------------------
# Graph-corpus near-dup by edge-set Jaccard
# ---------------------------------------------------------------------------

def test_graph_edge_jaccard_matches_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        graph_edge_jaccard,
    )

    rng = random.Random(149)
    n = 15
    base = {
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.3
    }
    # graph 2 = near-dup of 1 (one edge flipped); graph 3 = unrelated
    g2 = set(base)
    g2.discard(next(iter(sorted(base))))
    g2.add((0, n - 1)) if (0, n - 1) not in base else None
    g3 = {
        (s, d) for s in range(n) for d in range(s + 1, n) if rng.random() < 0.3
    }
    rows = (
        [(1, s, d) for s, d in base]
        + [(2, s, d) for s, d in g2]
        + [(3, s, d) for s, d in g3]
    )
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    got = {
        (r.graph_a, r.graph_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in graph_edge_jaccard(edges, min_jaccard=0.0).collect()
    }
    corpora = {1: base, 2: g2, 3: g3}
    want = {}
    for ga in (1, 2, 3):
        for gb in range(ga + 1, 4):
            inter = len(corpora[ga] & corpora[gb])
            if inter == 0:
                continue
            ja = inter / (len(corpora[ga]) + len(corpora[gb]) - inter)
            want[(ga, gb)] = (inter, len(corpora[ga]), len(corpora[gb]), ja)
    assert set(got) == set(want)
    for k, (i, na, nb, ja) in want.items():
        gi, gna, gnb, gja = got[k]
        assert (gi, gna, gnb) == (i, na, nb)
        assert gja == pytest.approx(ja, rel=1e-12)
    # the planted near-dup pair dominates
    filtered = {
        (r.graph_a, r.graph_b)
        for r in graph_edge_jaccard(edges, min_jaccard=0.8).collect()
    }
    assert filtered == {(1, 2)}


def test_graph_edge_jaccard_stop_edge_cap(spark):
    """An edge shared by every graph is dropped by the cap, lowering the
    reported intersection but keeping the pair join bounded."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        graph_edge_jaccard,
    )

    rows = []
    for g in range(1, 5):
        rows.append((g, 0, 1))          # universal stop edge
        rows.append((g, g, g + 10))     # unique edge per graph
    rows += [(1, 2, 3), (2, 2, 3)]      # one genuinely shared edge
    edges = spark.createDataFrame(rows, "graph_id INT, src INT, dst INT")
    out = {
        (r.graph_a, r.graph_b): r.n_common
        for r in graph_edge_jaccard(edges, min_jaccard=0.0, max_edge_graphs=3).collect()
    }
    assert out == {(1, 2): 1}


def _py_node2vec(g, n, edge_rows, walks_per_vertex, walk_length, seed):
    """Independent node2vec reference: simple-graph dedup, uniform first
    step, then half-unit return/common/explore weights with the same
    interval-pick rule, re-implemented from the documented contract."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        NODE2VEC_COMMON_W,
        NODE2VEC_EXPLORE_W,
        NODE2VEC_RETURN_W,
    )

    simple = sorted(set(edge_rows))
    nbrs = {}
    for s, d in simple:
        nbrs.setdefault(s, []).append(d)
    adj = set(simple)

    def choice_hash(start, k, step):
        return int(
            hashlib.md5(f"{g}|{start}|{k}|{step}|{seed}".encode()).hexdigest()[:15],
            16,
        )

    rows = set()
    for start in range(n):
        for k in range(walks_per_vertex):
            prev, v = None, start
            rows.add((g, start, k, 0, start))
            for step in range(1, walk_length + 1):
                out = nbrs.get(v)
                if not out:
                    break
                h = choice_hash(start, k, step)
                if prev is None:
                    nxt = out[h % len(out)]
                else:
                    cands = []
                    for d in out:
                        if d == prev:
                            w = NODE2VEC_RETURN_W
                        elif (prev, d) in adj:
                            w = NODE2VEC_COMMON_W
                        else:
                            w = NODE2VEC_EXPLORE_W
                        cands.append((d, w))
                    total = sum(w for _, w in cands)
                    r, lo, nxt = h % total, 0, None
                    for d, w in cands:
                        if lo <= r < lo + w:
                            nxt = d
                            break
                        lo += w
                prev, v = v, nxt
                rows.add((g, start, k, step, v))
    return rows


def test_node2vec_walks_match_python_reference(spark):
    """Biased walk set must equal the independent reference exactly —
    including on a multigraph input (the kernel dedups to the simple
    graph before weighting)."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        node2vec_walks,
    )

    rng = random.Random(31)
    n = 20
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.18
    ]
    edge_rows += edge_rows[:7]  # duplicate a few edges: multigraph input
    edges = spark.createDataFrame(
        [(13, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(13, n)], "graph_id INT, n INT")
    got = {
        (r.graph_id, r.start, r.walk_no, r.step, r.vertex)
        for r in node2vec_walks(
            spark, graphs, edges, walks_per_vertex=2, walk_length=5, seed=7
        ).collect()
    }
    want = _py_node2vec(13, n, edge_rows, 2, 5, 7)
    assert got == want
    assert any(step > 1 for (_, _, _, step, _) in got)


def test_node2vec_bias_prefers_exploration(spark):
    """Star-plus-path control: from the center of 0<->1, 1->{0,2}, with
    q=0.5 the walk at vertex 1 (prev=0) weighs returning to 0 at 1 unit
    vs exploring to 2 at 4 units — intervals [0,1) and [1,5). Hash values
    landing in [1,5) must step to 2; the transition table must say so."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        node2vec_transitions,
    )

    edges = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 0), (1, 1, 2)], "graph_id INT, src INT, dst INT"
    )
    t = {
        (r.prev, r.cur, r.nxt): (r.w, r.lo, r.total)
        for r in node2vec_transitions(edges).collect()
    }
    assert t[(0, 1, 0)] == (1, 0, 5)   # return: weight 1, first interval
    assert t[(0, 1, 2)] == (4, 1, 5)   # explore: weight 4
    assert t[(1, 0, 1)] == (1, 0, 1)   # only candidate is the return


def _py_simrank(n, edge_rows, iterations, in_cap):
    """Independent SimRank reference: same documented integer contract
    (micro-units, C=4/5, half-up rounding, ascending-id in-neighbor cap),
    dense matrix, plain Python."""
    ine = {}
    for s, d in sorted(set(edge_rows)):
        ine.setdefault(d, []).append(s)
    ine = {v: sorted(nbrs)[:in_cap] for v, nbrs in ine.items()}
    s = [[1_000_000 if a == b else 0 for b in range(n)] for a in range(n)]
    for _ in range(iterations):
        nxt = [[1_000_000 if a == b else 0 for b in range(n)] for a in range(n)]
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                ia, ib = ine.get(a, []), ine.get(b, [])
                if not ia or not ib:
                    continue
                ssum = sum(s[i][j] for i in ia for j in ib)
                den = 5 * len(ia) * len(ib)
                nxt[a][b] = (8 * ssum + den) // (2 * den)
        s = nxt
    return {
        (a, b): s[a][b]
        for a in range(n)
        for b in range(n)
        if a < b and s[a][b] > 0
    }


def test_simrank_matches_python_reference(spark):
    """SimRank scores must equal the independent integer reference exactly
    — on a multigraph input with in-degrees straddling the cap."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import simrank

    rng = random.Random(47)
    n = 15
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.3
    ]
    edge_rows += edge_rows[:5]  # duplicates: the kernel dedups first
    edges = spark.createDataFrame(
        [(9, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(9, n)], "graph_id INT, n INT")
    got = {
        (r.a, r.b): r.sim_micro
        for r in simrank(spark, graphs, edges, iterations=3, in_cap=3).collect()
    }
    want = _py_simrank(n, edge_rows, iterations=3, in_cap=3)
    assert got == want
    assert len(got) > 0


def test_simrank_known_values(spark):
    """Hand-checked control: two vertices sharing their single in-neighbor
    (0->1, 0->2) reach s(1,2) = C = 0.8 after one iteration and stay
    there; vertices with disjoint in-neighborhoods score by the recursive
    C*s(parents) rule."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import simrank

    edges = spark.createDataFrame(
        [(1, 0, 1), (1, 0, 2), (1, 1, 3), (1, 2, 4)],
        "graph_id INT, src INT, dst INT",
    )
    graphs = spark.createDataFrame([(1, 5)], "graph_id INT, n INT")
    got = {
        (r.a, r.b): r.sim_micro for r in simrank(spark, graphs, edges).collect()
    }
    # s(1,2): common single parent 0 -> 0.8 exactly
    assert got[(1, 2)] == 800_000
    # s(3,4): parents {1},{2}; s(1,2)=0.8 from iter 1 -> 0.8*0.8 = 0.64
    assert got[(3, 4)] == 640_000


def _py_hits(n, edge_rows, iterations):
    """Independent HITS reference: same integer contract (micro-units,
    per-graph max normalization, half-up division, hub consumes the fresh
    authority), plain Python."""
    simple = sorted(set(edge_rows))
    hub = {v: 1_000_000 for v in range(n)}

    def _norm(raw):
        mx = max(raw.values()) if raw else 0
        if mx <= 0:
            return {v: 0 for v in range(n)}
        return {v: (2_000_000 * raw.get(v, 0) + mx) // (2 * mx) for v in range(n)}

    auth = dict(hub)
    for _ in range(iterations):
        araw = {}
        for s, d in simple:
            araw[d] = araw.get(d, 0) + hub[s]
        auth = _norm(araw)
        hraw = {}
        for s, d in simple:
            hraw[s] = hraw.get(s, 0) + auth[d]
        hub = _norm(hraw)
    return {v: (hub[v], auth[v]) for v in range(n)}


def test_hits_matches_python_reference(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import hits

    rng = random.Random(53)
    n = 18
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.2
    ]
    edge_rows += edge_rows[:4]  # multigraph input: kernel dedups
    edges = spark.createDataFrame(
        [(3, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(3, n)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.hub_micro, r.auth_micro)
        for r in hits(spark, graphs, edges).collect()
    }
    assert got == _py_hits(n, edge_rows, 3)


def test_hits_star_center_is_the_authority(spark):
    """All spokes point at 0: vertex 0 is the unique max authority with
    zero hub score; every spoke is a max hub with zero authority."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import hits

    n = 6
    edges = spark.createDataFrame(
        [(1, v, 0) for v in range(1, n)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    got = {
        r.vertex: (r.hub_micro, r.auth_micro)
        for r in hits(spark, graphs, edges).collect()
    }
    assert got[0] == (0, 1_000_000)
    for v in range(1, n):
        assert got[v] == (1_000_000, 0)


def _py_articulation(n, edge_rows):
    """Independent brute-force reference: v is an articulation point iff
    removing it increases the weak component count (BFS, no Tarjan)."""
    und = {(min(s, d), max(s, d)) for s, d in edge_rows if s != d}

    def ncomp(rm):
        verts = [v for v in range(n) if v != rm]
        adj = {v: [] for v in verts}
        for a, b in und:
            if a != rm and b != rm:
                adj[a].append(b)
                adj[b].append(a)
        seen, comps = set(), 0
        for v in verts:
            if v in seen:
                continue
            comps += 1
            q = [v]
            seen.add(v)
            while q:
                u = q.pop()
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
        return comps

    base = ncomp(-1)
    return {v: (1 if ncomp(v) > base else 0) for v in range(n)}


def test_articulation_points_match_bruteforce(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        articulation_points,
    )

    rng = random.Random(61)
    n = 20
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.08
    ]
    edge_rows += [(5, 5), (0, 1), (0, 1)]  # self-loop + duplicates
    edges = spark.createDataFrame(
        [(7, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(7, n)], "graph_id INT, n INT")
    got = {
        r.vertex: r.is_articulation
        for r in articulation_points(spark, graphs, edges).collect()
    }
    assert got == _py_articulation(n, edge_rows)


def test_articulation_path_and_cycle(spark):
    """Controls: every interior vertex of a path is an articulation point;
    no vertex of a cycle is."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        articulation_points,
    )

    n = 6
    path = [(1, v, v + 1) for v in range(n - 1)]
    cycle = [(2, v, (v + 1) % n) for v in range(n)]
    edges = spark.createDataFrame(path + cycle, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(1, n), (2, n)], "graph_id INT, n INT")
    got = {
        (r.graph_id, r.vertex): r.is_articulation
        for r in articulation_points(spark, graphs, edges).collect()
    }
    for v in range(n):
        assert got[(1, v)] == (1 if 0 < v < n - 1 else 0)
        assert got[(2, v)] == 0


def test_bridges_match_bruteforce(spark):
    """Bridge flags must equal the brute-force edge-removal reference."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import bridges

    rng = random.Random(71)
    n = 16
    edge_rows = [
        (s, d)
        for s in range(n)
        for d in range(n)
        if s != d and rng.random() < 0.09
    ]
    edge_rows += [(3, 3), (0, 1), (1, 0)]  # self-loop + both directions
    und = {(min(s, d), max(s, d)) for s, d in edge_rows if s != d}

    def ncomp(skip):
        verts = sorted({v for p in und for v in p})
        adj = {v: [] for v in verts}
        for a, b in und:
            if (a, b) == skip:
                continue
            adj[a].append(b)
            adj[b].append(a)
        seen, comps = set(), 0
        for v in verts:
            if v in seen:
                continue
            comps += 1
            q = [v]
            seen.add(v)
            while q:
                u = q.pop()
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
        return comps

    base = ncomp(None)
    want = {(a, b): (1 if ncomp((a, b)) > base else 0) for a, b in und}
    edges = spark.createDataFrame(
        [(5, s, d) for s, d in edge_rows], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(5, n)], "graph_id INT, n INT")
    got = {
        (r.a, r.b): r.is_bridge
        for r in bridges(spark, graphs, edges).collect()
    }
    assert got == want
    # every path edge is a bridge; no cycle edge is
    assert any(v == 1 for v in got.values()) or all(v == 0 for v in got.values())


def test_bridges_path_and_cycle(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import bridges

    n = 5
    path = [(1, v, v + 1) for v in range(n - 1)]
    cycle = [(2, v, (v + 1) % n) for v in range(n)]
    edges = spark.createDataFrame(path + cycle, "graph_id INT, src INT, dst INT")
    graphs = spark.createDataFrame([(1, n), (2, n)], "graph_id INT, n INT")
    got = {
        (r.graph_id, r.a, r.b): r.is_bridge
        for r in bridges(spark, graphs, edges).collect()
    }
    for v in range(n - 1):
        assert got[(1, v, v + 1)] == 1          # every path edge
    for v in range(n):
        assert got[(2, min(v, (v + 1) % n), max(v, (v + 1) % n))] == 0
