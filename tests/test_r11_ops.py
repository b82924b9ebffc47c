"""Unit pins for the r11-new operators: bipartite projection (hub
truncation + weight semantics), cosine range search (threshold semantics vs
a brute-force reference), and GROUPING SETS (grain coverage)."""

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.operators.graph_analytics import (
    bipartite_project,
)


@pytest.fixture(scope="module")
def incidence(spark):
    # users u0..u3 x items: u0 hub touching 6 items, others touch 2-3.
    rows = [
        ("u0", f"i{k}") for k in range(6)
    ] + [
        ("u1", "i0"), ("u1", "i1"),
        ("u2", "i0"), ("u2", "i1"), ("u2", "i2"),
        ("u3", "i4"), ("u3", "i5"),
        ("u3", "i4"),  # duplicate edge: projection must distinct() it away
    ]
    return spark.createDataFrame(rows, "user string, item string")


def test_bipartite_weights_exact(spark, incidence):
    out = bipartite_project(incidence, "user", "item", degree_cap=10)
    w = {(r.item_a, r.item_b): r.weight for r in out.collect()}
    # i0-i1 co-occurs under u0, u1, u2 -> weight 3
    assert w[("i0", "i1")] == 3
    # i4-i5 under u0 and u3 (duplicate edge counted once) -> weight 2
    assert w[("i4", "i5")] == 2
    # pairs are canonical a < b, no self-pairs
    assert all(a < b for a, b in w)


def test_bipartite_degree_cap_truncates_hub(spark, incidence):
    # cap=2 keeps each user's 2 lexicographically-smallest items:
    # u0 -> {i0,i1}, u2 -> {i0,i1}, u3 -> {i4,i5}
    out = bipartite_project(incidence, "user", "item", degree_cap=2)
    w = {(r.item_a, r.item_b): r.weight for r in out.collect()}
    assert w == {("i0", "i1"): 3, ("i4", "i5"): 1}
    # deterministic: same result on re-run (rank is orderBy item, no ties)
    again = {
        (r.item_a, r.item_b): r.weight
        for r in bipartite_project(incidence, "user", "item", degree_cap=2).collect()
    }
    assert again == w


def test_bipartite_min_weight(spark, incidence):
    out = bipartite_project(incidence, "user", "item", degree_cap=10, min_weight=3)
    assert {(r.item_a, r.item_b) for r in out.collect()} == {("i0", "i1")}


def test_range_search_matches_bruteforce(spark, sf_dir):
    """Every returned pair clears tau; no pair under tau is returned —
    cross-checked against an independent brute-force cosine on the same
    quantized grid."""
    from distributed_graph_database_simulation_spark.operators.similarity import (
        RANGE_SEARCH_TAU,
        _emb,
        range_search_df,
    )

    vecs = _emb(spark, sf_dir)
    out = range_search_df(vecs, query_filter=F.col("vec_id") < 4)
    rows = out.collect()
    assert rows and all(r.cosine >= RANGE_SEARCH_TAU for r in rows)
    assert all(r.query_id < 4 and r.neighbor_id != r.query_id for r in rows)
    # brute-force reference for query 0 via the exact integer kernel,
    # replaying the shared micro-quantization (HALF_UP like Spark's round,
    # not Python's banker rounding)
    import math

    from distributed_graph_database_simulation_spark.operators.similarity import (
        KMEANS_SCALE,
        KMEANS_SHIFT,
    )

    def quant(x):
        v = (x + KMEANS_SHIFT) * KMEANS_SCALE
        r = math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)
        return int(r) - int(KMEANS_SHIFT * KMEANS_SCALE)

    data = {r.vec_id: r.e for r in vecs.where("vec_id < 200").collect()}
    q = [quant(x) for x in data[0]]
    expect = set()
    for vid, emb in data.items():
        if vid == 0:
            continue
        c = [quant(x) for x in emb]
        dot = sum(a * b for a, b in zip(q, c))
        den = math.sqrt(sum(a * a for a in q)) * math.sqrt(sum(a * a for a in c))
        if den and dot / den >= RANGE_SEARCH_TAU:
            expect.add(vid)
    got = {r.neighbor_id for r in rows if r.query_id == 0 and r.neighbor_id < 200}
    assert got == expect


def test_grouping_sets_grains(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators.relational import (
        grouping_sets_shipping,
    )

    rows = grouping_sets_shipping(spark, sf_dir).collect()
    grains = {(r.g_flag, r.g_status) for r in rows}
    # exactly the three requested grains: (flag,status), (status), ()
    assert grains == {(0, 0), (1, 0), (1, 1)}
    # the grand total row aggregates everything
    total = [r for r in rows if r.g_flag == 1 and r.g_status == 1]
    assert len(total) == 1
    assert total[0].n_rows == sum(r.n_rows for r in rows if r.g_flag == 0)


def test_ivf_append_preserves_existing_lists(spark, sf_dir):
    """append_ivf_index must only ADD rows for the new batch: every even
    (built) vector's row survives byte-identically, every odd (appended)
    vector appears exactly once, and the combined index holds the full
    corpus with no duplicates."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.similarity import (
        _emb,
        append_ivf_index,
        build_ivf_index,
    )

    corpus = _emb(spark, sf_dir)
    n = corpus.count()
    base = tempfile.mkdtemp(prefix="dgds_ivf_append_test_")
    try:
        build_ivf_index(spark, corpus.filter(F.col("vec_id") % 2 == 0), base)
        before = {
            r.vec_id: r.cent_id
            for r in spark.read.parquet(f"{base}/lists").select("vec_id", "cent_id").collect()
        }
        append_ivf_index(spark, corpus.filter(F.col("vec_id") % 2 == 1), base)
        after_rows = spark.read.parquet(f"{base}/lists").select("vec_id", "cent_id").collect()
        after = {r.vec_id: r.cent_id for r in after_rows}
        assert len(after_rows) == n == len(after)  # full corpus, no dups
        for vid, cid in before.items():
            assert after[vid] == cid  # existing assignments untouched
        assert all(vid % 2 == 1 for vid in set(after) - set(before))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_end_to_end_composition_invariants(spark, sf_dir):
    """Every admitted doc survived dedup and cleared its language's
    quality threshold — the two upstream gates, checked against the
    standalone stage operators."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.dedup import (
        _docs,
        dedup_clusters_df,
    )
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        pipe_end_to_end,
    )

    out = pipe_end_to_end(spark, sf_dir)
    losers = {
        r.doc_id
        for r in dedup_clusters_df(spark, _docs(spark, sf_dir))
        .where(~F.col("is_survivor"))
        .collect()
    }
    rows = out.collect()
    assert rows
    assert not losers.intersection({r.doc_id for r in rows})
    # quality evidence present and budget ppm within [0, 1e6]
    assert all(0 <= r.keep_ppm <= 1_000_000 and r.quality_micro > 0 for r in rows)


def test_compaction_reduces_files_and_sorts(spark, sf_dir):
    """Compaction is a layout-only rewrite: 64 fragments -> ceil(n/target)
    range-sorted files, content identical, and each output file's doc_id
    range is disjoint (the min-max pruning property the sort_col exists
    for)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        COMPACT_TARGET_ROWS,
        _docs,
        compact_parquet,
    )

    base = tempfile.mkdtemp(prefix="dgds_compact_test_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "lang")
        n = docs.count()
        docs.repartition(64).write.mode("overwrite").parquet(f"{base}/frag")
        n_frag = sum(
            1 for f in os.listdir(f"{base}/frag") if f.endswith(".parquet")
        )
        n_out = compact_parquet(
            spark, f"{base}/frag", f"{base}/out", COMPACT_TARGET_ROWS, "doc_id"
        )
        assert n_frag == 64 and n_out == max(1, -(-n // COMPACT_TARGET_ROWS))
        got = spark.read.parquet(f"{base}/out")
        assert got.count() == n
        assert got.select("doc_id").distinct().count() == n  # no dups/drops
        # disjoint doc_id ranges across files -> min-max pruning works
        ranges = []
        for f in sorted(os.listdir(f"{base}/out")):
            if f.endswith(".parquet") and not f.startswith("_"):
                t = pq.read_table(f"{base}/out/{f}", columns=["doc_id"])
                ids = t["doc_id"].to_pylist()
                if ids:
                    ranges.append((min(ids), max(ids)))
        ranges.sort()
        assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    finally:
        shutil.rmtree(base, ignore_errors=True)
