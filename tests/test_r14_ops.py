"""Unit pins for the r14-new operators: the composed C4 corpus pipeline
(stage-wiring invariants on a crafted corpus), the keyed-store
write_partitions file-size dial + compact-under-ingest census, the
merge_delta return-shape fix, the MIPS multi-probe dial, and the
boilerplate text-producing sibling."""

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


BANNER = "Accept all cookies"
RUN55 = " ".join(f"w{i % 9}x" for i in range(55))  # 55-word shared run


@pytest.fixture(scope="module")
def crafted(spark):
    """Corpus exercising every stage: a banner in 3 docs (boilerplate), a
    55-word run shared by docs 10/11 (substring scrub), near-identical
    docs 20/21 (near-dup cluster; 21 has the higher quality text), and a
    plain doc 30."""
    base20 = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(25))
    # doc 21 = doc 20 with ONE middle word changed -> Jaccard >> 0.5 but
    # longest common run < 50 only if the change sits mid-run; with 75
    # words and one change at word 36, runs are 36/38 < 50
    w = base20.split(" ")
    w[36] = "CHANGED"
    base21 = " ".join(w) + " extra tail words for quality length here now"
    uniq10 = " ".join(f"u10w{i}" for i in range(20))
    uniq11 = " ".join(f"u11w{i}" for i in range(20))
    rows = [
        (1, "en", f"{BANNER}. unique one body."),
        (2, "en", f"{BANNER}. unique two body."),
        (3, "en", f"{BANNER}. unique three body."),
        (10, "en", f"{uniq10} {RUN55}"),
        (11, "en", f"{uniq11} {RUN55}"),
        (20, "en", base20),
        (21, "en", base21),
        (30, "en", "a plain document with several ordinary words inside."),
    ]
    return _mk_docs(spark, rows)


def test_boilerplate_scrub_text_removes_banner_keeps_order(spark, crafted):
    from distributed_graph_database_simulation_spark.operators.dedup import (
        boilerplate_scrub_text_df,
    )

    out = {r.doc_id: r.text for r in boilerplate_scrub_text_df(crafted).collect()}
    assert len(out) == 8  # cardinality preserved
    assert BANNER not in out[1] and "unique one body" in out[1]
    assert out[30].startswith("a plain document")
    spark.catalog.clearCache()


def test_corpus_clean_pack_stage_wiring(spark, crafted):
    """End-to-end composition invariants: banner docs survive (their
    unique bodies remain), the shared 55-word run is scrubbed from BOTH
    carriers (their token mass shrinks to the unique prefix), and exactly
    one of the near-dup pair survives — the HIGHER-quality member, which
    is the composition-visible difference from min-id survivorship."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        corpus_clean_pack_df,
    )

    segs = corpus_clean_pack_df(
        spark, crafted, {"en": 1}, seq_len=64
    ).collect()
    docs_in_pack = {r.doc_id for r in segs}
    # near-dup pair: exactly one survivor
    assert len({20, 21} & docs_in_pack) == 1
    # banner docs survive with their unique bodies
    assert {1, 2, 3} <= docs_in_pack
    assert 30 in docs_in_pack
    # run carriers survive but shrunken: their total packed tokens == the
    # 20-word unique prefix's BPE token count, identical for both docs
    mass = {}
    for r in segs:
        mass[r.doc_id] = mass.get(r.doc_id, 0) + (r.seg_end - r.seg_start + 1)
    assert 10 in mass and 11 in mass
    assert mass[10] == mass[11]  # symmetric scrub
    # and strictly less than an unscrubbed 75-token doc's mass
    assert mass[10] < mass[20 if 20 in mass else 21]
    spark.catalog.clearCache()


def test_cluster_representative_quality_argmax(spark, crafted):
    """The survivor of the 20/21 near-dup pair must be the quality
    argmax, not the min doc_id: doc 21 carries extra length (higher
    length-score component)."""
    from distributed_graph_database_simulation_spark.operators.dedup import (
        dedup_clusters_df,
    )
    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        quality_score_df,
    )

    clusters = dedup_clusters_df(spark, crafted).select("doc_id", "cluster_id")
    members = {r.doc_id for r in clusters.collect()}
    assert members == {20, 21}
    q = {
        r.doc_id: r.quality
        for r in quality_score_df(crafted).collect()
        if r.doc_id in members
    }
    assert q[21] > q[20]  # the crafted asymmetry this test relies on
    spark.catalog.clearCache()


def test_keyed_store_write_partitions_and_compact_census(spark, tmp_path):
    from distributed_graph_database_simulation_spark.sources.keyed_store import (
        KeyedParquetStore,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    store = KeyedParquetStore(spark, str(tmp_path / "s"), "k", n_buckets=8)
    store.upsert(df, write_partitions=5)
    stats0 = store.compact(max_files_per_bucket=1)
    # write_partitions=5 over 8 buckets -> multi-file buckets existed
    assert stats0["buckets_compacted"] > 0
    assert stats0["files_before"] > stats0["files_after"]
    assert stats0["files_after"] <= 8
    # idempotent: second compact is a no-op
    stats1 = store.compact(max_files_per_bucket=1)
    assert stats1["buckets_compacted"] == 0
    assert stats1["files_before"] == stats0["files_after"]
    # content preserved exactly
    got = {(r.k, r.v) for r in store.read().collect()}
    assert got == {(i, i * 3) for i in range(2000)}


def test_merge_delta_return_shape_consistent(spark, tmp_path):
    """r13 ADVICE: both branches return the same keys (rows_written AND
    initial_load), like upsert's shape consistency."""
    from distributed_graph_database_simulation_spark.sources.keyed_store import (
        KeyedParquetStore,
    )

    store = KeyedParquetStore(spark, str(tmp_path / "m"), "k", n_buckets=4)
    ups = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dels = spark.createDataFrame([(2,)], "k long")
    first = store.merge_delta(ups, dels)
    assert first["initial_load"] is True
    assert first["rows_written"] == 1  # key 2 tombstoned on initial load
    second = store.merge_delta(
        spark.createDataFrame([(3, "c")], "k long, v string"),
        spark.createDataFrame([], "k long"),
    )
    assert second["initial_load"] is False
    assert second["rows_written"] >= 1
    assert set(first) == set(second) == {
        "buckets_touched", "rows_written", "initial_load",
    }


def test_mips_multiprobe_candidates_superset(spark):
    """probes=1 must return results at least as good as probes=0 for the
    same (tables, bits): its candidate set is a superset, so every
    exact-probe hit stays a hit and the raw-dot re-rank keeps order."""
    from distributed_graph_database_simulation_spark.operators.similarity import (
        mips_topk_df,
        mips_topk_lsh_df,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    queries = emb.filter(F.col("vec_id") < 4)
    exact = {(r.query_id, r.neighbor_id) for r in mips_topk_df(emb, queries).collect()}
    hits0 = {
        (r.query_id, r.neighbor_id)
        for r in mips_topk_lsh_df(emb, queries, probes=0).collect()
    } & exact
    hits1 = {
        (r.query_id, r.neighbor_id)
        for r in mips_topk_lsh_df(emb, queries, probes=1).collect()
    } & exact
    assert len(hits1) >= len(hits0)
    assert len(hits1) >= int(0.8 * len(exact))


def test_sliding_distinct_users_pairs_out_handle(spark):
    """pairs_out exposes exactly the operator's persisted frame so a
    materializing caller can release it (r13 ADVICE: no clearCache)."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        sliding_distinct_users_df,
    )

    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1), ("2024-01-02 11:00:00", 1),
         ("2024-01-02 12:00:00", 2)],
        "ts string, user_id long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    handles = []
    out = sliding_distinct_users_df(ev, pairs_out=handles)
    assert len(handles) == 1
    rows = {r.d.strftime("%Y-%m-%d"): (r.users_1d, r.users_7d) for r in out.collect()}
    assert rows["2024-01-01"] == (1, 1)
    assert rows["2024-01-02"] == (2, 2)
    handles[0].unpersist(blocking=True)
    # delta-based: earlier tests' checkpoint RDDs survive clearCache by
    # design (cache-ownership pins), so assert OUR persist is released,
    # not a global zero
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before
