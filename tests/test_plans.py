"""Physical-plan assertions: the 100 TB posture, pinned.

Correctness is the oracle gate's job; these tests pin the *plan shape* —
predicate pushdown reaching the parquet scans, column pruning, broadcast
joins for dimension tables, map-side partial aggregation — so a future
refactor that silently de-optimizes a query fails CI, not the bench.
"""

from __future__ import annotations

import re

from distributed_graph_database_simulation_spark.operators import relational


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _n_data_exchanges(plan: str) -> int:
    """Exchanges excluding the input-spread round-robin repartition.

    ``sources.tables.spread_small_scan`` round-robins a one-file scan up to
    cluster parallelism (r15 optimization; guide §2.5 input skew) — a no-op
    at scale, where scans arrive already split. The shuffle-free posture
    these tests pin is about DATA exchanges (hash/range partitioning, i.e.
    work proportional to keys), so the spread's roundrobin node is excluded.

    r16 (ADVICE): the exclusion is BOUNDED — only REPARTITION_BY_NUM
    round-robins are exempt (the spread's ``df.repartition(n)`` origin;
    REBALANCE or keyed repartitions still count), and at most one per
    parquet/InMemory base-relation scan in the plan (each spread sits
    directly on a scan). A future stray round-robin beyond the scan count
    fails the shuffle-free pins instead of hiding behind the exemption.
    """
    n = 0
    n_rr_exempt = 0
    # formatted mode: each node's detail block starts "(k) Exchange" with
    # the partitioning on its "Arguments:" line a couple of lines below
    for m in re.finditer(r"\(\d+\) (BroadcastExchange|Exchange)\n((?:[^\n]*\n){0,3})", plan):
        detail = m.group(2).lower()
        if m.group(1) == "BroadcastExchange":
            n += 1
        elif (
            "roundrobinpartitioning" in detail
            and "repartition_by_num" in detail
        ):
            n_rr_exempt += 1
        else:
            n += 1
    n_scans = len(re.findall(r"\(\d+\) (?:Scan parquet|InMemoryTableScan|Scan ExistingRDD)", plan))
    assert n_rr_exempt <= max(1, n_scans), (
        f"{n_rr_exempt} round-robin exchanges exempted but only {n_scans} "
        f"base scans in the plan — a non-spread round-robin slipped in"
    )
    return n


def test_q3_pushdown_broadcast_and_pruning(spark, sf_dir):
    plan = _formatted_plan(relational.top_revenue_orders(spark, sf_dir))
    # dimension joins broadcast, never sort-merge
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # filters reach the scans
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert re.search(r"PushedFilters:.*GreaterThan\(l_shipdate", plan)
    # column pruning: the lineitem scan reads only the 4 needed columns
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 4, m and m.group(1)


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _formatted_plan(relational.pricing_summary(spark, sf_dir))
    # map-side combine before the exchange (partial/final hash aggregation)
    assert "partial_sum" in plan
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", plan)


def test_projection_prunes_columns(spark, sf_dir):
    plan = _formatted_plan(relational.scalar_orders(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # orders has 9+ columns; the query needs exactly these
    assert cols == {
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
        "o_totalprice",
    }
    assert "LessThan(o_orderkey,2000)" in plan


def test_semi_and_anti_joins_stay_joins(spark, sf_dir):
    anti = _formatted_plan(relational.customers_without_orders(spark, sf_dir))
    semi = _formatted_plan(relational.segment_stats(spark, sf_dir))
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_dedup_pair_finders_never_go_quadratic(spark, sf_dir):
    """Candidate generation must stay a keyed join (inverted index / LSH
    bands) — a cartesian or nested-loop pair space would be the 100 TB
    killer this suite is designed around."""
    from distributed_graph_database_simulation_spark.operators import dedup

    for fn in (dedup.dedup_ngram_jaccard, dedup.dedup_minhash_lsh):
        plan = _formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_blocked_cosine_is_single_shuffle_group(spark, sf_dir):
    """The tiled all-pairs cosine path must be one hash shuffle on the
    block-pair key feeding the pandas kernel — no join node at all (a
    cartesian or nested-loop would defeat the design), no driver collect."""
    from distributed_graph_database_simulation_spark.operators import dedup

    plan = _formatted_plan(dedup.dedup_embedding_cosine_tiled(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan
    # one node-detail header per physical node: exactly one shuffle
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_ivf_corpus_side_stays_unshuffled(spark, sf_dir):
    """IVF list assignment is a narrow map (centroid literals in the scan)
    and the candidate join broadcasts the tiny probe side — the corpus must
    never hit a sort-merge join."""
    from distributed_graph_database_simulation_spark.operators import similarity

    plan = _formatted_plan(similarity.sim_topk_ivf(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_asof_join_is_single_shuffle_window(spark, sf_dir):
    """The as-of join must stay the union+window plan: exactly one window
    sort, no join of events against orders (which would explode pairs)."""
    plan = _formatted_plan(relational.asof_latest_order(spark, sf_dir))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Matching bucket layouts on both sides must make the fact-fact join
    shuffle-free: zero Exchange operators anywhere in the join plan, and
    the scans actually report their bucketing."""
    relational.bucketed_join(spark, sf_dir)  # (re)write the bucketed tables
    plan = _formatted_plan(relational.bucketed_join_bare(spark))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling, demonstrated end-to-end: a 95%-one-key join
    re-planned at runtime into `SortMergeJoin(skew=true)` with an
    `AQEShuffleRead skewed` input. Thresholds are lowered so local-scale
    data exhibits the 100 TB failure mode; session defaults are restored."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        facts = spark.range(2_000_000).select(
            F.when(F.col("id") < 1_900_000, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
        j = facts.join(dim, "k").select("k", "payload", "name")
        # collect() finalizes THIS DataFrame's QueryExecution (count() would
        # plan a separate one and leave this plan un-adapted)
        assert len(j.collect()) == 2_000_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_text_and_multimodal_ops_are_shuffle_free(spark, sf_dir):
    """SCALE.md claims the text operators and multimodal feature extraction
    are single narrow projections — embarrassingly parallel at any scale.
    Pin it: zero Exchange operators in any of their plans."""
    from distributed_graph_database_simulation_spark.operators import (
        multimodal,
        text_analysis,
    )

    for fn in (
        text_analysis.text_language_id,
        text_analysis.text_quality_score,
        text_analysis.text_token_count,
        text_analysis.text_fingerprint,
        multimodal.mm_image_features,
        multimodal.mm_audio_features,
        multimodal.mm_wav_decode,
        multimodal.mm_bmp_decode,
    ):
        plan = _formatted_plan(fn(spark, sf_dir))
        # zero DATA exchanges; the only allowed node is the input-spread
        # roundrobin (no-op at scale — see _n_data_exchanges)
        assert _n_data_exchanges(plan) == 0, (fn.__name__, plan)


def test_pipeline_ops_are_shuffle_free(spark, sf_dir):
    """Chunking and stratified sampling are narrow projections (explode /
    filter only) — zero Exchange, so they parallelize with input splits at
    any scale."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    for fn in (pipeline.text_chunk_windows, pipeline.text_sample_stratified):
        plan = _formatted_plan(fn(spark, sf_dir))
        assert _n_data_exchanges(plan) == 0, (fn.__name__, plan)


def test_shard_assign_rank_parallelism_exceeds_shard_count(spark, sf_dir):
    """The expensive row_number must partition on (shard, sub) — N_SHARDS *
    N_SUB tasks — never on shard alone, which would cap the sort at 16 tasks
    (~6 TB/task at 100 TB). The offset recomposition must be a broadcast,
    not another corpus-wide shuffle."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    plan = _formatted_plan(pipeline.text_shard_assign(spark, sf_dir))
    windows = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    rank_specs = [w for w in windows if "scramble" in w]
    assert rank_specs and all("sub" in w for w in rank_specs), windows
    assert "BroadcastHashJoin" in plan, plan


def test_common_neighbors_is_keyed_join(spark, sf_dir):
    """The CN pair space must come from the shared-neighbor key join —
    never a cartesian/nested-loop enumeration of vertex pairs."""
    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        common_neighbors_scale,
    )

    plan = _formatted_plan(common_neighbors_scale(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_capped_common_neighbors_is_keyed_and_bounded(spark, sf_dir):
    """The capped variant must keep the keyed-join shape AND cap per-key
    fan-out: every pair comes from a shared-neighbor key of degree <= the
    distribution-derived p90 cap, so no key can explode quadratically at
    scale — and because the cap tracks the distribution, the result is
    non-empty wherever the uncapped result is (a fixed cap of 32 was
    vacuously empty on the near-complete sf>=0.01 scale graph)."""
    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        common_neighbors_capped_scale,
        common_neighbors_scale,
    )

    df = common_neighbors_capped_scale(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # capped counts are a lower bound of the exact counts on the same pairs
    exact = {
        (r.u, r.v): r.common_neighbors
        for r in common_neighbors_scale(spark, sf_dir).collect()
    }
    capped = {(r.u, r.v): r.common_neighbors for r in df.collect()}
    if exact:
        # on a complete graph (sf0.1) there are no non-adjacent pairs at
        # all, so emptiness is only meaningful when the uncapped query has
        # results
        assert capped, "capped CN produced no pairs on the scale graph"
    assert set(capped) <= set(exact)
    assert all(capped[p] <= exact[p] for p in capped)


def test_cosine_prefiltered_is_keyed_join(spark):
    """The prefiltered route's candidate space must come from the
    (table_id, bucket) banding join — never a cartesian/nested-loop pair
    enumeration — and exact verification must join vectors back by key."""
    import numpy as np
    from pyspark.sql import Row

    from distributed_graph_database_simulation_spark.operators import dedup

    rng = np.random.RandomState(7)
    rows = [
        Row(vec_id=i, e=[float(x) for x in rng.standard_normal(16)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows)
    plan = _formatted_plan(dedup.dedup_embedding_cosine_prefiltered(spark, emb))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_store_join_stays_keyed(spark, sf_dir, tmp_path):
    """The store-based candidate joins (new-vs-store, new-vs-new) must be
    hash-keyed on (band_id, band_hash) — never cartesian/nested-loop."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import dedup

    docs = dedup._docs(spark, sf_dir)
    store = str(tmp_path / "sigstore_plan")
    dedup.write_signature_store(docs.where(F.col("doc_id") < 100), store)
    plan = _formatted_plan(
        dedup.dedup_against_store(spark, docs.where(F.col("doc_id") >= 100), store)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_spans_is_keyed_never_quadratic(spark, sf_dir):
    """Substring-level dedup must be candidate generation on the gram-hash
    key — a keyed semi-join from the occurrence counts back to positions —
    never a pairwise product; the interval merge is a per-doc window."""
    from distributed_graph_database_simulation_spark.operators import dedup
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for df in (dedup.dup_spans_df(docs), dedup.scrub_dup_spans_df(docs)):
        plan = _formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_cumsum_parallelism_exceeds_shard_count(spark, sf_dir):
    """Same posture as shard_assign: the corpus-wide running-token-total
    window must partition on (shard, sub), and the per-sub-bucket offset
    recomposition must broadcast — never a second corpus shuffle."""
    from distributed_graph_database_simulation_spark.operators import pipeline
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    chunks = pipeline.chunk_windows_df(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    plan = _formatted_plan(pipeline.pack_sequences_df(chunks))
    windows = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    cum_specs = [w for w in windows if "scramble" in w and "n_tokens" not in w.split(",")[0]]
    assert cum_specs and all("sub" in w for w in cum_specs), windows
    assert "BroadcastHashJoin" in plan, plan


def test_cap_per_source_rank_parallelism_and_token_budget_narrowness(spark, sf_dir):
    """cap_per_source must rank per (source, sub) — never per source alone
    (a giant crawl domain would serialize) — with broadcast offset
    recomposition; token-budget sampling's filter job is a narrow
    projection + WHERE (the totals agg is a separate tiny job)."""
    from distributed_graph_database_simulation_spark.operators import pipeline
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(pipeline.cap_per_source_df(docs, 10))
    windows = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    rank_specs = [w for w in windows if "_scr" in w]
    assert rank_specs and all("_sub" in w for w in rank_specs), windows
    assert "BroadcastHashJoin" in plan, plan

    budget_plan = _formatted_plan(
        pipeline.sample_token_budget_df(docs, {"en": 10_000})
    )
    assert "Exchange" not in budget_plan, budget_plan


def test_unigram_logprob_vocab_join_broadcasts(spark, sf_dir):
    """The token-probability lookup must broadcast the bounded vocab onto
    the exploded token stream — a sort-merge join there would shuffle the
    whole corpus on the (stopword-skewed) token key."""
    from distributed_graph_database_simulation_spark.operators import text_analysis
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(text_analysis.unigram_logprob_df(docs, vocab_size=100))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_runtime_bloom_filter_prunes_fact_fact_join(spark, sf_dir):
    """Optimizer mechanism pin: with the size thresholds lowered to the
    test scale, a selective fact-fact join must inject a runtime Bloom
    filter (bloom_filter_agg on the selective side, might_contain on the
    probe side) — at 100 TB this is what keeps the big side's shuffle from
    carrying rows the other side will discard."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        lineitem = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400_000  # highly selective build side
        )
        joined = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hyperball_superstep_is_partial_aggregated_keyed_join(spark):
    """The HyperBall superstep must stay a keyed equi-join + map-side
    partial max — register rows crush before the exchange, never a
    quadratic pair product."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        _hb_init_state,
    )

    edges = spark.createDataFrame(
        [(1, v, v + 1) for v in range(63)], "graph_id INT, src INT, dst INT"
    )
    graphs = spark.createDataFrame([(1, 64)], "graph_id INT, n INT")
    state = _hb_init_state(graphs, 6)
    propagated = state.alias("s").join(
        edges.alias("e"),
        on=(F.col("s.graph_id") == F.col("e.graph_id"))
        & (F.col("s.vertex") == F.col("e.dst")),
    ).select(
        F.col("e.graph_id").alias("graph_id"),
        F.col("e.src").alias("vertex"),
        F.col("s.reg").alias("reg"),
        F.col("s.rho").alias("rho"),
    )
    step = (
        state.unionByName(propagated)
        .groupBy("graph_id", "vertex", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    plan = _formatted_plan(step)
    assert "partial_max" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_random_walk_step_is_keyed_rank_lookup(spark):
    """One walk step = two keyed equi-joins (degree lookup + rank lookup).
    Never a neighbor-list replication: no cartesian/BNLJ anywhere, and the
    rank join carries the walk rows, not deg(v) candidates."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        random_walks,
    )

    edges = spark.createDataFrame(
        [(1, v, (v + 1) % 50) for v in range(50)]
        + [(1, v, (v + 7) % 50) for v in range(50)],
        "graph_id INT, src INT, dst INT",
    )
    graphs = spark.createDataFrame([(1, 50)], "graph_id INT, n INT")
    plan = _formatted_plan(random_walks(spark, graphs, edges, walk_length=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_node2vec_step_is_keyed_interval_join(spark):
    """A node2vec step is one keyed equi-join against the precomputed
    transition table (the interval pick rides the join as a post-filter on
    the equi-keys) — no cartesian/BNLJ, and no per-step WindowExec: the
    only windows belong to the one-time transition/rank tables (two
    row_number/sum passes), independent of walk_length."""
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        node2vec_walks,
    )

    edges = spark.createDataFrame(
        [(1, v, (v + 1) % 50) for v in range(50)]
        + [(1, v, (v + 7) % 50) for v in range(50)],
        "graph_id INT, src INT, dst INT",
    )
    graphs = spark.createDataFrame([(1, 50)], "graph_id INT, n INT")
    p2 = _formatted_plan(node2vec_walks(spark, graphs, edges, walk_length=2))
    p5 = _formatted_plan(node2vec_walks(spark, graphs, edges, walk_length=5))
    for plan in (p2, p5):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    assert p2.count("Window") == p5.count("Window")


def test_neighbor_feature_agg_is_partial_aggregated(spark):
    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        aggregate_neighbor_features,
    )

    edges = spark.createDataFrame(
        [(1, v, (v + 1) % 30) for v in range(30)], "graph_id INT, src INT, dst INT"
    )
    vf = spark.createDataFrame(
        [(1, v, float(v)) for v in range(30)], "graph_id INT, vertex INT, fa DOUBLE"
    )
    plan = _formatted_plan(aggregate_neighbor_features(vf, edges, ["fa"]))
    assert "partial_avg" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_random_project_is_narrow_map(spark, sf_dir):
    """The JL projection must stay a pure narrow map over the corpus: scan
    -> mapInPandas, zero Exchange (planes regenerate in-task from the
    seed, nothing broadcast or shuffled)."""
    from distributed_graph_database_simulation_spark.operators.similarity import (
        random_project,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _formatted_plan(random_project(emb, "vec_id", "embedding", 16))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_funnel_is_single_shuffle_fold(spark, sf_dir):
    """The funnel must stay the collect+F.aggregate fold: one Exchange on
    user_id, no per-step join chain (k chained joins = k shuffles is the
    naive shape this formulation exists to avoid)."""
    plan = _formatted_plan(relational.rel_funnel(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_resample_grid_is_generated_not_joined(spark, sf_dir):
    """The dense bucket grid must come from JVM sequence+explode per key
    (Generate node), never a calendar cross join; the fill is one window."""
    plan = _formatted_plan(relational.rel_resample_ffill(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan
    assert "Window" in plan


def test_winsorize_bounds_broadcast_back(spark, sf_dir):
    """Percentile bounds are one row per group: they must broadcast back
    onto the fact rows — the raw values never shuffle."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    plan = _formatted_plan(pipeline.pipe_winsorize(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_split_is_pure_narrow_map(spark, sf_dir):
    """Train/val/test assignment is a pure function of the id: zero
    Exchange anywhere."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    plan = _formatted_plan(pipeline.pipe_split(spark, sf_dir))
    assert _n_data_exchanges(plan) == 0


def test_tfidf_and_pmi_joins_stay_keyed(spark, sf_dir):
    """The df-marginal joins must stay keyed (token hash) with partial
    aggregation — never a product over the vocabulary."""
    from distributed_graph_database_simulation_spark.operators import text_analysis

    for fn in (text_analysis.text_tfidf, text_analysis.text_pmi):
        plan = _formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "partial_" in plan, fn.__name__


def test_bigram_lm_count_tables_stay_keyed(spark, sf_dir):
    """The unigram/bigram/context scoring joins must stay keyed with
    map-side partial counts; the bigram table (vocab² worst case) must
    never be broadcast or enter a product."""
    from distributed_graph_database_simulation_spark.operators import text_analysis

    plan = _formatted_plan(text_analysis.text_bigram_lm(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_gopher_rules_single_keyed_aggregate(spark, sf_dir):
    """All rules except top-word run as narrow HOF maps: exactly one
    corpus aggregate pair (doc_id-keyed top-word count), partial-combined,
    and no join strategy other than the doc_id-keyed hash join back."""
    from distributed_graph_database_simulation_spark.operators import text_analysis

    plan = _formatted_plan(text_analysis.text_gopher_rules(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_max" in plan


def test_skyline_is_local_prune_plus_broadcast_anti_join(spark, sf_dir):
    """rel_skyline's 100 TB shape: the corpus passes through the narrow
    local-skyline kernel (no shuffle before it), and the global phase is a
    broadcast nested-loop LEFT ANTI over local-frontier survivors — never a
    corpus self-join or sort-merge."""
    plan = _formatted_plan(relational.skyline_parts(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2  # one per side
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # nothing shuffles: the only exchanges are the broadcast for the anti-join
    assert "hashpartitioning(" not in plan
    # column pruning reaches the part scan (3 of 6 columns)
    m = re.search(r"ReadSchema: struct<(p_[^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 3, m and m.group(1)


def test_skyline_sorted_global_fallback_never_broadcasts(spark, sf_dir):
    """The anti-correlated fallback's whole point is that NOTHING is
    broadcast (the frontier can be O(n)): plan must be range exchange +
    in-partition sort + narrow Arrow sweep — no broadcast of any kind, no
    hash exchange, no sort-merge join."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        _skyline_local_prune,
        _skyline_sorted_global,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    plan = _formatted_plan(_skyline_sorted_global(_skyline_local_prune(part)))
    assert "BroadcastExchange" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "hashpartitioning(" not in plan
    assert "rangepartitioning(" in plan
    spark.catalog.clearCache()


def test_zorder_layout_is_one_range_exchange(spark, sf_dir):
    """pipe_zorder_layout's data path: Morton projection is narrow; the only
    exchange on the returned frame is the range partitioner that clusters by
    zval (the separate tiny min/max agg runs as its own driver-side job)."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        pipe_zorder_layout,
    )

    plan = _formatted_plan(pipe_zorder_layout(spark, sf_dir))
    assert "rangepartitioning(zval" in plan
    assert "hashpartitioning(" not in plan
    assert "BroadcastExchange" not in plan and "SortMergeJoin" not in plan


def test_retention_cohorts_is_single_corpus_shuffle(spark, sf_dir):
    """One hash exchange on user_id (collect_set with map-side partial)
    plus the tiny final (cohort, offset) aggregate — the naive
    distinct+join formulation pays four corpus exchanges."""
    plan = _formatted_plan(relational.retention_cohorts(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "partial_collect_set" in plan or "objHashAggregate" in plan.lower() or "collect_set" in plan
    assert "Join" not in plan
    # events scan reads only user_id + ts
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"user_id", "ts"}


def test_mixture_balance_quota_join_broadcasts(spark, sf_dir):
    """Quotas (|groups| rows) broadcast onto the ranked corpus; the corpus
    pays exactly one hash exchange for the per-lang rank window. The
    counts aggregate is a second scan but column-pruned to lang only."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    plan = _formatted_plan(pipeline.pipe_mixture_balance(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the rank window partitions the corpus by lang (formatted mode lists
    # exchange arguments on their own lines)
    assert re.search(r"hashpartitioning\(lang", plan)


def test_lsh_signatures_are_skinny_and_topk_joins_back_broadcast(spark, sf_dir):
    """The r09 ANN shape: signatures carry no vectors (id-only kernel
    output), and the re-rank joins candidate ids back onto the vector
    table via broadcast — the corpus is scanned, never shuffled, and no
    sort-merge join appears anywhere."""
    from distributed_graph_database_simulation_spark.operators import similarity

    plan = _formatted_plan(similarity.sim_topk_lsh(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # candidate-id + query join-back


def test_bpe_encode_is_shuffle_free(spark, sf_dir):
    """The BPE tokenizer is one Arrow mapInPandas over the corpus scan —
    SCALE.md's embarrassingly-parallel claim. Pin: zero Exchange, exactly
    one Python-worker stage (the word-local pair-merge kernel)."""
    from distributed_graph_database_simulation_spark.operators import text_analysis

    plan = _formatted_plan(text_analysis.text_bpe_encode(spark, sf_dir))
    assert _n_data_exchanges(plan) == 0, plan
    # exactly one Python-worker stage in the tree (the node renders once
    # in the tree and once in the detail section)
    assert plan.count("MapInPandas (") == 1, plan


def test_exact_substring_plan_is_aggregate_plus_keyed_semi_join(spark, sf_dir):
    """The suffix-array contract's relational plan: ONE hash aggregate
    over gram keys (map-side combined — partial_count present), ONE keyed
    LEFT SEMI join back to positions, and the per-doc island window — no
    cartesian/broadcast-nested-loop anywhere (the plan must stay
    candidate-proportional, never corpus-quadratic)."""
    from distributed_graph_database_simulation_spark.operators import dedup

    plan = _formatted_plan(dedup.dedup_exact_substring(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "partial_count" in plan, plan  # map-side combine on gram keys


def test_interleave_pack_tokenizes_once(spark, sf_dir):
    """The r13 composition's plan pin: the BPE tokenizer's MapInPandas
    appears exactly ONCE in the physical tree (the keyed projection is
    persisted — without it the in-bucket cumsum and the bucket-offset
    branches each re-ran the whole tokenize pipeline), and there is no
    corpus-wide global sort (the only SinglePartition exchange feeds the
    <= #buckets offsets window, and the plan's Sorts are the documented
    per-bucket window sorts)."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    import re

    df = pipeline.pipe_interleave_pack(spark, sf_dir)
    plan = _formatted_plan(df)
    # one distinct tokenizer stage (the cached-plan detail renders the
    # same node id under each InMemoryTableScan consumer)
    assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1, plan
    # BOTH cumsum branches read the persisted keyed projection
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_mips_corpus_never_shuffled_and_queries_broadcast(spark, sf_dir):
    """Exact MIPS: the query side (and the M scalar) broadcast; the only
    exchange is the final per-query top-k window over k x |queries| rows —
    the corpus itself is scanned in place, never hash-repartitioned."""
    from distributed_graph_database_simulation_spark.operators import similarity

    plan = _formatted_plan(similarity.sim_topk_mips(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # M scalar + query set
    assert "SortMergeJoin" not in plan
    # query-side pushdown reaches the scan
    assert re.search(r"PushedFilters:.*LessThan\(vec_id,8\)", plan)
    # the sole hash exchange is the window's query_id partitioning
    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all(k.startswith("query_id") for k in hash_exchanges), hash_exchanges
    # per-partition top-k prune before the exchange (WindowGroupLimit)
    assert "WindowGroupLimit" in plan


def test_sliding_distinct_explode_after_dedupe(spark, sf_dir):
    """The first-in-window explode runs over the DEDUPED pairs cache, and
    the final count is a partial (map-side-combinable) aggregate — no
    second corpus-wide distinct anywhere after the explode."""
    from distributed_graph_database_simulation_spark.operators import relational as R

    df = R.sliding_distinct_users(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "partial_count" in plan
    # the generator feeds from the cached pairs, not a raw events rescan
    assert plan.count("Scan parquet") <= 1 or "InMemoryTableScan" in plan
    spark.catalog.clearCache()


def test_snapshot_diff_ships_digests_not_text(spark, sf_dir):
    """The full-outer join's exchanges carry md5 digests and lengths —
    the text column is consumed map-side by the digest projection and
    never crosses the shuffle."""
    from distributed_graph_database_simulation_spark.operators import pipeline as P

    plan = _formatted_plan(P.pipe_snapshot_diff(spark, sf_dir))
    # every hash exchange's output is digest-narrow: no raw `text` column
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)
    # deletions/additions filters reach the v2 scans
    assert re.search(r"PushedFilters:.*IsNotNull\(doc_id\)", plan)


def test_knn_graph_bucket_self_join_no_cartesian(spark, sf_dir):
    """k-NN graph: the candidate join is a HASH join on (table_id, bucket)
    between two signature streams — never a cartesian/broadcast-nested-
    loop over vectors — and the re-rank is a per-src window with the
    group-limit prune, so the only corpus-sized structures are the
    bucket-keyed id shuffles."""
    from distributed_graph_database_simulation_spark.operators import similarity

    plan = _formatted_plan(similarity.sim_knn_graph(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan
    # the subset filter reaches the scan (partition-prunable at scale)
    assert "vec_id" in plan


def test_analyze_stats_pruned_scan_and_partial_aggs(spark, sf_dir):
    """ANALYZE stats: the lineitem scan reads ONLY the three measured
    columns, and both aggregates (summary + histogram) partial-aggregate
    before their exchanges — no window, no sort."""
    import re as _re

    plan = _formatted_plan(relational.rel_analyze_stats(spark, sf_dir))
    m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount"}
    assert "partial_count" in plan
    assert "Window" not in plan.replace("WindowGroupLimit", "")
    assert "Sort " not in plan


def test_mips_multiprobe_expansion_is_query_side_only(spark, sf_dir):
    """probes=1 must not change the corpus-side plan: the Hamming-1 mask
    explode sits on the (broadcast) query signature stream. Pin: exactly
    one Generate (explode) node, feeding the broadcast side, and the
    corpus scan count is identical between probes=0 and probes=1."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.similarity import (
        _emb,
        mips_topk_lsh_df,
    )

    corpus = _emb(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 8)
    p0 = _formatted_plan(mips_topk_lsh_df(corpus, queries, probes=0))
    p1 = _formatted_plan(mips_topk_lsh_df(corpus, queries, probes=1))
    # the explode exists only in the probes=1 plan (formatted explain
    # mentions the Generate node in both the tree and the details block,
    # so compare presence, not an exact +1)
    assert p0.count("Generate") == 0 and p1.count("Generate") > 0
    # corpus scans: same number of parquet scans either way
    assert p0.count("Scan parquet") == p1.count("Scan parquet")


def test_dedup_store_candidate_join_is_one_sided_exchange(spark, sf_dir, tmp_path):
    """r14 verdict #4: the streaming dedup store's band history is a
    BUCKETED table clustered on the candidate-join key, so the per-batch
    candidate join must NOT re-shuffle the history side — Catalyst keeps
    the bucketed scan ("Bucketed: true"; the DisableUnnecessaryBucketedScan
    rule would flip it to 'disabled by query planner' if the partitioning
    were not consumed downstream, i.e. if an Exchange sat above the scan).
    Only the new batch side shuffles — batch-proportional, not
    history-proportional."""
    import re

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import dedup
    from distributed_graph_database_simulation_spark.streaming import ingest

    docs = dedup._docs(spark, sf_dir)
    store = str(tmp_path / "bucketed_store")
    pairs = str(tmp_path / "pairs")
    ingest.dedup_ingest_batch(spark, docs.where(F.col("doc_id") < 100), 0, store, pairs)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bands_tbl, sh_tbl = ingest._ensure_store_tables(
            spark, store, ingest.DEDUP_STORE_BUCKETS
        )
        batch = docs.where(F.col("doc_id") >= 100)
        bands_old = (
            spark.table(bands_tbl)
            .where(F.col("batch_id") != 1)
            .select("doc_id", "band_id", "band_hash")
        )
        sh_old = (
            spark.table(sh_tbl)
            .where(F.col("batch_id") != 1)
            .select("doc_id", "shingles")
        )
        plan = _formatted_plan(dedup.dedup_against_frames(batch, bands_old, sh_old))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    m = re.search(
        r"Scan parquet spark_catalog\.default\.dgds_bands\w+\n(?:[^\n(]*\n)*?"
        r"Bucketed: (\S+)",
        plan,
    )
    assert m, "bands store scan not found in plan"
    assert m.group(1) == "true", plan[m.start(): m.end() + 120]
    # and the join stayed keyed, never quadratic
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for t in (bands_tbl, sh_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cbo_stats_flip_join_strategy(spark, sf_dir):
    """r14 verdict #2: collected column stats must demonstrably change the
    physical plan. Same query, same confs, same data — the only variable
    is ANALYZE TABLE: without stats the filtered orders side is estimated
    at file size (above the broadcast threshold -> SortMergeJoin); with
    column stats the estimate collapses to filtered-rows x row-width
    (below it -> BroadcastHashJoin)."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import relational

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        str(relational.CBO_BROADCAST_THRESHOLD),
    )
    names = ("cbo_pin_orders", "cbo_pin_lineitem")
    try:
        for name, src in zip(names, ("orders", "lineitem")):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            spark.sql(
                f"CREATE TABLE {name} USING PARQUET "
                f"LOCATION '{sf_dir}/{src}.parquet'"
            )

        def build():
            seg = spark.table("cbo_pin_orders").where(
                F.col("o_custkey") < relational.CBO_CUSTKEY_LIMIT
            )
            return (
                spark.table("cbo_pin_lineitem")
                .join(seg, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )

        without_stats = _formatted_plan(build())
        assert "SortMergeJoin" in without_stats, without_stats
        assert "BroadcastHashJoin" not in without_stats

        spark.sql(
            "ANALYZE TABLE cbo_pin_orders COMPUTE STATISTICS "
            "FOR COLUMNS o_custkey, o_orderkey, o_orderpriority"
        )
        spark.sql(
            "ANALYZE TABLE cbo_pin_lineitem COMPUTE STATISTICS "
            "FOR COLUMNS l_orderkey"
        )
        with_stats = _formatted_plan(build())
        assert "BroadcastHashJoin" in with_stats, with_stats
        assert "SortMergeJoin" not in with_stats
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        for name in names:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_cbo_stats_drive_join_reorder(spark, sf_dir):
    """The second half of the CBO demonstration (r14 verdict #2): with
    column stats + spark.sql.cbo.joinReorder, a 3-table star written as
    (lineitem ⋈ orders) ⋈ tiny-customer-segment is REORDERED to join the
    selective (orders ⋈ customer) pair first — the cardinality-driven
    rewrite a 100 TB user runs ANALYZE for. Without stats the optimizer
    keeps the written order."""
    import re as _re

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import relational

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
        )
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    names = ("ro_pin_cust", "ro_pin_orders", "ro_pin_li")
    try:
        for name, src in zip(names, ("customer", "orders", "lineitem")):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            spark.sql(
                f"CREATE TABLE {name} USING PARQUET "
                f"LOCATION '{sf_dir}/{src}.parquet'"
            )

        def build():
            cust = spark.table("ro_pin_cust").where(
                F.col("c_custkey") < relational.CBO_CUSTKEY_LIMIT
            )
            return (
                spark.table("ro_pin_li")
                .join(
                    spark.table("ro_pin_orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .join(cust, F.col("o_custkey") == F.col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(F.count("*").alias("n"))
            )

        def relation_order(q):
            plan = q._jdf.queryExecution().optimizedPlan().toString()
            return _re.findall(r"Relation spark_catalog\.default\.(\w+)", plan)

        assert relation_order(build()) == ["ro_pin_li", "ro_pin_orders", "ro_pin_cust"]
        for name, cols in (
            ("ro_pin_cust", "c_custkey, c_mktsegment"),
            ("ro_pin_orders", "o_orderkey, o_custkey"),
            ("ro_pin_li", "l_orderkey"),
        ):
            spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
        # stats reorder the tree: the selective orders ⋈ customer pair
        # joins first, the fact table last
        reordered = relation_order(build())
        assert reordered[-1] == "ro_pin_li", reordered
        assert set(reordered[:2]) == {"ro_pin_orders", "ro_pin_cust"}, reordered
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        for name in names:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
