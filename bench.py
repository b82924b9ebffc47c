#!/usr/bin/env python3
"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is executed once after a warm-up pass of the Spark session
(session start + parquet footer reads are excluded from per-query time the
same way the reference's process startup is excluded from its request
latency). Timing includes full materialization (count of the result).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per major operator family (SURVEY.md §2). Names must
# exist in the registry; missing ones are skipped so bench never hard-fails
# mid-build.
HEADLINE = [
    # fixture-size BFS through the kernel path (the reference's n<=100
    # regime); the superstep scale path is benched by g_bfs_scale, so the
    # fixture row no longer re-pays the local scheduler floor per level
    "g_bfs_levels_kernel",
    "g_bfs_scale",
    "g_connected_components",
    "g_pagerank",
    "rel_pricing_summary",
    "rel_top_revenue_orders",
    "rel_region_revenue",
    "rel_top_parts_per_brand",
    "rel_event_sessions",
    "rel_events_hourly",
    "rel_asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine_tiled",
    "sim_topk_bruteforce",
    "text_quality_score",
    "text_fingerprint",
    "text_chunk_windows",
    "text_shard_assign",
    "mm_image_features",
    # executable codec paths (r04 verdict: the only operator family with no
    # timing row) — encode->decode round trip inside the mapInPandas kernel
    "mm_wav_decode",
    "mm_bmp_decode",
    "stream_events_hourly",
    # round-5 library wave (r05 verdict #4: regressions in the new code must
    # be visible in the headline)
    "text_tfidf",
    "dedup_dup_spans",
    "rel_funnel",
    "rel_resample_ffill",
    "rel_rolling_zscore",
    "pipe_winsorize",
    "mm_png_decode",
    "g_temporal_reach_scale",
    # round-7 rotation heavy hitters (r06 verdict #7: the newly certified
    # graph-library family must be regression-visible in the headline)
    "g_scc_scale",
    "g_betweenness_sampled_scale",
    "g_coloring",
    # round-7 new operators (streaming file sink excluded: its wall is
    # micro-batch overhead, already represented by stream_events_hourly)
    "text_gopher_rules",
    "text_bigram_lm",
    "pipe_cdc_chunks",
    "sim_kmeans",
    # round-9 continuation: the Arrow-vectorized ANN paths (19.6s -> 1.5s /
    # 5.1s -> 1.8s warm at sf0.001 after the matmul-kernel rewrite) become
    # regression-visible, plus the three new staged operators
    "sim_topk_lsh",
    "sim_topk_ivf",
    "rel_skyline",
    "rel_retention_cohorts",
    "pipe_mixture_balance",
    "sim_topk_pq",
    "mm_image_resize",
    # round-9 continuation: staged-for-r10 operators (PQ-pruned ANN, semantic
    # dedup, deterministic walk corpora, GNN feature prep)
    "sim_topk_ivfpq",
    "dedup_semdedup",
    "g_random_walks_scale",
    "g_node2vec_walks_scale",
    "g_neighbor_agg_scale",
    "g_simrank_scale",
    "g_hits_scale",
    # round-10 wave: non-vacuous per-vertex triangles, the >1M-vector
    # prefiltered cosine route, the HyperBall family (checksum-certified +
    # harmonic), and the persisted-state ingestion paths
    "g_triangles",
    "dedup_embedding_cosine_prefiltered",
    "g_hyperball_scale",
    "g_hyperball_harmonic_scale",
    "pipe_hll_store_merge",
    "pipe_theta_overlap",
    "pipe_zorder_layout",
    "sim_random_project",
    "sim_topk_ivf_index",
    "stream_sketch_ingest",
    "stream_dedup_ingest",
    "stream_user_state_ingest",
    "g_effective_diameter_scale",
    "g_triangles_sampled_scale",
    "pipe_temperature_mix",
    "g_four_cliques_scale",
    "text_novelty",
    "rel_approx_distinct_checked",
    # round-11 wave: multi-grain GROUPING SETS, radius cosine search,
    # bipartite co-occurrence projection, CMS frequency store (batch +
    # streaming ingest with replay stress)
    "rel_grouping_sets",
    "sim_range_search",
    "g_bipartite_project",
    "pipe_cms_heavy_hitters",
    "stream_cms_ingest",
    "g_walk_skipgram_pairs",
    "rel_unpivot",
    "rel_rank_family",
    "rel_approx_quantile_checked",
    "pipe_end_to_end",
    "sim_ivf_index_append",
    "g_butterflies",
    "pipe_epoch_shuffle",
    "pipe_curriculum_buckets",
    "pipe_weighted_sample",
    "mm_image_patches",
    "mm_audio_windows",
    "pipe_compact_files",
    "stream_scd2_ingest",
    "g_bipartite_clustering",
    "text_hashed_features",
    "g_assortativity",
    # round-12 wave (kernel rebuilt word-local in r13): deterministic BPE
    # tokenizer, the suffix-array exact-substring dedup contract, and
    # BPE-counted sequence packing
    "text_bpe_encode",
    "dedup_exact_substring",
    "pipe_pack_bpe",
    # round-12 staged-for-r13 entries (regression-visible from day one)
    "dedup_scrub_substring",
    "pipe_token_budget_bpe",
    "text_bpe_vocab",
    "mm_image_channel_stats",
    "pipe_interleave_sources",
    "pipe_pack_segments",
    "sim_recall_ivf",
    "mm_audio_level_stats",
    "stream_token_count_ingest",
    "rel_mad",
    "g_katz_scale",
    # round-13 wave: the interleave -> BPE-pack -> segments composition,
    # quality-argmax cluster representatives, tokenizer compression audit
    "pipe_interleave_pack",
    "dedup_cluster_representatives",
    "text_bpe_compression",
    # round-13 second wave: norm-augmented MIPS top-k, exact trailing-7-day
    # distinct users, crawl-over-crawl snapshot diff
    "sim_topk_mips",
    "rel_sliding_distinct_users",
    "pipe_snapshot_diff",
    "stream_crawl_diff_ingest",
    "stream_wau_ingest",
    "mm_frame_deltas",
    "text_keywords",
    "pipe_incremental_quality",
    "rel_mode",
    "dedup_boilerplate_sentences",
    "mm_audio_downsample",
    "rel_attribution_last_touch",
    # r14-built (staged r15)
    "sim_recall_mips",
    "pipe_corpus_clean_pack",
    "stream_compact_ingest",
    "mm_jpeg_decode",
    "sim_knn_graph",
    "rel_analyze_stats",
    # r15-built (staged r16): CBO stats-driven join, record linkage +
    # entity-resolution merge
    "rel_cbo_stats_join",
    "link_customer_dirty",
    "link_entity_clusters",
    "stream_linkage_ingest",
    "link_sorted_neighborhood",
]


def _scale_graph(spark, sf_dir):
    from distributed_graph_database_simulation_spark import fixtures
    from distributed_graph_database_simulation_spark.sources.graph_text import (
        GRAPH_SCHEMA,
    )

    edges = fixtures.scale_edges_df(spark, sf_dir).selectExpr(
        "CAST(1 AS INT) AS graph_id", "src", "dst"
    )
    graphs = spark.createDataFrame([(1, fixtures.SCALE_V)], GRAPH_SCHEMA)
    return graphs, edges


def _bench_ktruss(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        ktruss,
    )

    _, edges = _scale_graph(spark, sf_dir)
    return ktruss(spark, edges, k=20)


# HyperBall harmonic, estimator-only split (r11 verdict #3): the registry
# entry's r11 checked-form conversion folded the EXACT all-sources
# multi-source-BFS companion (the oracle's ground truth) into the timed
# entry, which is the whole 1.50 -> 2.48 s r10->r11 move. This row times
# the estimator alone — the operator a user actually runs — while the
# combined entry stays in HEADLINE for cross-round continuity.
def _bench_hyperball_harmonic_est(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball_harmonic,
    )

    graphs, edges = _scale_graph(spark, sf_dir)
    return hyperball_harmonic(spark, graphs, edges)


# Persisted IVF index, build/query SPLIT (r10 verdict #4): the registry
# entry rebuilds the index per call by design (self-contained correctness
# probe), which double-charges the bench — the operator's claim is
# train-once / query-many. `_build` times k-means + the list-partitioned
# write; `_query` times a probe against the index `_build` left behind
# (listed after it in EXTRA_BENCH, same process). The combined entry stays
# in HEADLINE for cross-round continuity.
_IVF_INDEX_DIRS: dict[str, str] = {}


def _ivf_index_dir(sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    if sf_dir not in _IVF_INDEX_DIRS:
        d = tempfile.mkdtemp(prefix="dgds_bench_ivf_")
        _IVF_INDEX_DIRS[sf_dir] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _IVF_INDEX_DIRS[sf_dir]


def _bench_ivf_index_build(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators import similarity as S

    base = _ivf_index_dir(sf_dir)
    S.build_ivf_index(spark, S._emb(spark, sf_dir), base)
    return spark.read.parquet(f"{base}/centroids")


def _bench_ivf_index_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import similarity as S

    base = _ivf_index_dir(sf_dir)
    import os as _os

    if not _os.path.isdir(f"{base}/centroids"):  # robust to HEADLINE edits
        S.build_ivf_index(spark, S._emb(spark, sf_dir), base)
    queries = S._emb(spark, sf_dir).filter(F.col("vec_id") < S.N_QUERIES)
    return S.sim_topk_ivf_index(spark, queries, base)


# Library operators benched directly (no registry entry; the hyperball
# family graduated to registry entries in r10 and is benched from HEADLINE).
EXTRA_BENCH = {
    "g_ktruss": _bench_ktruss,
    "sim_topk_ivf_index_build": _bench_ivf_index_build,
    "sim_topk_ivf_index_query": _bench_ivf_index_query,
    "g_hyperball_harmonic_est": _bench_hyperball_harmonic_est,
}


def main() -> int:
    # FOREIGN load, sampled before the session spins up: the bench's own
    # local[32] executor threads legitimately drive loadavg to 5-30 by
    # run end, so an end-of-run sample can never be "quiet" (the r14
    # FULLBENCH capture proved it). host_quiet is based on THIS number.
    try:
        loadavg_start = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg_start = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --full: bench EVERY registry entry — HEADLINE names at the usual reps,
    # the certified tail at reps=1 (r11 verdict #7: 105 entries were
    # regression-invisible between rounds). The default run stays the
    # headline set so the driver's wall-clock budget is unchanged; a full
    # run is recorded per-round as a committed FULLBENCH artifact.
    full = "--full" in sys.argv[1:]
    # --names-from BENCH_rN.json: bench EXACTLY the query names recorded in a
    # prior round's bench artifact (r12 verdict #1b — like-for-like reruns:
    # the headline set keeps growing, so cross-round totals compare different
    # sets; this flag replays an old set verbatim in a fresh session).
    names_from: list[str] | None = None
    argv = sys.argv[1:]
    if "--names-from" in argv:
        with open(argv[argv.index("--names-from") + 1]) as f:
            _prior = json.load(f)
        # EXECUTION ORDER MATTERS for like-for-like comparisons: artifacts
        # are written sort_keys=True, so the "queries" dict is ALPHABETICAL,
        # not the order the prior run executed (HEADLINE order). Replaying
        # alphabetically reorders session effects (JIT, GC pressure,
        # localCheckpoint block accumulation) and measured up to 13x
        # phantom per-query regressions on identical code. Prefer the
        # explicit "order" list newer artifacts carry; else reconstruct
        # HEADLINE order for the named set (leftovers appended sorted).
        _names = set(_prior["queries"])
        if "order" in _prior:
            names_from = [n for n in _prior["order"] if n in _names]
        else:
            names_from = [n for n in HEADLINE + list(EXTRA_BENCH) if n in _names]
        # leftovers (e.g. a --full artifact's certified tail) follow the
        # registry's iteration order — the order the original full run
        # executed them in — not alphabetical (see the order note above)
        from distributed_graph_database_simulation_spark import registry as _reg

        _seen = set(names_from)
        names_from += [n for n in _reg.queries() if n in _names and n not in _seen]
        names_from += sorted(_names - set(names_from))
    from distributed_graph_database_simulation_spark import registry
    from distributed_graph_database_simulation_spark.session import get_spark

    # Shuffle partitions: AQE coalesces big-query reducers anyway; a lower
    # static default cuts per-stage overhead for the many small-input
    # queries (superstep frontiers, fixture graphs). Override with
    # SPARK_GRAFT_SHUFFLE for larger scale factors.
    # 8 measured best at sf0.1 on local[32] (4 starves minhash/jaccard
    # parallelism, 16+ pays task overhead on the superstep loops).
    spark = get_spark("bench", int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")))
    queries = registry.queries()

    # Warm up one-time process costs so per-query numbers measure
    # steady-state plans: parquet footers, whole-stage codegen + exchange
    # compilation, AQE machinery, and the Arrow/pandas-UDF worker pool.
    # (Same exclusion the reference gets for its process startup.)
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(0, 100_000, 1, 4).withColumn("k", F.col("id") % 100)
    warm.groupBy("k").count().join(warm, "k").count()  # exchange + join codegen
    warm.limit(8).localCheckpoint(eager=True).isEmpty()  # superstep plumbing
    spark.createDataFrame([(1,)], "v int").groupBy("v").applyInPandas(
        lambda p: p, "v int"
    ).count()  # python worker pool + Arrow serde
    # The 128-permutation minhash aggregate generates a very wide codegen
    # stage (~3 s to compile at sf0.1). Running the WHOLE production
    # pipeline on a tiny frame — persist included, so the aggregate consumes
    # an InMemoryTableScan exactly like the measured run — compiles and
    # caches the same generated classes (the codegen cache keys on generated
    # source bodies, which are shape- not data-dependent), leaving the
    # measured number the data-proportional cost, not javac.
    from distributed_graph_database_simulation_spark.operators import dedup as _dedup

    _tiny = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "b c d e f g"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    _dedup.minhash_lsh_df(_tiny).count()
    # Superstep + kernel BFS shapes (frontier join / anti-join / checkpoint
    # plumbing and the grouped-with-start applyInPandas plan): a 2-edge graph
    # compiles the same generated classes the scale queries run.
    from distributed_graph_database_simulation_spark.operators.graph_traversal import (
        bfs_levels,
        bfs_levels_small,
    )

    _tiny_edges = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2)], "graph_id INT, src INT, dst INT"
    )
    bfs_levels(spark, _tiny_edges, [(1, 0)]).count()
    bfs_levels_small(spark, _tiny_edges, [(1, 0)]).count()
    # Streaming stateful-window machinery (micro-batch planner + state store
    # + windowed agg codegen): run the real streaming query on the smallest
    # scale factor when present; the memory-sink name is reused, which
    # createOrReplace semantics allow.
    _sf_small = "/root/testdata/sf0.001"
    if os.path.isdir(_sf_small) and os.path.abspath(_sf_small) != os.path.abspath(sf_dir):
        try:
            queries["stream_events_hourly"](spark, _sf_small).count()
        except Exception:
            pass  # warm-up must never fail the bench

    # Per-query MEDIAN of `reps` runs (r09 verdict #5 — the r09 common-41
    # subset drifted +21% uniformly at a LOWER load average: single-run
    # numbers conflate the operator with transient session/host state;
    # the median of 3 rejects one bad sample per query). Cache released
    # between runs so every rep recomputes from parquet. Queries whose
    # FIRST pass exceeds SPARK_GRAFT_BENCH_REP_SKIP seconds run once:
    # multi-second queries are plan-dominated (scheduler jitter is a small
    # fraction), the median matters most for sub-second noise, and the cap
    # keeps the 70-query headline's wall bounded.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    rep_skip = float(os.environ.get("SPARK_GRAFT_BENCH_REP_SKIP", "8"))
    if names_from is not None:
        plan: list[tuple[str, int]] = [(n, reps) for n in names_from]
    else:
        plan = [(n, reps) for n in HEADLINE + list(EXTRA_BENCH)]
        if full:
            headline = set(HEADLINE) | set(EXTRA_BENCH)
            plan += [(n, 1) for n in queries if n not in headline]
    times: dict[str, float] = {}
    # Per-query [min, max, n_samples] across reps (r12 verdict #1a): a
    # cross-round move within a query's own rep spread is scheduler noise
    # by the artifact alone — no like-for-like rerun needed to dismiss it.
    spreads: dict[str, list[float]] = {}
    for name, q_reps in plan:
        fn = queries.get(name) or EXTRA_BENCH.get(name)
        if fn is None:
            continue
        samples = []
        for _ in range(q_reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
            # Release operator-persisted intermediates between runs (outside
            # the timed region): queries never reuse each other's caches, and
            # without this a full headline run accumulates every query's
            # blocks in one shared session.
            spark.catalog.clearCache()
            # Also drop the Python references to this rep's plan and force a
            # driver GC (r16 measurement hygiene, documented in
            # OPTIMIZATION_r16.md): localCheckpoint barriers register
            # block-manager RDDs that clearCache does NOT release — they are
            # freed only when the py4j proxies are collected and the
            # ContextCleaner runs. Without this, a 137-query run accumulates
            # every loop query's checkpoint blocks in executor memory and
            # the tail of the run measures GC pressure from earlier queries,
            # not the operator (isolated vs in-bench cold reps differed up
            # to 1.7x on the last headline entries). Timing methodology is
            # unchanged: this runs strictly OUTSIDE the timed region.
            del df
            gc.collect()
            if samples[0] > rep_skip:
                break
        # One JVM GC per query (not per rep — a full collection costs
        # ~0.1-0.5 s): SparkContext.persistentRdds holds the checkpoint
        # RDDs via WEAK values, so the async ContextCleaner frees their
        # blocks only after a JVM GC clears the refs — without this the
        # release lands inside the NEXT query's timed window.
        spark.sparkContext._jvm.System.gc()
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)
        spreads[name] = [round(samples[0], 3), round(samples[-1], 3), len(samples)]
        spread = (
            f" (min {samples[0]:.3f} max {samples[-1]:.3f})"
            if len(samples) > 1
            else ""
        )
        print(f"# {name}: {n} rows, median {times[name]:.3f}s{spread}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    # Host fingerprint (r05 verdict #8, extended r10 with the cpu model):
    # cross-round comparisons kept tripping over cold-VM vs warm-cache runs
    # and ~1.4x host-speed variation between VM instances; loadavg + uptime
    # + cpu model make the host state adjudicable from the JSON alone.
    try:
        cpu_model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    cpu_model = line.split(":", 1)[1].strip()
                    break
        load = round(os.getloadavg()[0], 2)
        host = {
            "loadavg_1m": load,
            "loadavg_start": loadavg_start,
            "uptime_sec": int(float(open("/proc/uptime").read().split()[0])),
            "cpus": os.cpu_count(),
            "cpu_model": cpu_model,
            # r13 verdict #7: round-over-round comparisons are only honest
            # between quiet-host captures; this bit makes the eligibility
            # machine-readable so comparison tooling can refuse loaded
            # artifacts instead of a human remembering to. Judged on the
            # PRE-SESSION sample (foreign load): the end-of-run loadavg is
            # dominated by the bench's own executor threads. Threshold
            # 2.0: the documented confounds appeared at foreign loadavg
            # 3.2-7.7, clean captures at <= ~1.
            "host_quiet": loadavg_start is not None and loadavg_start <= 2.0,
        }
    except OSError:
        host = {}
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
                "reps": reps,
                "host": host,
            }
        )
    )
    # Durable per-query record: the stdout capture window can clip the big
    # line, so every run also lands the full payload on disk next to the
    # harness (committed per-round as FULLBENCH_r{N}.json for --full runs).
    # "spread" carries per-query [min, max, n_samples] (r12 verdict #1a).
    payload = {
        "metric": "headline_total", "value": total, "unit": "sec",
        "queries": times, "spread": spreads, "sf": sf_dir, "reps": reps,
        "host": host, "full": full,
        # Execution order (sort_keys=True alphabetizes "queries"): required
        # for faithful --names-from replays — see the order note there.
        "order": [n for n, _ in plan],
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
    )
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError:
        pass  # a read-only checkout must not fail the bench
    # Per-query contract line (r15 verdict #8 / PERF extraction): the big
    # line above is clipped by the driver's stdout capture window, which
    # left PERF_r15's per_query/scaling blocks empty. This dedicated
    # one-line JSON carries ONLY the per-query map so the driver can diff
    # rounds without tail-parsing the composite line. Printed BEFORE the
    # final headline line so the short total line stays last (its parser
    # reads the last parseable line).
    print(
        json.dumps(
            {"metric": "per_query", "unit": "sec", "queries": times, "sf": sf_dir}
        )
    )
    # Truncation-proof summary (r10 verdict #8 / r11 verdict #1): the
    # driver's stdout capture window clips the big line above from both
    # ends, so BENCH_r10/r11 lost their headline totals ("parsed": null).
    # This short FINAL line always survives the capture and parses alone.
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(times),
                "sf": sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
