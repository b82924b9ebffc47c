#!/usr/bin/env python3
"""Scale probe: run the iterative/pipeline operators on synthetic inputs
10-100x the sf0.1 testdata to check the cost curves SCALE.md claims.

Inputs are generated distributively with ``spark.range`` + hash arithmetic
(never collected), so the probe exercises exactly the shuffles the real
operators use:

    python tools/scale_probe.py                 # default sizes
    python tools/scale_probe.py --edges 20e6 --docs 100e3

Prints one JSON line per probe with rows processed and wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def probe_bfs(spark, n_edges: int, n_vertices: int) -> dict:
    """Superstep BFS over a random digraph with |E| = n_edges."""
    from distributed_graph_database_simulation_spark.operators.graph_traversal import (
        bfs_levels,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id"), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    t0 = time.perf_counter()
    out = bfs_levels(spark, edges, [(1, 0)])
    reached = out.count()
    return {"probe": "bfs_superstep", "edges": n_edges, "vertices_reached": reached,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_cc(spark, n_edges: int, n_vertices: int) -> dict:
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    t0 = time.perf_counter()
    out = connected_components(spark, graphs, edges)
    n = out.count()
    return {"probe": "connected_components", "edges": n_edges, "labels": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_minhash(spark, n_docs: int, words_per_doc: int = 200) -> dict:
    """MinHash-LSH over a synthetic corpus with planted near-duplicates.

    Every 100th doc is a near-copy of its predecessor (same word stream,
    one perturbed token), so candidate generation has real work to find.
    """
    from distributed_graph_database_simulation_spark.operators import dedup

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # doc family: near-dup pairs share a family seed
        F.when(F.col("id") % 100 == 99, F.col("id") - 1).otherwise(F.col("id")).alias("fam"),
    )
    words = base.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("fam"), i), F.lit(5000)).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    sh = dedup._shingled(words)
    sigs = dedup._minhash_sigs(sh)
    n = sigs.count()
    sig_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    # full pipeline on a temp view-backed frame: reuse the internals directly
    from pyspark.storagelevel import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = dedup._minhash_sigs(sh)
    n_bands = dedup.N_PERM // dedup.LSH_ROWS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.slice(F.col("sig"), b * dedup.LSH_ROWS + 1, dedup.LSH_ROWS)
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n_cand = cand.count()
    sh.unpersist()
    return {"probe": "minhash_lsh", "docs": n_docs, "signatures": n,
            "sig_sec": sig_sec, "candidates": n_cand,
            "cand_sec": round(time.perf_counter() - t0, 2)}


def probe_pagerank(spark, n_edges: int, n_vertices: int, iterations: int = 5) -> dict:
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        pagerank,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    t0 = time.perf_counter()
    out = pagerank(spark, graphs, edges, iterations=iterations)
    n = out.count()
    return {"probe": "pagerank", "edges": n_edges, "vertices": n,
            "iterations": iterations, "sec": round(time.perf_counter() - t0, 2)}


def probe_label_propagation(spark, n_edges: int, n_vertices: int, iterations: int = 4) -> dict:
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        label_propagation,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(6)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    t0 = time.perf_counter()
    out = label_propagation(spark, graphs, edges, iterations=iterations)
    n = out.count()
    return {"probe": "label_propagation", "edges": n_edges, "vertices": n,
            "iterations": iterations, "sec": round(time.perf_counter() - t0, 2)}


def probe_shard_assign(spark, n_docs: int) -> dict:
    """Two-phase shard/order layout on a synthetic corpus: verifies the
    (shard, sub)-keyed rank + broadcast-offset recomposition produces dense
    per-shard positions at 100x the testdata row count, and reports the
    realized rank parallelism (distinct rank keys actually populated)."""
    import time

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        N_SHARDS,
        shard_assign_df,
    )

    t0 = time.perf_counter()
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    out = shard_assign_df(docs)
    stats = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("max_pos")
    )
    bad = stats.where(F.col("max_pos") != F.col("n") - 1).count()
    n = out.count()
    assert bad == 0, "positions not dense per shard"
    return {"probe": "shard_assign", "docs": n, "shards": N_SHARDS,
            "dense_positions": bad == 0,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_capped_common_neighbors(spark, n_background: int, hub_degree: int) -> dict:
    """Adversarial-skew link prediction: a graph with one degree-``hub_degree``
    hub vertex plus a uniform background. Uncapped CN would emit
    hub_degree^2/2 pairs through the hub key (~1.25e9 at 50k — the join that
    kills a cluster); the distribution-derived degree cap (p90 — the
    background dominates the vertex count, so the hub sits far above it)
    drops the hub key before the self-join, so the probe completing quickly
    IS the demonstration."""
    import time

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        _derived_degree_cap,
    )

    t0 = time.perf_counter()
    # background: ring + stride edges over 2..n; hub 0 connects to everything
    bg = spark.range(2, n_background, 1, 32).select(
        F.col("id").cast("int").alias("src"),
        ((F.col("id") * 7 + 3) % n_background).cast("int").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    hub = spark.range(1, hub_degree + 1, 1, 32).select(
        F.lit(0).cast("int").alias("src"),
        ((F.col("id") % (n_background - 1)) + 1).cast("int").alias("dst"),
    )
    e = bg.union(hub)
    ue = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    cap = _derived_degree_cap(ue)
    low = (
        ue.groupBy("dst").agg(F.count("*").alias("deg"))
        .where(F.col("deg").between(2, cap)).select("dst")
    )
    kept = ue.join(low, "dst")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, F.col("a.dst") == F.col("b.dst"))
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count("*").alias("cn"))
    )
    n = pairs.count()
    return {"probe": "capped_common_neighbors", "background_edges": n_background,
            "hub_degree": hub_degree, "cap": cap, "pairs": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_asof_and_sessions(spark, n_events: int, n_users: int = 100_000) -> dict:
    """Event-time operators at 10-100x the sf0.1 events table: gap-based
    sessionization (lag window over (user, ts)) and the union+last_value
    as-of join against a 10k-row quote table, on synthetic timestamps."""
    import time

    from pyspark.sql import Window, functions as F

    t0 = time.perf_counter()
    ev = spark.range(0, n_events, 1, 32).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + (F.col("id") * 37) % (86_400 * 30) * 1_000_000)
        ).alias("ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sessions = (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )
    n_sess = sessions.count()
    quotes = spark.range(0, 10_000, 1, 8).select(
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 250_000_000
        ).alias("q_ts"),
        (F.col("id") * 7 % 1000).alias("quote"),
    )
    tagged = ev.select(
        "user_id", F.col("ts"), F.lit(None).cast("long").alias("quote"), F.lit(1).alias("is_event")
    ).unionByName(
        quotes.select("user_id", F.col("q_ts").alias("ts"), "quote", F.lit(0).alias("is_event"))
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    asof = (
        tagged.withColumn("last_quote", F.last("quote", ignorenulls=True).over(w2))
        .where(F.col("is_event") == 1)
    )
    n_asof = asof.count()
    return {"probe": "asof_and_sessions", "events": n_events,
            "session_rows": n_sess, "asof_rows": n_asof,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_cosine_router(spark, n_vectors: int, dim: int) -> dict:
    """Route a 1M x 256-dim-class synthetic corpus through the exact-cosine
    router WITHOUT executing the O(n^2) job: the point is that the router's
    decisions (byte-gate, replication ceiling, refusal) are taken from
    metadata-only jobs (count + one-row dim read), so they stay O(1) at any
    corpus size. Also times the prefiltered route's CANDIDATE stage — the
    part whose shuffle must stay narrow — on a 100k slice."""
    from distributed_graph_database_simulation_spark.operators import dedup

    t0 = time.perf_counter()
    emb = spark.range(n_vectors).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0),
        ).alias("e"),
    )
    est_bytes = n_vectors * (8 + dim * 8)
    routed = "broadcast"
    try:
        plan = dedup._cosine_route(spark, emb)._jdf.queryExecution().executedPlan().toString()
        if "FlatMapGroupsInPandas" in plan:
            routed = "blocked"
    except ValueError:
        routed = "refused"
    route_sec = round(time.perf_counter() - t0, 2)
    # prefiltered route on a 50k slice (filter, NOT limit — limit collapses
    # to one partition): banding stays narrow, bits scale with the slice
    t1 = time.perf_counter()
    slice_df = emb.where(F.col("vec_id") < 50_000)
    pairs = dedup.dedup_embedding_cosine_prefiltered(spark, slice_df)
    n_pairs = pairs.count()
    return {"probe": "cosine_router", "vectors": n_vectors, "dim": dim,
            "est_bytes": est_bytes, "routed": routed, "route_sec": route_sec,
            "prefiltered_slice_pairs": n_pairs,
            "prefiltered_sec": round(time.perf_counter() - t1, 2)}


def probe_prefiltered_cosine(spark, n_vectors: int = 1_000_000, dim: int = 64,
                             planted_every: int = 1_000) -> dict:
    """Run the FULL >1M-route (candidate generation + exact verification) at
    its design scale — the r05 verdict's missing evidence. Every
    ``planted_every``-th vector is a near-copy of its predecessor (tiny
    deterministic perturbation -> cosine ~1), so recall on the target
    near-identical regime is measurable, and the candidate count must stay
    ~O(n): with bits = ceil(log2 n) the expected random-collision mass is
    n^2 * tables / 2^bits ~ n * tables. Reports candidates/vector so a
    regression to quadratic candidate growth is a number, not a timeout."""
    import time as _t

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators import dedup
    from distributed_graph_database_simulation_spark.operators.similarity import (
        _signatures,
        _with_norm,
    )

    t0 = _t.perf_counter()
    base_of = (F.col("vec_id") - F.when(
        F.col("vec_id") % planted_every == 1, F.lit(1)
    ).otherwise(F.lit(0)))
    emb = spark.range(n_vectors).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(base_of, i), F.lit(1000)) / 500.0 - 1.0
                # perturbation only on the planted copies, only on dim 1
                + F.when(
                    (F.col("vec_id") % planted_every == 1) & (i == 1), F.lit(1e-3)
                ).otherwise(F.lit(0.0))
            ),
        ).alias("e"),
    )
    # candidate-stage count (the part whose growth must be linear)
    import math

    bits = min(24, max(8, math.ceil(math.log2(n_vectors))))
    sig = _signatures(_with_norm(emb), tables=4, bits=bits).select(
        "vec_id", "table_id", "bucket"
    )
    n_cand = (
        sig.alias("a")
        .join(sig.alias("b"), ["table_id", "bucket"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    cand_sec = round(_t.perf_counter() - t0, 2)
    t1 = _t.perf_counter()
    pairs = dedup.dedup_embedding_cosine_prefiltered(spark, emb)
    planted = pairs.where(
        (F.col("vec_b") == F.col("vec_a") + 1)
        & (F.col("vec_b") % planted_every == 1)
    ).count()
    # ids i in [0, n) with i % planted_every == 1 (each the copy of i-1)
    expected = (n_vectors - 2) // planted_every + 1 if n_vectors >= 2 else 0
    verify_sec = round(_t.perf_counter() - t1, 2)
    return {"probe": "prefiltered_cosine_full", "vectors": n_vectors, "dim": dim,
            "bits": bits, "candidates": n_cand,
            "candidates_per_vector": round(n_cand / n_vectors, 2),
            "cand_sec": cand_sec,
            "planted_recalled": planted, "planted_expected": expected,
            "verify_sec": verify_sec}


def probe_temporal_reachability(spark, n_edges: int = 2_000_000,
                                n_vertices: int = 200_000,
                                n_sources: int = 4,
                                ts_mod: int = 64) -> dict:
    """Earliest-arrival reachability on a synthetic temporal digraph at
    ~100x the bench graph: k sources advance simultaneously, each
    superstep one keyed join + one partial-aggregated min. The claim
    under test is that state stays k x |reached| keyed rows and the loop
    terminates in few supersteps even with 64 distinct timestamps (the
    min fixpoint converges on arrival times, not on walk enumeration)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        temporal_reachability,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(n_vertices)).cast("int").alias("dst"),
        F.pmod(F.xxhash64("id", F.lit(13)), F.lit(ts_mod)).cast("bigint").alias("ts"),
    )
    sources = spark.createDataFrame(
        [(1, s * 37 % n_vertices, 0) for s in range(n_sources)],
        "graph_id int, source int, t0 bigint",
    )
    t0 = _t.perf_counter()
    out = temporal_reachability(spark, edges, sources)
    n = out.count()
    return {"probe": "temporal_reachability", "edges": n_edges,
            "vertices": n_vertices, "sources": n_sources,
            "reached_rows": n, "sec": round(_t.perf_counter() - t0, 2)}


def probe_keyed_store_merge(spark, n_rows: int = 5_000_000,
                            n_update_keys: int = 10_000,
                            n_buckets: int = 256) -> dict:
    """MERGE cost model at scale: load an n_rows keyed store, then upsert
    n_update_keys rows clustered into FEW buckets. The claim under test is
    bucket-proportionality — the upsert must touch only the affected
    partition directories and cost a fraction of the full load, not a
    table rewrite. Update keys are chosen to land in ~8 buckets (k % a
    small residue class), so touched/total buckets is the measured
    pruning."""
    import shutil
    import tempfile
    import time as _t

    from distributed_graph_database_simulation_spark.sources.keyed_store import (
        KeyedParquetStore,
    )

    base = tempfile.mkdtemp(prefix="probe_keyed_store_")
    try:
        store = KeyedParquetStore(
            spark, f"{base}/t", "k", n_buckets=n_buckets, version_col="ver"
        )
        rows = spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("val"),
            F.lit(1).alias("ver"),
        )
        t0 = _t.perf_counter()
        store.write_full(rows)
        load_sec = round(_t.perf_counter() - t0, 2)
        # cluster the update keys into few buckets: filter by bucket id
        upd = (
            spark.range(n_rows)
            .select(F.col("id").alias("k"))
            .where(F.pmod(F.xxhash64("k"), F.lit(n_buckets)) < 8)
            .limit(n_update_keys)
            .select("k", F.lit("updated").alias("val"), F.lit(2).alias("ver"))
        )
        t1 = _t.perf_counter()
        stats = store.upsert(upd)
        upsert_sec = round(_t.perf_counter() - t1, 2)
        n_updated = store.read().where(F.col("ver") == 2).count()
        if stats["buckets_touched"] > 8:
            raise AssertionError(
                f"expected <= 8 touched buckets, got {stats['buckets_touched']}"
            )
        return {"probe": "keyed_store_merge", "rows": n_rows,
                "update_keys": n_update_keys, "n_buckets": n_buckets,
                "buckets_touched": stats["buckets_touched"],
                "rows_updated": n_updated,
                "full_load_sec": load_sec, "upsert_sec": upsert_sec}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_dup_spans(spark, n_docs: int, boiler_every: int = 10) -> dict:
    """Substring-level dedup on a synthetic corpus: every ``boiler_every``-th
    doc carries the same 12-word boilerplate block inside otherwise-unique
    text. Verifies the gram-count -> semi-join -> interval-merge pipeline
    finds exactly one span per planted doc at 100x-bench corpus sizes, with
    the corpus generated distributively (never collected)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.dedup import (
        dup_spans_df,
    )

    t0 = _t.perf_counter()
    boiler = " ".join(f"boiler{i}" for i in range(12))
    # 28 unique filler words per doc: 'u<doc*37+i>' over a large modulus --
    # collisions across docs are possible but a shared 8-gram needs 8
    # *consecutive* collisions, probability ~0.
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(27)),
            lambda i: F.concat(
                F.lit("u"), ((F.col("id") * 37 + i) % F.lit(10_000_000_000)).cast("string")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % boiler_every == 0,
            F.concat(F.lit(boiler + " "), filler),
        )
        .otherwise(filler)
        .alias("text"),
    )
    spans = dup_spans_df(docs)
    n_spans = spans.count()
    planted = -(-n_docs // boiler_every)  # ceil: ids 0, boiler_every, ...
    if n_spans != planted:
        raise AssertionError(f"expected {planted} spans, got {n_spans}")
    return {"probe": "dup_spans", "docs": n_docs, "spans": n_spans,
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_exact_substring(spark, n_docs: int, planted_every: int = 10) -> dict:
    """Exact-substring dedup (the >=50-token suffix-array contract) on a
    synthetic corpus: every ``planted_every``-th doc opens with the SAME
    60-token run (cross-doc duplicated), the rest of every doc is unique
    filler. Verifies the 50-gram anchor -> distinct-doc count -> semi-join
    -> interval-merge pipeline recovers EXACTLY one 60-token span per
    planted doc, and that cost is candidate-proportional: the semi-join
    fan-out is 11 anchor positions per planted doc (positions 0..10 of the
    run), never corpus-quadratic. Corpus generated distributively."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.dedup import (
        EXACT_SUBSTR_TOKENS,
        dup_spans_df,
    )

    t0 = _t.perf_counter()
    run = " ".join(f"boiler{i}" for i in range(60))
    # 70 unique filler words per doc (u<doc*37+i>, same uniqueness argument
    # as probe_dup_spans: a shared 50-gram needs 50 consecutive collisions)
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(69)),
            lambda i: F.concat(
                F.lit("u"), ((F.col("id") * 37 + i) % F.lit(10_000_000_000)).cast("string")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % planted_every == 0,
            F.concat(F.lit(run + " "), filler),
        )
        .otherwise(filler)
        .alias("text"),
    )
    spans = dup_spans_df(
        docs, k=EXACT_SUBSTR_TOKENS, min_occurrences=2, cross_doc=True
    )
    got = spans.agg(
        F.count("*").alias("n"),
        F.min(F.col("span_end") - F.col("span_start") + 1).alias("lo"),
        F.max(F.col("span_end") - F.col("span_start") + 1).alias("hi"),
    ).collect()[0]
    planted = -(-n_docs // planted_every)
    if got.n != planted or got.lo != 60 or got.hi != 60:
        raise AssertionError(
            f"expected {planted} spans of exactly 60 tokens, got "
            f"n={got.n} lo={got.lo} hi={got.hi}"
        )
    return {"probe": "exact_substring", "docs": n_docs, "spans": got.n,
            "candidate_positions": planted * 11,
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_bpe(spark, n_docs: int, words_per_doc: int = 60) -> dict:
    """BPE tokenizer throughput: encode a distributively-generated corpus
    (words drawn from the real 31-word vocabulary, so the checked-in
    merges actually fire) through the word-local pair-merge kernel. The
    invariant is structural: every word contributes exactly one
    end-of-word-marked token, so sum over docs of words == total '#'
    tokens; and n_bpe >= words_per_doc for every doc."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        bpe_encode_df,
    )

    t0 = _t.perf_counter()
    vocab = [
        "scan", "column", "window", "order", "sort", "part", "agg", "value",
        "line", "key", "join", "merge", "query", "group", "a", "vector",
        "hash", "slow", "stream", "filter", "fast", "the", "spark", "batch",
        "table", "small", "data", "big", "customer", "row", "dup",
    ]
    varr = F.array(*[F.lit(w) for w in vocab])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.element_at(
                varr, ((F.col("id") * 7919 + i * 104729) % len(vocab) + 1).cast("int")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    enc = bpe_encode_df(docs)
    got = enc.agg(
        F.count("*").alias("n"),
        F.sum("n_bpe").alias("toks"),
        F.min("n_bpe").alias("lo"),
    ).collect()[0]
    if got.n != n_docs or got.lo < words_per_doc:
        raise AssertionError(f"bad encode: n={got.n} lo={got.lo}")
    sec = _t.perf_counter() - t0
    return {"probe": "bpe", "docs": n_docs, "bpe_tokens": int(got.toks),
            "tokens_per_sec": int(got.toks / sec), "sec": round(sec, 2)}


def probe_interleave_pack(spark, n_docs: int, words_per_doc: int = 60) -> dict:
    """The interleave -> BPE-pack -> segments composition at 10-100x bench
    corpus size (distributively generated, real-vocab words so the merges
    fire). Invariants: packed token mass equals the encoder's corpus total
    (nothing lost/duplicated by the vt-bucketed cumsum recomposition), and
    the per-lang doc counts survive the interleave (weights only reorder,
    never drop, for langs present in the weight table)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        INTERLEAVE_WEIGHTS,
        interleave_pack_segments_df,
    )
    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        bpe_encode_df,
    )

    t0 = _t.perf_counter()
    vocab = [
        "scan", "column", "window", "order", "sort", "part", "agg", "value",
        "line", "key", "join", "merge", "query", "group", "a", "vector",
        "hash", "slow", "stream", "filter", "fast", "the", "spark", "batch",
        "table", "small", "data", "big", "customer", "row", "dup",
    ]
    varr = F.array(*[F.lit(w) for w in vocab])
    langs = sorted(INTERLEAVE_WEIGHTS)
    larr = F.array(*[F.lit(la) for la in langs])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.element_at(
                varr, ((F.col("id") * 7919 + i * 104729) % len(vocab) + 1).cast("int")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.element_at(larr, (F.col("id") % len(langs) + 1).cast("int")).alias("lang"),
        text.alias("text"),
    )
    segs = interleave_pack_segments_df(docs, INTERLEAVE_WEIGHTS)
    got = segs.agg(
        F.sum(F.col("seg_end") - F.col("seg_start") + 1).alias("mass"),
        F.countDistinct("doc_id").alias("docs"),
        F.max("seq_id").alias("max_seq"),
    ).collect()[0]
    want = bpe_encode_df(docs).agg(F.sum("n_bpe")).collect()[0][0]
    if int(got.mass) != int(want) or int(got.docs) != n_docs:
        raise AssertionError(f"mass {got.mass} != {want} or docs {got.docs}")
    sec = _t.perf_counter() - t0
    return {"probe": "interleave_pack", "docs": n_docs,
            "packed_tokens": int(got.mass), "sequences": int(got.max_seq) + 1,
            "sec": round(sec, 2)}


def probe_cdc_chunks(spark, n_docs: int, words_per_doc: int = 40) -> dict:
    """Content-defined chunking at 100x-bench corpus size, generated
    distributively. Invariants: chunk token mass equals corpus token mass
    (no token lost or duplicated across boundaries) and every doc yields
    >= 1 chunk."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        cdc_chunks_df,
    )

    t0 = _t.perf_counter()
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.concat(
                F.lit("w"), ((F.col("id") * 131 + i * 7) % F.lit(99_991)).cast("string")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    out = cdc_chunks_df(docs)
    agg = out.groupBy().agg(
        F.count("*").alias("chunks"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("doc_id").alias("docs"),
    ).collect()[0]
    if agg["tokens"] != n_docs * words_per_doc:
        raise AssertionError(
            f"token mass {agg['tokens']} != {n_docs * words_per_doc}"
        )
    if agg["docs"] != n_docs:
        raise AssertionError(f"docs with chunks {agg['docs']} != {n_docs}")
    return {"probe": "cdc_chunks", "docs": n_docs, "chunks": int(agg["chunks"]),
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_bigram_lm(spark, n_docs: int, words_per_doc: int = 40) -> dict:
    """Interpolated bigram LM at 100x-bench corpus size. The vocabulary is
    ~100k distinct words and the bigram table is corpus-length-bounded;
    invariant: every doc scores, token counts conserved."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        bigram_logprob_df,
    )

    t0 = _t.perf_counter()
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.concat(
                F.lit("w"), ((F.col("id") * 61 + i * 13) % F.lit(100_003)).cast("string")
            ),
        ),
        " ",
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    out = bigram_logprob_df(docs)
    agg = out.groupBy().agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).collect()[0]
    if agg["docs"] != n_docs or agg["tokens"] != n_docs * words_per_doc:
        raise AssertionError(f"coverage mismatch: {dict(agg.asDict())}")
    return {"probe": "bigram_lm", "docs": n_docs,
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_pack_sequences(spark, n_chunks: int) -> dict:
    """Concat-and-split packing at 1000x the sf0.01 chunk count: verifies
    offsets stay in range and token mass is conserved per shard while the
    cumsum runs per (shard, sub)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        SEQ_LEN,
        pack_sequences_df,
    )

    t0 = _t.perf_counter()
    chunks = spark.range(0, n_chunks, 1, 32).select(
        (F.col("id") / 4).cast("bigint").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("chunk_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(64)) + 1).cast("int").alias("n_tokens"),
    )
    packed = pack_sequences_df(chunks)
    stats = packed.agg(
        F.count("*").alias("n"),
        F.min("seq_offset").alias("min_off"),
        F.max("seq_offset").alias("max_off"),
        F.sum("n_tokens").alias("tok"),
    ).first()
    if not (stats["n"] == n_chunks and 0 <= stats["min_off"] and stats["max_off"] < SEQ_LEN):
        raise AssertionError(f"packing invariants violated: {stats}")
    per_shard = packed.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok"), F.max("seq_id").alias("max_seq")
    )
    bad = per_shard.where(F.col("max_seq") > F.col("tok") / SEQ_LEN).count()
    if bad:
        raise AssertionError("seq_id exceeded token mass bound")
    # Segment stage (r12): the attention-segmentation table must TILE
    # every sequence — per (shard, seq_id), segment lengths sum to SEQ_LEN
    # for all but the final ragged sequence per shard, and the global
    # segment token mass equals the chunk token mass exactly.
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        pack_segments_df,
    )

    t1 = _t.perf_counter()
    segs = pack_segments_df(packed)
    seg_stats = segs.agg(
        F.count("*").alias("n_segs"),
        F.sum(F.col("seg_end") - F.col("seg_start") + 1).alias("seg_tok"),
    ).first()
    if seg_stats["seg_tok"] != stats["tok"]:
        raise AssertionError(
            f"segment mass {seg_stats['seg_tok']} != chunk mass {stats['tok']}"
        )
    full_bad = (
        segs.groupBy("shard", "seq_id")
        .agg(F.sum(F.col("seg_end") - F.col("seg_start") + 1).alias("cov"))
        .join(per_shard.select("shard", "max_seq"), "shard")
        .where((F.col("seq_id") < F.col("max_seq")) & (F.col("cov") != SEQ_LEN))
        .count()
    )
    if full_bad:
        raise AssertionError(f"{full_bad} non-final sequences not fully tiled")
    return {"probe": "pack_sequences", "chunks": n_chunks,
            "tokens": int(stats["tok"]), "segments": int(seg_stats["n_segs"]),
            "sec": round(t1 - t0, 2),
            "segments_sec": round(_t.perf_counter() - t1, 2)}


def probe_cap_per_source(spark, n_docs: int, n_hot: int = 3) -> dict:
    """Per-source admission cap under adversarial skew: ``n_hot`` sources
    own 90% of the corpus. Verifies the (source, sub)-bucketed rank admits
    exactly ``cap`` docs from each hot source without a single-task
    per-source sort."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        cap_per_source_df,
    )

    t0 = _t.perf_counter()
    cap = 1000
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 < 9, F.concat(F.lit("hot"), (F.col("id") % n_hot)).cast("string")
        )
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 10_000)).cast("string"))
        .alias("source"),
    )
    kept = cap_per_source_df(docs, cap)
    per_hot = (
        kept.where(F.col("source").startswith("hot")).groupBy("source").count().collect()
    )
    if len(per_hot) != n_hot or any(r["count"] != cap for r in per_hot):
        raise AssertionError(f"hot sources not capped exactly: {per_hot}")
    n_kept = kept.count()
    return {"probe": "cap_per_source", "docs": n_docs, "kept": n_kept,
            "hot_sources": n_hot, "cap": cap,
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_multi_source_bfs(spark, n_edges: int, n_vertices: int, k: int = 4) -> dict:
    """k-landmark BFS in one superstep loop over a random digraph: state is
    k x |reached| keyed rows; wall should track the single-source probe times
    a small constant, not k sequential BFS runs."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        multi_source_bfs,
    )

    t0 = _t.perf_counter()
    # xxhash edge endpoints (same construction as probe_bfs): affine/LCG
    # endpoints would collapse to a one-out-edge functional graph whose
    # diameter is O(|V|) — a pathological superstep count, not a scale test.
    edges = spark.range(0, n_edges, 1, 32).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(21)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(22)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    sources = spark.createDataFrame(
        [(1, i * (n_vertices // k)) for i in range(k)], "graph_id INT, source INT"
    )
    out = multi_source_bfs(spark, edges, sources)
    per_source = out.groupBy("source").count().collect()
    if len(per_source) != k or any(r["count"] < n_vertices // 2 for r in per_source):
        raise AssertionError(f"landmark coverage collapsed: {per_source}")
    return {"probe": "multi_source_bfs", "edges": n_edges, "vertices": n_vertices,
            "k": k, "reached_rows": sum(r["count"] for r in per_source),
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_scc(spark, n_cycles: int = 20_000, cycle_len: int = 10) -> dict:
    """SCC on a corpus of many small cycles (the many-components regime):
    20k disjoint directed cycles = 20k nontrivial SCCs found by ONE
    backward sweep from 20k roots simultaneously. Color propagation cost is
    O(cycle_len) supersteps — the known coloring-SCC constraint (one long
    cycle would cost O(|C|) supersteps; that regime wants the per-graph
    kernel path instead, same two-regimes split as CC)."""
    import time as _t

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        strongly_connected_components,
    )

    t0 = _t.perf_counter()
    n = n_cycles * cycle_len
    ids = spark.range(0, n, 1, 32)
    edges = ids.select(
        F.lit(1).alias("graph_id"),
        F.col("id").cast("int").alias("src"),
        (
            (F.col("id") - F.col("id") % cycle_len)
            + (F.col("id") + 1) % cycle_len
        ).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n)], "graph_id INT, n INT")
    out = strongly_connected_components(spark, graphs, edges)
    sizes = out.groupBy("scc_id").count()
    n_sccs = sizes.count()
    bad = sizes.where(F.col("count") != cycle_len).count()
    if n_sccs != n_cycles or bad:
        raise AssertionError(f"expected {n_cycles} SCCs of size {cycle_len}: got {n_sccs}, bad={bad}")
    return {"probe": "scc", "vertices": n, "sccs": n_sccs,
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_hyperball(spark, n_edges: int, n_vertices: int) -> dict:
    """Neighborhood function over a random digraph: supersteps ~ effective
    diameter (log |V| for random graphs), state bounded m rows/vertex. The
    converged N(t) must land at least at |reached pairs of the giant
    component| scale — sanity: >= |V| (every ball holds its own vertex)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        hyperball,
    )

    t0 = _t.perf_counter()
    edges = spark.range(0, n_edges, 1, 32).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(31)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(32)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    nf = hyperball(spark, graphs, edges).collect()
    t_max = max(r.t for r in nf)
    final = max(r.nf_est for r in nf)
    if final < n_vertices:
        raise AssertionError(f"converged N(t)={final} below |V|={n_vertices}")
    return {"probe": "hyperball", "edges": n_edges, "vertices": n_vertices,
            "t_converged": t_max, "nf_final": round(final),
            "sec": round(_t.perf_counter() - t0, 2)}


def probe_random_walks_hub(spark, n_vertices: int, walk_length: int = 6) -> dict:
    """Walks over a graph with a full-fan hub (hub -> EVERY vertex, every
    vertex -> hub): a neighbor-replicating step would ship |V| candidate
    rows per walk touching the hub (~|V|^2/2 total); the rank-lookup step
    ships one row per walk per step, so this must complete in seconds and
    emit exactly (walk_length+1) rows per start (no sinks anywhere)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        random_walks,
    )

    t0 = _t.perf_counter()
    ids = spark.range(0, n_vertices, 1, 32).select(F.col("id").cast("int").alias("v"))
    hub = 0
    edges = (
        ids.select(F.lit(1).alias("graph_id"), F.lit(hub).alias("src"), F.col("v").alias("dst"))
        .union(ids.select(F.lit(1), F.col("v"), F.lit(hub)))
        .union(ids.select(F.lit(1), F.col("v"), ((F.col("v") + 1) % n_vertices)))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    out = random_walks(spark, graphs, edges, walk_length=walk_length)
    n_rows = out.count()
    expected = n_vertices * (walk_length + 1)
    if n_rows != expected:
        raise AssertionError(f"expected {expected} walk rows, got {n_rows}")
    return {"probe": "random_walks_hub", "vertices": n_vertices,
            "walk_rows": n_rows, "sec": round(_t.perf_counter() - t0, 2)}


def probe_node2vec(spark, n_vertices: int, degree: int = 8,
                   walk_length: int = 6) -> dict:
    """node2vec walks over a bounded-degree random digraph (outdeg ~= 8).

    The kernel's one-time transition table costs O(sum indeg*outdeg) — the
    standard node2vec alias-table preprocessing — so a degree-bounded graph
    is the honest regime (the kernel's own docstring routes power-law hubs
    to degree caps / rejection sampling). Expect table ~ |V|*degree^2 rows
    and one keyed join per step afterwards."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        node2vec_walks,
    )

    t0 = _t.perf_counter()
    edges = (
        spark.range(0, n_vertices, 1, 32)
        .select(
            F.col("id").cast("int").alias("src"),
            F.explode(F.sequence(F.lit(0), F.lit(degree - 1))).alias("k"),
        )
        .select(
            F.lit(1).alias("graph_id"),
            "src",
            F.pmod(F.xxhash64("src", "k", F.lit(3)), F.lit(n_vertices))
            .cast("int")
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    out = node2vec_walks(spark, graphs, edges, walk_length=walk_length)
    n_rows = out.count()
    return {"probe": "node2vec", "vertices": n_vertices, "degree": degree,
            "walk_rows": n_rows, "sec": round(_t.perf_counter() - t0, 2)}


def probe_simrank(spark, n_vertices: int = 300, degree: int = 6,
                  in_cap: int = 10) -> dict:
    """Capped SimRank at the documented upper regime: dense n^2 pair state
    (the algorithm's own memory model). Contribution volume per iteration
    is (sum of capped in-list memberships)^2 — with n=300, cap=10 that is
    ~9M joined rows per iteration, the honest cost the kernel docstring
    bounds (beyond ~10^4 vertices use sampling/single-source variants)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_ml import (
        simrank,
    )

    t0 = _t.perf_counter()
    edges = (
        spark.range(0, n_vertices, 1, 32)
        .select(
            F.col("id").cast("int").alias("src"),
            F.explode(F.sequence(F.lit(0), F.lit(degree - 1))).alias("k"),
        )
        .select(
            F.lit(1).alias("graph_id"),
            "src",
            F.pmod(F.xxhash64("src", "k", F.lit(11)), F.lit(n_vertices))
            .cast("int")
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    out = simrank(spark, graphs, edges, iterations=3, in_cap=in_cap)
    n_rows = out.count()
    return {"probe": "simrank", "vertices": n_vertices, "degree": degree,
            "sim_pairs": n_rows, "sec": round(_t.perf_counter() - t0, 2)}


def probe_matching(spark, n_edges: int, n_vertices: int) -> dict:
    """Local-max maximal matching on a uniform random graph ~10-100x the
    testdata scale graph (r07 verdict #6: both priority-race loops need a
    measured round count under growth — the loop is O(log m) EXPECTED, and
    round count is the multiplier on every per-round shuffle at 100 TB)."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        maximal_matching,
    )

    edges = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(21)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(22)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    t0 = time.perf_counter()
    out = maximal_matching(spark, graphs, edges)
    agg = out.groupBy().agg(
        F.count("*").alias("matched"), F.max("round").alias("rounds")
    ).collect()[0]
    return {
        "probe": "maximal_matching", "edges": n_edges, "vertices": n_vertices,
        "matched_edges": agg["matched"], "rounds": agg["rounds"],
        "sec": round(time.perf_counter() - t0, 2),
    }


def probe_densest(spark, n_edges: int, n_vertices: int, core_v: int = 2_000) -> dict:
    """Densest-subgraph peeling on a planted-core graph (dense ~core_v-vertex
    near-clique inside a sparse periphery — a uniform graph peels in one
    round, which would measure nothing). Reports peel rounds + whether the
    best prefix recovered the core."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        densest_subgraph,
    )

    periphery = spark.range(n_edges).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(31)), F.lit(n_vertices)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(32)), F.lit(n_vertices)).cast("int").alias("dst"),
    )
    core = spark.range(n_edges // 10).select(
        F.lit(1).alias("graph_id"),
        F.pmod(F.xxhash64("id", F.lit(33)), F.lit(core_v)).cast("int").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(34)), F.lit(core_v)).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    t0 = time.perf_counter()
    out = densest_subgraph(spark, graphs, periphery.unionByName(core))
    agg = out.groupBy().agg(
        F.max("peel_round").alias("rounds"),
        F.sum(F.col("in_densest").cast("int")).alias("densest_size"),
    ).collect()[0]
    return {
        "probe": "densest_subgraph", "edges": n_edges + n_edges // 10,
        "vertices": n_vertices, "core_vertices": core_v,
        "rounds": agg["rounds"], "densest_size": agg["densest_size"],
        "sec": round(time.perf_counter() - t0, 2),
    }


def probe_ann_topk(spark, n_vectors: int = 1_000_000, dim: int = 64) -> dict:
    """ANN top-10 (LSH and IVF library paths) at 1M x 64-dim — the query
    serving shape, complementing probe_prefiltered_cosine's pair-finding
    shape. Both ride the r09 Arrow matmul kernels (signatures / centroid
    ranks); what this measures at scale is the bucket-probe candidate
    volume (LSH) and the k-means training passes (IVF), the two costs that
    grow with the corpus."""
    from distributed_graph_database_simulation_spark.operators.similarity import (
        _quantized_view,
        _with_norm,
        topk_ivf_df,
        topk_lsh_df,
        topk_pq_df,
    )

    emb = spark.range(n_vectors).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.pmod(F.xxhash64("id", i), F.lit(1000)) / 500.0 - 1.0,
        ).alias("e"),
    )
    corpus = _with_norm(emb)
    queries = corpus.filter(F.col("vec_id") < 8)
    t0 = time.perf_counter()
    # 16-bit buckets at 1M: expected probe-side candidates/query ~
    # tables * n / 2^bits ~ 8 * 1M / 65536 ~ 122 — bounded re-rank work.
    lsh = topk_lsh_df(corpus, queries, bits=16).count()
    lsh_sec = round(time.perf_counter() - t0, 2)
    t1 = time.perf_counter()
    ivf = topk_ivf_df(_quantized_view(emb), query_filter=F.col("vec_id") < 8).count()
    ivf_sec = round(time.perf_counter() - t1, 2)
    t2 = time.perf_counter()
    pq = topk_pq_df(_quantized_view(emb), query_filter=F.col("vec_id") < 8).count()
    pq_sec = round(time.perf_counter() - t2, 2)
    return {
        "probe": "ann_topk", "vectors": n_vectors, "dim": dim,
        "lsh_rows": lsh, "lsh_sec": lsh_sec,
        "ivf_rows": ivf, "ivf_sec": ivf_sec,
        "pq_rows": pq, "pq_sec": pq_sec,
    }


def probe_contraction_cc_path(spark, n_vertices: int) -> dict:
    """Contraction CC on a PATH of n vertices — diameter n, the regime
    where min-label propagation needs n supersteps and contraction needs
    O(log n) rounds. Completing at all inside max_rounds=40 proves the
    logarithmic round count; the answer is one component rooted at 0."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        connected_components_contraction,
    )

    t0 = _t.perf_counter()
    edges = spark.range(0, n_vertices - 1, 1, 32).select(
        F.lit(1).alias("graph_id"),
        F.col("id").cast("int").alias("src"),
        (F.col("id") + 1).cast("int").alias("dst"),
    )
    graphs = spark.createDataFrame([(1, n_vertices)], "graph_id INT, n INT")
    out = connected_components_contraction(spark, graphs, edges, max_rounds=40)
    comps = out.select("component").distinct().count()
    if comps != 1:
        raise AssertionError(f"path should be one component, got {comps}")
    return {"probe": "contraction_cc_path", "vertices": n_vertices,
            "components": comps, "sec": round(_t.perf_counter() - t0, 2)}


def probe_skyline(spark, n_rows: int) -> dict:
    """Two-regime skyline probe (r09 verdict #8 — the broadcast-frontier
    assumption was the one untested scale claim).

    Regime A (uniform dims): frontier is O(log n) expected — the routed
    entry must take the broadcast path and the survivor count stays tiny.
    Regime B (anti-correlated diagonal + dominated noise): the TRUE
    frontier is ~n/2 — far past SKYLINE_BROADCAST_CAP — so the router must
    take the sort-based global sweep and still return the exact frontier
    (spot-checked: diagonal size == expected, no noise row survives)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.relational import (
        _skyline_local_prune,
        skyline_routed_df,
    )

    # A: independent uniform dims
    uni = spark.range(0, n_rows, 1, 32).select(
        F.col("id").alias("p_partkey"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("int").alias("p_size"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)) / 100.0).alias(
            "p_retailprice"
        ),
    )
    t0 = _t.perf_counter()
    local_n = _skyline_local_prune(uni).count()
    n_uni = skyline_routed_df(spark, uni).count()
    sec_uni = round(_t.perf_counter() - t0, 2)
    spark.catalog.clearCache()

    # B: anti-correlated — every even id is on the diagonal (price=id,
    # size=id), every odd id is dominated noise one step inside it
    half = n_rows // 2
    anti = spark.range(0, n_rows, 1, 32).select(
        F.col("id").alias("p_partkey"),
        F.when(F.col("id") % 2 == 0, (F.col("id") / 2))
        .otherwise((F.col("id") - 1) / 2 - 1)
        .cast("int")
        .alias("p_size"),
        F.when(F.col("id") % 2 == 0, (F.col("id") / 2).cast("double"))
        .otherwise(((F.col("id") - 1) / 2).cast("double") + 0.5)
        .alias("p_retailprice"),
    )
    t0 = _t.perf_counter()
    out = skyline_routed_df(spark, anti)
    n_anti = out.count()
    sec_anti = round(_t.perf_counter() - t0, 2)
    spark.catalog.clearCache()
    if n_anti != half:
        raise AssertionError(f"anti-correlated frontier: want {half}, got {n_anti}")
    return {"probe": "skyline", "rows": n_rows,
            "uniform_local_frontier": local_n, "uniform_skyline": n_uni,
            "uniform_sec": sec_uni,
            "anti_skyline": n_anti, "anti_sec": sec_anti,
            "anti_path": "sorted_global_fallback"}


def probe_retention_cohorts(spark, n_events: int, n_users: int = 1_000_000,
                            n_days: int = 60) -> dict:
    """Retention-cohort probe (r09 verdict #8): the collect_set day-span
    bound is the one stateful claim — per-user state is AT MOST n_days
    longs regardless of event count. 10M events over 1M users x 60 days,
    one corpus shuffle; checks output cardinality <= days^2/2 + days."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.relational import (
        RETENTION_BUCKET_SECONDS,
    )

    ev = spark.range(0, n_events, 1, 32).select(
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_users)).alias("user_id"),
        (
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(n_days * RETENTION_BUCKET_SECONDS))
        ).cast("timestamp").alias("ts"),
    )
    day = F.floor(F.col("ts").cast("double") / F.lit(float(RETENTION_BUCKET_SECONDS)))
    t0 = _t.perf_counter()
    per_user = (
        ev.select("user_id", day.cast("bigint").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    out = (
        per_user.select(
            F.array_min("days").alias("cohort_day"), F.explode("days").alias("day")
        )
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_day"))
        .agg(F.count("*").alias("n_users"))
    )
    n = out.count()
    max_state = per_user.select(F.max(F.size("days"))).first()[0]
    sec = round(_t.perf_counter() - t0, 2)
    if n > n_days * (n_days + 1):
        raise AssertionError(f"retention cardinality blew past days^2: {n}")
    if max_state > n_days:
        raise AssertionError(f"per-user state {max_state} exceeds day span {n_days}")
    return {"probe": "retention_cohorts", "events": n_events, "users": n_users,
            "days": n_days, "out_rows": n, "max_user_state_days": max_state,
            "sec": sec}


def probe_dedup_ingest(spark, n_docs: int, n_batches: int = 4) -> dict:
    """Incremental-ingest cost model: ingest ``n_batches`` equal batches
    through dedup_ingest_batch and record per-batch wall time. The claim
    under test: batch k costs batch-size + candidate work against the
    store — NOT k× (the store is read, never re-hashed), so per-batch wall
    should grow mildly (store-side candidate join grows), not linearly
    rescan history. A planted near-dup pair straddles every adjacent batch
    boundary so cross-batch pair emission is exercised."""
    import shutil
    import tempfile
    import time as _t

    from distributed_graph_database_simulation_spark.streaming.ingest import (
        dedup_ingest_batch,
    )

    # 100k-word synthetic vocabulary: a tiny vocab degenerates minhash
    # (few distinct shingles -> shared per-permutation minima -> giant LSH
    # buckets), which would probe a pathology, not the ingest cost model.
    # Adjacent even/odd ids share text => one planted near-dup pair per id
    # pair, landing in different batches under the mod-n_batches split.
    docs = spark.range(0, n_docs, 1, 32).selectExpr(
        "id AS doc_id",
        """concat_ws(' ', transform(sequence(1, 40),
             i -> concat('w', pmod(xxhash64(CAST(id - pmod(id, 2) AS STRING), i), 100000))))
           AS text""",
    )
    base = tempfile.mkdtemp(prefix="dgds_ingest_probe_")
    walls = []
    store_docs = []  # store size (docs) each batch ran AGAINST (pre-extend)
    total_pairs = 0
    for b in range(n_batches):
        batch = docs.where(F.pmod(F.col("doc_id"), n_batches) == b)
        store_docs.append(b * (n_docs // n_batches))
        t0 = _t.perf_counter()
        dedup_ingest_batch(spark, batch, b, f"{base}/store", f"{base}/pairs")
        walls.append(round(_t.perf_counter() - t0, 2))
    total_pairs = spark.read.parquet(f"{base}/pairs").count()
    shutil.rmtree(base, ignore_errors=True)
    return {"probe": "dedup_ingest", "docs": n_docs, "batches": n_batches,
            "per_batch_sec": walls, "store_docs_at_batch": store_docs,
            "pairs": total_pairs}


def probe_bipartite(spark, n_edges: int, hub_deg: int = 100_000) -> dict:
    """Bipartite-projection probe: the d^2 hub hazard is THE scale claim
    (graph_analytics.bipartite_project) — a degree-100k left hub alone
    would emit C(100k, 2) = 5e9 pairs uncapped. 10M incidence edges over
    1M left / 100k right entities plus one such hub; with degree_cap=10
    the hub contributes at most C(10,2) = 45 pairs and total pair volume
    stays <= |left| * 45."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        bipartite_project,
    )

    base = spark.range(0, n_edges, 1, 32).select(
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1_000_000)).alias("l"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(100_000)).alias("r"),
    )
    hub = spark.range(0, hub_deg, 1, 32).select(
        F.lit(9_999_999).alias("l"), F.col("id").alias("r")
    )
    inc = base.unionByName(hub)
    t0 = _t.perf_counter()
    proj = bipartite_project(inc, "l", "r", degree_cap=10, min_weight=2)
    n_pairs = proj.count()
    hub_pairs = proj.where(
        (F.col("r_a") < 10) & (F.col("r_b") < 10)
    ).count()  # hub keeps its 10 smallest rights: 0..9
    sec = round(_t.perf_counter() - t0, 2)
    if n_pairs > 1_000_001 * 45:
        raise AssertionError(f"pair volume blew the |left|*C(cap,2) bound: {n_pairs}")
    return {"probe": "bipartite", "edges": n_edges + hub_deg,
            "pairs_w2": n_pairs, "hub_region_pairs": hub_pairs, "sec": sec}


def probe_cms(spark, n_rows: int, n_keys: int = 1_000_000,
              width: int = 65_536) -> dict:
    """CMS probe at production sizing: 10M rows over 1M distinct keys into
    a depth-5 x 64Ki counter grid (pipeline.cms_sketch). Checks the two
    exact invariants at scale — per-depth-row mass == n_rows precisely
    (linearity) and est >= exact on a 1k-key sample (one-sided error) —
    and that the sketch stays <= depth*width rows however large the
    input (the map-side-combine claim: shuffle volume is counter-grid-
    sized, not data-sized)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        CMS_DEPTH,
        cms_point_estimates,
        cms_sketch,
    )

    # zipf-ish: key j with frequency ~ 1/(j+1) via integer harmonic trick
    rows = spark.range(0, n_rows, 1, 32).select(
        F.concat(
            F.lit("k"),
            F.pmod(
                F.pmod(F.xxhash64("id"), F.lit(n_keys))
                * F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)),
                F.lit(n_keys),
            ),
        ).alias("key")
    )
    t0 = _t.perf_counter()
    sk = cms_sketch(rows, "key", width=width).localCheckpoint(eager=True)
    n_counters = sk.count()
    build_sec = round(_t.perf_counter() - t0, 2)
    masses = [r.m for r in sk.groupBy("j").agg(F.sum("cnt").alias("m")).collect()]
    if len(masses) != CMS_DEPTH or any(m != n_rows for m in masses):
        raise AssertionError(f"CMS mass not conserved: {masses} != {n_rows}")
    if n_counters > CMS_DEPTH * width:
        raise AssertionError(f"sketch blew the counter grid: {n_counters}")
    sample = rows.where(F.pmod(F.xxhash64("key"), F.lit(997)) == 0)
    exact = sample.groupBy("key").agg(F.count("*").cast("bigint").alias("n"))
    t0 = _t.perf_counter()
    est = cms_point_estimates(sk, exact.select("key"), "key", width=width)
    n_under = (
        exact.join(est, "key").where(F.col("cms_est") < F.col("n")).count()
    )
    query_sec = round(_t.perf_counter() - t0, 2)
    if n_under:
        raise AssertionError(f"{n_under} keys estimated UNDER exact")
    return {"probe": "cms", "rows": n_rows, "counters": n_counters,
            "build_sec": build_sec, "query_sec": query_sec}


def probe_mm_tokenize(spark, n_media: int) -> dict:
    """Multimodal tokenization throughput: n synthetic payloads through
    the real-codec Arrow kernels — BMP round trip + ViT patch grid
    (multimodal._patch_batches) and WAV round trip + analysis-window
    framing (_audio_window_batches). The claim under test is that the
    1 -> n_tokens explode inside mapInPandas keeps the cost linear in
    payload bytes with no shuffle at all (narrow map, partition-parallel);
    row counts are checked against the closed-form grid/window formulas."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.multimodal import (
        AUDIO_HOP,
        AUDIO_WIN,
        PATCH_P,
        _audio_window_batches,
        _patch_batches,
        _AUDIO_WINDOWS_SCHEMA,
        _PATCHES_SCHEMA,
    )

    media = spark.range(0, n_media, 1, 32).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat(F.lit("payload "), F.col("id").cast("string"),
                     F.lit(" lorem ipsum dolor sit amet " * 8)),
            "UTF-8",
        ).alias("payload"),
    )
    t0 = _t.perf_counter()
    n_patches = media.mapInPandas(_patch_batches, schema=_PATCHES_SCHEMA).count()
    patch_sec = round(_t.perf_counter() - t0, 2)
    # closed form: (h//P)*(w//P) per media with w=4+id%5, h=4+3*id%5
    expect_patches = sum(
        ((4 + (i * 3) % 5) // PATCH_P) * ((4 + i % 5) // PATCH_P)
        for i in range(n_media)
    )
    if n_patches != expect_patches:
        raise AssertionError(f"patch grid drifted: {n_patches} != {expect_patches}")
    t0 = _t.perf_counter()
    n_wins = media.mapInPandas(
        _audio_window_batches, schema=_AUDIO_WINDOWS_SCHEMA
    ).count()
    audio_sec = round(_t.perf_counter() - t0, 2)
    return {"probe": "mm_tokenize", "media": n_media,
            "patches": n_patches, "patch_sec": patch_sec,
            "audio_windows": n_wins, "audio_sec": audio_sec}




def probe_sliding_distinct(spark, n_events: int = 2_000_000,
                           n_users: int = 100_000, n_days: int = 90) -> dict:
    """Trailing-7-day exact distinct users at scale: n_events raw events
    over n_users x n_days. The claim under test is the dedupe-then-explode
    cost model — after the (day, user) distinct, every later stage is
    bounded by active pairs x 7, independent of raw event volume (rerun
    with 10x events per pair to see the flat tail)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.relational import (
        sliding_distinct_users_df,
    )

    ev = spark.range(n_events).select(
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(days=F.pmod(F.xxhash64("id"), F.lit(n_days)).cast("int"),
                           mins=F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1440)).cast("int"))
         ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_users)).alias("user_id"),
    )
    t0 = _t.perf_counter()
    out = sliding_distinct_users_df(ev)
    n_rows = out.count()
    sec = round(_t.perf_counter() - t0, 2)
    mx = out.agg(F.max("users_7d")).first()[0]
    # the operator's pairs persist is harness-owned (cache-ownership
    # policy) — release it so it doesn't leak into the next probe
    spark.catalog.clearCache()
    return {"probe": "sliding_distinct", "events": n_events, "users": n_users,
            "days": n_days, "out_rows": n_rows, "max_wau": mx, "sec": sec}


def probe_mips(spark, n_vectors: int = 1_000_000, dim: int = 64) -> dict:
    """Norm-augmented MIPS through the cosine-LSH stack at 1M vectors:
    the reduction's scale claim is that inner-product search needs NO new
    infrastructure — augment (one broadcast agg + map-side array append)
    and the existing bucket-join serves it, corpus never shuffled. Recall
    is measured against exact brute-force MIPS over the same corpus."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.similarity import (
        TOP_K,
        mips_topk_df,
        mips_topk_lsh_df,
    )

    # Clustered corpus with 4x norm spread across clusters — the regime
    # MIPS serves (recommendation item vectors: direction ~ topic,
    # magnitude ~ popularity). Isotropic random vectors are the
    # reduction's documented worst case (all norms concentrate, the
    # augmented axis dominates every signature and angular LSH loses its
    # signal); real embedding corpora cluster, which is also the premise
    # the LSH bit-width tuning in similarity.py states.
    n_clusters = 256
    cluster = F.pmod(F.xxhash64("id"), F.lit(n_clusters))
    scale = 0.5 + F.pmod(cluster, F.lit(8)).cast("double") / 4.0
    vecs = spark.range(n_vectors).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: scale
            * (
                (F.pmod(F.xxhash64(cluster, i), F.lit(2001)) - 1000) / 1000.0
                + 0.3
                * (F.pmod(F.xxhash64(F.col("id"), i, F.lit(3)), F.lit(2001)) - 1000)
                / 1000.0
            ),
        ).alias("e"),
    )
    # Persist the synthetic corpus: both paths scan it several times
    # (norm agg, band agg, signatures, re-rank), and re-generating the
    # 64M-hash transform per scan would measure the generator, not the
    # operator — a real corpus is a columnar parquet scan.
    from pyspark.storagelevel import StorageLevel

    vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    queries = vecs.where(F.col("vec_id") < 8)
    t0 = _t.perf_counter()
    # r14 grid-probed 1M config (SCALE.md §mips-grid): 16 tables x 12-bit
    # buckets with the Hamming-1 multi-probe default — recall@10 0.887,
    # FASTER than the old 8x10 exact-probe (smaller buckets shrink the
    # candidate re-rank more than the probe fan-out grows it).
    ann = {(r.query_id, r.neighbor_id)
           for r in mips_topk_lsh_df(vecs, queries, tables=16, bits=12).collect()}
    ann_sec = round(_t.perf_counter() - t0, 2)
    t1 = _t.perf_counter()
    exact = {(r.query_id, r.neighbor_id)
             for r in mips_topk_df(vecs, queries).collect()}
    exact_sec = round(_t.perf_counter() - t1, 2)
    # The LSH claim is throughput, not latency: corpus signing is a fixed
    # cost and per-query work is candidate-bounded, while exact brute
    # force is linear in |Q| x corpus. 64x the queries should cost the
    # LSH path far less than 64x (exact at 512 queries would be ~64x
    # exact_sec_8q — derived, not run).
    big_q = vecs.where(F.col("vec_id") < 512)
    t2 = _t.perf_counter()
    mips_topk_lsh_df(vecs, big_q, tables=16, bits=12).count()
    ann_512_sec = round(_t.perf_counter() - t2, 2)
    vecs.unpersist()
    return {"probe": "mips", "vectors": n_vectors, "dim": dim,
            "recall_at_10": round(len(ann & exact) / (8 * TOP_K), 3),
            "lsh_sec_8q": ann_sec, "lsh_sec_512q": ann_512_sec,
            "exact_sec_8q": exact_sec}


def probe_crawl_delta(spark, n_rows: int = 2_000_000,
                      n_delta_keys: int = 10_000, n_buckets: int = 256) -> dict:
    """merge_delta cost model at scale: load an n_rows digest store, then
    apply a delta (half upserts, half tombstones) whose keys cluster into
    few buckets. The claim under test is single-surgery
    bucket-proportionality — one read + one write over ONLY the touched
    partition directories, a fraction of the full-load cost."""
    import shutil
    import tempfile
    import time as _t

    from distributed_graph_database_simulation_spark.sources.keyed_store import (
        KeyedParquetStore,
    )

    base = tempfile.mkdtemp(prefix="probe_crawl_delta_")
    try:
        store = KeyedParquetStore(spark, f"{base}/t", "doc_id", n_buckets=n_buckets)
        rows = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.lit("web").alias("source"),
            (F.pmod(F.xxhash64("id"), F.lit(9000)) + 100).alias("len"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_003)).alias("csum"),
        )
        t0 = _t.perf_counter()
        store.write_full(rows)
        load_sec = round(_t.perf_counter() - t0, 2)
        clustered = (
            spark.range(n_rows)
            .select(F.col("id").alias("doc_id"))
            .where(F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)) < 8)
            .limit(n_delta_keys)
        )
        ups = clustered.where(F.col("doc_id") % 2 == 0).select(
            "doc_id", F.lit("web").alias("source"),
            F.lit(123).cast("long").alias("len"),
            F.lit(456).cast("long").alias("csum"),
        )
        dels = clustered.where(F.col("doc_id") % 2 == 1)
        t1 = _t.perf_counter()
        stats = store.merge_delta(ups, dels)
        delta_sec = round(_t.perf_counter() - t1, 2)
        if stats["buckets_touched"] > 8:
            raise AssertionError(
                f"expected <= 8 touched buckets, got {stats['buckets_touched']}"
            )
        return {"probe": "crawl_delta", "rows": n_rows,
                "delta_keys": n_delta_keys, "n_buckets": n_buckets,
                "buckets_touched": stats["buckets_touched"],
                "rows_written": stats["rows_written"],
                "full_load_sec": load_sec, "delta_sec": delta_sec}
    finally:
        shutil.rmtree(base, ignore_errors=True)




def probe_boilerplate(spark, n_docs: int = 500_000, banner_every: int = 3) -> dict:
    """Cross-document boilerplate removal at scale: n_docs synthetic docs,
    every ``banner_every``-th carrying a shared cookie-banner sentence.
    The claim under test is the aggregate-then-anti-join shape — the
    distinct-doc count is a partial-aggregated groupBy (map-side combine
    crushes the banner key, which appears in n/banner_every docs), never
    a sentence-keyed window — and the banner is gone from every doc."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.dedup import (
        boilerplate_sentences_df,
    )

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % banner_every == 0,
                   F.lit("Accept all cookies. ")).otherwise(F.lit("")),
            F.lit("Unique prose "), F.col("id").cast("string"),
            F.lit(" body. Tail sentence "), (F.col("id") * 7).cast("string"),
            F.lit("."),
        ).alias("text"),
    )
    t0 = _t.perf_counter()
    out = boilerplate_sentences_df(docs)
    agg = out.agg(
        F.count("*"), F.sum("n_boiler"),
        F.sum((F.col("n_boiler") > 0).cast("int")),
    ).first()
    sec = round(_t.perf_counter() - t0, 2)
    spark.catalog.clearCache()  # harness-owned sentence-table persist
    n_rows, total_boiler, docs_touched = agg
    want_touched = (n_docs + banner_every - 1) // banner_every
    if docs_touched != want_touched:
        raise AssertionError(f"banner removal touched {docs_touched}, want {want_touched}")
    return {"probe": "boilerplate", "docs": n_docs,
            "banner_every": banner_every, "docs_touched": int(docs_touched),
            "boiler_sentences_removed": int(total_boiler), "sec": sec}


def probe_knn_graph(spark, n_vectors: int = 1_000_000, dim: int = 64) -> dict:
    """k-NN graph at 1M vectors: the LSH SELF-join shape's scale claim is
    that candidate volume follows n^2 * tables / 2^bits, so ``bits``
    sized to ~2*log2(n) keeps the pair shuffle candidate-proportional
    (here 24 bits -> expected ~0.5 candidates/vector/table from hash
    collisions + the true near-dup mass). Corpus STRUCTURE matters more
    than size: the first attempt reused probe_mips's 256-cluster corpus
    and OOM'd the driver — 3,900 correlated vectors per cluster make
    the k-NN graph 256 quasi-cliques (~2e9 true candidate pairs; no
    algorithm avoids materializing what is genuinely there). The k-NN
    regime is many SMALL neighborhoods: n/10 clusters of ~10 vectors,
    so true-candidate mass is ~10/vector and the probe measures the
    operator, not a degenerate corpus. Recall is spot-checked on 8
    probe vectors against brute force."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.similarity import (
        KNN_K,
        knn_graph_df,
        sim_topk_bruteforce,  # noqa: F401  (same cosine convention)
        _with_norm,
        _dot,
    )

    n_clusters = max(256, n_vectors // 10)
    cluster = F.pmod(F.xxhash64("id"), F.lit(n_clusters))
    scale = 0.5 + F.pmod(cluster, F.lit(8)).cast("double") / 4.0
    vecs = spark.range(n_vectors).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: scale
            * (
                (F.pmod(F.xxhash64(cluster, i), F.lit(2001)) - 1000) / 1000.0
                + 0.3
                * (F.pmod(F.xxhash64(F.col("id"), i, F.lit(3)), F.lit(2001)) - 1000)
                / 1000.0
            ),
        ).alias("e"),
    )
    from pyspark.storagelevel import StorageLevel

    vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    t0 = _t.perf_counter()
    # shipped default (KNN_TABLES band-OR config, r15 grid winner)
    knn = knn_graph_df(vecs, k=KNN_K)
    knn = knn.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = knn.count()
    sec = round(_t.perf_counter() - t0, 2)
    # spot recall: 8 probe vectors vs brute force over the full corpus
    probes = vecs.where(F.col("vec_id") < 8)
    c = _with_norm(vecs).alias("c")
    q = _with_norm(probes).alias("q")
    cos = _dot(F.col("q.e"), F.col("c.e")) / (F.col("q.norm") * F.col("c.norm"))
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    bf = (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("src_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    exact = {(r.src_id, r.neighbor_id) for r in bf.collect()}
    got = {
        (r.src_id, r.neighbor_id)
        for r in knn.where(F.col("src_id") < 8).collect()
    }
    knn.unpersist()
    vecs.unpersist()
    return {"probe": "knn_graph", "vectors": n_vectors, "k": KNN_K,
            "edges": int(n_edges), "sec": sec,
            "spot_recall_at_k": round(len(exact & got) / max(len(exact), 1), 3)}


def probe_linkage(spark, n_records: int = 1_000_000) -> dict:
    """Record linkage at 1M records: the scale claim is that blocking
    keeps comparisons candidate-proportional — q-gram blocks with the
    stop-gram df cap generate ~planted + hash-accident candidates, never
    the C(n,2) ~ 5e11 all-pairs set. Corpus: n/2 distinct base strings
    (12 hex chars from a wide id space — background gram collisions df-
    bounded), each with ONE planted dirty copy (a char deleted mid-
    string), so expected links = n/2 planted pairs exactly; any
    accidental pair must still be a true distance-<=1 pair by the verify
    step. Recall here is 100% by construction (the deletion damages <= q
    interior grams of 9, and hex-gram df stays under the cap)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.linkage import (
        record_linkage_df,
    )

    n_base = n_records // 2
    base = spark.range(0, n_base, 1, 32).select(
        F.col("id").alias("rec_id"),
        F.concat(
            F.lit("id-"),
            F.lpad(F.hex(F.xxhash64("id").bitwiseAND(F.lit(0xFFFFFFFFFFFF))), 12, "0"),
        ).alias("text"),
    )
    dirty = base.select(
        (F.col("rec_id") + n_base).alias("rec_id"),
        # delete one mid-string char at a hash-derived position (4..10)
        F.expr(
            "concat(substring(text, 1, CAST(4 + pmod(xxhash64(rec_id), 7) AS INT)), "
            "substring(text, CAST(4 + pmod(xxhash64(rec_id), 7) AS INT) + 2, 100))"
        ).alias("text"),
    )
    records = base.unionByName(dirty)
    t0 = _t.perf_counter()
    out = record_linkage_df(records, q=4, max_df=200, max_dist=1)
    n_links = out.count()
    sec = round(_t.perf_counter() - t0, 2)
    planted = out.where(F.col("rec_b") == F.col("rec_a") + n_base).count()
    if planted < n_base * 0.99:
        raise AssertionError(
            f"planted-pair recall collapsed: {planted} / {n_base}"
        )
    return {"probe": "linkage", "records": n_records, "links": int(n_links),
            "planted_recalled": int(planted), "planted_total": n_base,
            "sec": sec}


def probe_corpus_clean_pack(spark, n_docs: int = 500_000) -> dict:
    """The full C4-style composition at 500k docs (r13 verdict #4):
    boilerplate -> exact-substring scrub -> near-dup representatives ->
    interleave/pack in one DAG. Planted structure, each triggering a
    different stage:

    - every 3rd doc carries a shared cookie-banner sentence (stage 1);
    - id%1000 in {2,3}: the pair shares a 55-word appended run — a
      >= 50-token cross-doc duplicate the scrub must excise (stage 2);
    - id%1000 in {0,1}: the pair's 60-word bodies differ at exactly two
      positions (17, 49) — longest common run 31 < 50 so the scrub
      leaves them, shingle Jaccard > 0.5 so clustering pairs them, and
      exactly one survives (stage 3).

    Invariant: the packed segment table contains exactly
    n_docs - n_docs/1000 distinct docs (one loser per near-dup pair,
    nothing else dropped)."""
    import time as _t

    from distributed_graph_database_simulation_spark.operators.pipeline import (
        INTERLEAVE_WEIGHTS,
        corpus_clean_pack_df,
    )

    vocab = [
        "scan", "column", "window", "order", "sort", "part", "agg", "value",
        "line", "key", "join", "merge", "query", "group", "a", "vector",
        "hash", "slow", "stream", "filter", "fast", "the", "spark", "batch",
        "table", "small", "data", "big", "customer", "row", "dup",
    ]
    v = len(vocab)
    varr = F.array(*[F.lit(w) for w in vocab])
    langs = sorted(INTERLEAVE_WEIGHTS)
    larr = F.array(*[F.lit(la) for la in langs])
    role = F.col("id") % 1000
    grp = F.expr("id div 1000")
    # body word i: group-seeded for near-dup pairs (B flips positions
    # 17/49), id-seeded otherwise. A vocab-modulo stream ALIASES (ids
    # congruent mod |vocab| share bodies — the first probe run scrubbed
    # the whole corpus to empty), so every 10th position injects a
    # synthetic unique token — per GROUP for the near-dup pair (shared
    # within the pair), per DOC otherwise — capping any unplanted
    # cross-doc run at 9 words.
    def body_word(i):
        # Two generator lessons, both measured: (a) a constant-stride
        # modulo stream draws every 3-gram from the same |vocab|
        # possibilities, making ALL docs near-dups of each other (one
        # giant cluster, quadratic verify); (b) even xxhash64 picks from
        # a BARE 31-word vocab leave background Jaccard ~ (w^2/31^3)/2w
        # ~ 0.002, and at 500k docs the 64-band birthday over 1.25e11
        # pairs turns J^2 = 4e-6 into ~millions of phantom candidates —
        # the verify join, correctly candidate-proportional, then
        # dominated the probe (~900 s that looked like operator cost).
        # A 2-digit hashed suffix widens the effective vocab to ~3k
        # (shingle space ~2.7e10), putting unplanted J back at ~0 — the
        # regime a real (boilerplate-stripped) corpus is actually in.
        near_h = F.xxhash64(grp, F.lit(i))
        near_seed = F.pmod(near_h, F.lit(v))
        flip = ((role == 1) & ((i == 17) | (i == 49))).cast("int")
        near = F.concat(
            F.element_at(varr, ((near_seed + flip) % v + 1).cast("int")),
            F.pmod(near_h, F.lit(97)).cast("string"),
        )
        uniq_h = F.xxhash64(F.col("id"), F.lit(i), F.lit(3))
        uniq = F.concat(
            F.element_at(varr, (F.pmod(uniq_h, F.lit(v)) + 1).cast("int")),
            F.pmod(uniq_h, F.lit(97)).cast("string"),
        )
        word = F.when(role <= 1, near).otherwise(uniq)
        if i % 10 == 0:
            gtok = F.concat(F.lit("g"), grp.cast("string"))
            utok = F.concat(F.lit("u"), F.col("id").cast("string"))
            return F.when(role <= 1, gtok).otherwise(utok)
        return word

    body = F.array_join(
        F.array(*[body_word(i) for i in range(60)]), " "
    )
    # one corpus-wide 55-word run (constant across groups): every role-2/3
    # doc carries it, the scrub must excise exactly it from all of them
    run = F.array_join(
        F.array(
            *[
                F.lit(vocab[(7 + i * librarian_prime()) % v])
                for i in range(55)
            ]
        ),
        " ",
    )
    text = F.concat(
        F.when(F.col("id") % 3 == 0, F.lit("Accept all cookies. ")).otherwise(
            F.lit("")
        ),
        body,
        F.when((role == 2) | (role == 3), F.concat(F.lit(" "), run)).otherwise(
            F.lit("")
        ),
    )
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.element_at(larr, (F.col("id") % len(langs) + 1).cast("int")).alias(
            "lang"
        ),
        text.alias("text"),
    )
    t0 = _t.perf_counter()
    segs = corpus_clean_pack_df(spark, docs, INTERLEAVE_WEIGHTS)
    got = segs.agg(
        F.countDistinct("doc_id").alias("docs"),
        F.sum(F.col("seg_end") - F.col("seg_start") + 1).alias("mass"),
        F.max("seq_id").alias("max_seq"),
    ).first()
    sec = round(_t.perf_counter() - t0, 2)
    spark.catalog.clearCache()  # lazy-plan persists, harness-owned
    want = n_docs - n_docs // 1000
    if got["docs"] != want:
        raise AssertionError(
            f"survivor docs {got['docs']}, want {want} "
            f"(one loser per near-dup pair)"
        )
    return {"probe": "corpus_clean_pack", "docs": n_docs,
            "survivors": int(got["docs"]), "packed_tokens": int(got["mass"]),
            "sequences": int(got["max_seq"]) + 1, "sec": sec}


def librarian_prime() -> int:
    """Distinct stride for the planted duplicate run so it never aligns
    with a body's word stream."""
    return 2003


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=float, default=5e6)
    ap.add_argument("--vertices", type=float, default=1e6)
    ap.add_argument("--docs", type=float, default=5e4)
    ap.add_argument("--batches", type=int, default=4,
                    help="micro-batch count for the dedup_ingest probe")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="run only probes whose name contains one of these substrings",
    )
    args = ap.parse_args()

    from distributed_graph_database_simulation_spark.session import get_spark

    spark = get_spark("scale_probe")
    probes = (
        ("bfs", lambda: probe_bfs(spark, int(args.edges), int(args.vertices))),
        ("cc", lambda: probe_cc(spark, int(args.edges) // 5, int(args.vertices) // 5)),
        ("minhash", lambda: probe_minhash(spark, int(args.docs))),
        ("pagerank", lambda: probe_pagerank(spark, int(args.edges) // 5, int(args.vertices) // 5)),
        ("label_propagation", lambda: probe_label_propagation(
            spark, int(args.edges) // 5, int(args.vertices) // 5
        )),
        ("shard_assign", lambda: probe_shard_assign(spark, int(args.docs) * 100)),
        ("capped_common_neighbors", lambda: probe_capped_common_neighbors(spark, int(args.vertices), 50_000)),
        ("asof_and_sessions", lambda: probe_asof_and_sessions(spark, int(args.edges) * 2)),
        ("cosine_router", lambda: probe_cosine_router(spark, 1_000_000, 256)),
        ("prefiltered_cosine", lambda: probe_prefiltered_cosine(spark, 1_000_000, 64)),
        ("keyed_store_merge", lambda: probe_keyed_store_merge(spark)),
        ("temporal_reachability", lambda: probe_temporal_reachability(spark)),
        ("dup_spans", lambda: probe_dup_spans(spark, int(args.docs) * 10)),
        ("exact_substring", lambda: probe_exact_substring(spark, int(args.docs) * 10)),
        ("bpe", lambda: probe_bpe(spark, int(args.docs) * 20)),
        ("interleave_pack", lambda: probe_interleave_pack(spark, int(args.docs) * 10)),
        ("cdc_chunks", lambda: probe_cdc_chunks(spark, int(args.docs) * 10)),
        ("bigram_lm", lambda: probe_bigram_lm(spark, int(args.docs) * 10)),
        ("pack_sequences", lambda: probe_pack_sequences(spark, int(args.docs) * 100)),
        ("cap_per_source", lambda: probe_cap_per_source(spark, int(args.docs) * 100)),
        ("multi_source_bfs", lambda: probe_multi_source_bfs(spark, int(args.edges) // 2, int(args.vertices) // 2)),
        ("scc", lambda: probe_scc(spark)),
        ("hyperball", lambda: probe_hyperball(spark, int(args.edges) // 5, int(args.vertices) // 5)),
        ("random_walks_hub", lambda: probe_random_walks_hub(spark, int(args.vertices) // 5)),
        ("node2vec", lambda: probe_node2vec(spark, int(args.vertices) // 5)),
        ("simrank", lambda: probe_simrank(spark)),
        ("contraction_cc_path", lambda: probe_contraction_cc_path(spark, int(args.vertices) // 2)),
        ("ann_topk", lambda: probe_ann_topk(spark)),
        ("matching", lambda: probe_matching(spark, int(args.edges) // 2, int(args.vertices) // 2)),
        ("densest", lambda: probe_densest(spark, int(args.edges) // 2, int(args.vertices) // 2)),
        ("skyline", lambda: probe_skyline(spark, int(args.edges) * 2)),
        ("retention_cohorts", lambda: probe_retention_cohorts(spark, int(args.edges) * 2)),
        ("dedup_ingest", lambda: probe_dedup_ingest(
            spark, int(args.docs) * 2, n_batches=args.batches
        )),
        ("bipartite", lambda: probe_bipartite(spark, int(args.edges) * 2)),
        ("cms", lambda: probe_cms(spark, int(args.edges) * 2)),
        ("mm_tokenize", lambda: probe_mm_tokenize(spark, int(args.docs) * 4)),
        ("sliding_distinct", lambda: probe_sliding_distinct(spark, int(args.edges))),
        ("mips", lambda: probe_mips(spark)),
        ("crawl_delta", lambda: probe_crawl_delta(spark)),
        ("boilerplate", lambda: probe_boilerplate(spark)),
        ("corpus_clean_pack", lambda: probe_corpus_clean_pack(spark)),
        ("knn_graph", lambda: probe_knn_graph(spark)),
        ("linkage", lambda: probe_linkage(spark)),
    )
    for name, probe in probes:
        if args.only is not None and not any(s in name for s in args.only):
            continue
        print(json.dumps(probe()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
