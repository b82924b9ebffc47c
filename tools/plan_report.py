#!/usr/bin/env python3
"""Generate PLANS.md: formatted physical plans for the headline queries.

Evidence that the declared plans are the plans we want — filters pushed to
the parquet scans, columns pruned, dimensions broadcast, aggregates partial,
whole-stage codegen wide. Regenerate after plan-affecting changes:

    python tools/plan_report.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose single-shot plan is representative (iterative loops are
# driver-side and have no single plan; streaming plans are per-microbatch).
REPORT = [
    "rel_pricing_summary",
    "rel_top_revenue_orders",
    "rel_region_revenue",
    "rel_top_parts_per_brand",
    "rel_asof_join",
    "rel_correlated_exists",
    "rel_quantiles",
    "rel_outer_join",
    "rel_range_frame_window",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "text_quality_score",
    "text_chunk_windows",
    "text_shard_assign",
    "g_common_neighbors_scale",
    "g_common_neighbors_capped_scale",
    "mm_image_features",
    # round-6 registered library wave (one-shot plans only; core_numbers /
    # temporal reachability are driver loops and excluded like the other
    # superstep queries)
    "rel_funnel",
    "rel_scd2",
    "rel_resample_ffill",
    "rel_rolling_zscore",
    "pipe_winsorize",
    "pipe_split",
    "text_tfidf",
    "text_pmi",
    "dedup_containment",
    "dedup_dup_spans",
    "g_modularity_scale",
    "mm_png_decode",
    # round-7 additions (one-shot plans; personalized PageRank and the
    # streaming file sink are a driver loop / micro-batch run, excluded)
    "text_gopher_rules",
    "text_bigram_lm",
    "pipe_cdc_chunks",
    # round-10 additions (one-shot plans; the sketch-store / ingest entries
    # are multi-job writes and the hyperball trace is a driver loop —
    # excluded like the other superstep queries)
    "g_triangles",
    "dedup_embedding_cosine_prefiltered",
    "pipe_zorder_layout",
    "rel_skyline",
    "rel_retention_cohorts",
    # round-11 additions (one-shot plans; the CMS store entries are
    # multi-job writes, the streaming CMS ingest is a micro-batch run, and
    # g_walk_skipgram_pairs runs the walk driver loop first — excluded)
    "rel_grouping_sets",
    "rel_unpivot",
    "rel_rank_family",
    "rel_approx_quantile_checked",
    "sim_range_search",
    "g_bipartite_project",
    # round-12 additions (one-shot plans; budget/pack/token-count compute a
    # driver-side scalar or run micro-batches — excluded as before)
    "text_bpe_encode",
    "text_bpe_vocab",
    "dedup_exact_substring",
    "dedup_scrub_substring",
    "pipe_pack_bpe",
    "pipe_pack_segments",
    "pipe_interleave_sources",
    "pipe_curriculum_buckets",
    "mm_image_channel_stats",
    "mm_audio_level_stats",
    "rel_mad",
    "sim_recall_ivf",
    "pipe_interleave_pack",
    "sim_topk_mips",
    "rel_sliding_distinct_users",
    "pipe_snapshot_diff",
    "rel_attribution_last_touch",
    "dedup_boilerplate_sentences",
    "rel_mode",
    # r14-built one-shot entries
    "sim_recall_mips",
    "sim_knn_graph",
    "rel_analyze_stats",
    "mm_jpeg_decode",
    "pipe_corpus_clean_pack",
    # r15-built one-shot entries (the CBO entry materializes eagerly under
    # scoped confs, so its returned plan is the checkpoint scan — the
    # stats-driven plan itself is pinned in tests/test_plans.py and
    # excluded here; link_entity_clusters is a superstep loop, excluded)
    "link_customer_dirty",
]


def _formatted(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _summarize(plan: str) -> list[str]:
    bullets = []
    n_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    if n_codegen:
        bullets.append(f"{n_codegen} whole-stage codegen span(s)")
    n_bhj = plan.count("BroadcastHashJoin")
    if n_bhj:
        bullets.append(f"{n_bhj} broadcast hash join(s)")
    n_smj = plan.count("SortMergeJoin")
    if n_smj:
        bullets.append(f"{n_smj} sort-merge join(s)")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    real = [p for p in pushed if p.strip() and p.strip() != ""]
    if real:
        bullets.append(f"pushed filters on {len(real)} scan(s)")
    if "partial_" in plan:
        bullets.append("map-side partial aggregation")
    return bullets


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "PLANS.md"))
    args = ap.parse_args()

    from distributed_graph_database_simulation_spark import registry
    from distributed_graph_database_simulation_spark.session import get_spark

    spark = get_spark("plan-report", 16)
    queries = registry.queries()

    sections = [
        "# PLANS — formatted physical plans of the headline one-shot queries",
        "",
        f"Generated by `tools/plan_report.py` at sf dir `{args.sf}`. Iterative",
        "(superstep) and streaming queries are excluded: their execution is a",
        "driver loop / micro-batch sequence, not one plan. Plan-shape",
        "invariants are enforced by `tests/test_plans.py`; this file is the",
        "human-readable evidence.",
        "",
    ]
    for name in REPORT:
        fn = queries.get(name)
        if fn is None:
            continue
        plan = _formatted(fn(spark, args.sf))
        bullets = _summarize(plan)
        sections.append(f"## {name}")
        sections.append("")
        if bullets:
            sections.append("; ".join(bullets))
            sections.append("")
        sections.append("```")
        sections.append(plan.rstrip())
        sections.append("```")
        sections.append("")
        print(f"# {name}: {'; '.join(bullets) or 'plan captured'}", file=sys.stderr)

    with open(args.out, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
