#!/usr/bin/env python
"""Generate PLANS.md: condensed physical plans for the headline queries
with the scale-relevant properties extracted (join strategies, shuffle
count, filter pushdown, column pruning).

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)

The durable assertions live in tests/test_plans.py; this file is the
human-readable audit trail the assertions protect.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quacfka_spark.registry import get_queries
from quacfka_spark.session import get_spark

HEADLINE = [
    "q01_scan_count", "q02_project_math", "q03_filter", "q04_hash_agg",
    "q07_inner_join", "q11_multiway_join", "q12_theta_join",
    "q13_window_rank", "q15_topk", "q17_rollup", "q21_posexplode",
    "q23_subqueries", "q25_except", "q27_cube_grouping", "q28_window_nav",
    "q30_percentile", "q32_pivot", "q34_higher_order_array",
    "sim04_ivf_topk", "s01_tumbling_window", "s03_session_window",
    "t04_fingerprint", "d01_exact_dedup", "d03_minhash_lsh",
    "d05_embedding_cosine", "d07_cosine_lsh_pairs", "q42_latest_per_key",
    "q43_skew_safe_agg", "t07_corpus_mix", "t08_decontaminate", "sim06_multi_query_topk",
    "sim01_bruteforce_topk", "m03_frame_sample",
    "x01_asof_join", "x03_range_band_join", "x04_time_rollup", "t05_term_frequency",
    "q37_range_interval_frame", "q38_correlated_scalar", "q39_lateral_topn",
    "q40_filtered_agg", "q41_unpivot", "sim05_label_centroids", "x05_column_profile",
    "d03p_minhash_xxhash_pairs", "q30p_approx_percentile_only",
    "x06_bucketed_join_agg", "t09_chunk_split_builtin",
    "t10_pii_scrub", "t11_repetition_rules", "d09_chunk_freq_dedup",
    "sim07_pq_topk", "x07_partition_pruned_rollup", "s07_funnel_join",
    "q44_hll_sketch", "t12_sequence_pack", "m05_binary_piecewise_dedup",
    "t13_url_filter", "x08_mix_resample", "t14_lm_perplexity",
    "d10_semdedup", "d10x_semdedup_recall", "d07x_lsh_recall",
    "x09_zorder_scan",
    "q45_grouping_sets",
    "t15_url_canonical_dedup",
    "q46_stats_profile",
    "q47_median_mode",
    "t16_bm25_topk",
    "t17_dsir_resample",
    "sim08_rrf_hybrid",
    "x10_compact_scan",
    "q48_fuzzy_match",
    "q51_running_distinct",
    "q52_recursive_cte",
    "x11_changelog_merge",
    "x12_gap_fill",
    "d11_cdc_dedup",
    "x13_dynamic_pruned_join",
    "t18_shuffle_shard",
    "q49_histogram",
    "q50_ntile_deciles",
    "t19_split_assign",
    "d12_ngram_novelty",
    "sim09_range_search",
    "sim10_knn_graph",
    "sim11_knn_pagerank",
    "t20_distill_classifier",
    "t21_distill_auc",
    "x14_scd2_history",
    "x15_cohort_retention",
    "x16_snapshot_timeline",
    "m06_ahash_neardup",
    "m07_dhash_neardup",
    "x17_bloom_join",
    "s09_outer_interval_join",
    "sim12_mmr_rerank",
    "d14_fuzzy_containment",
    "q53_string_agg",
    "sim13_knn_communities",
    "d07w_lsh_wideband_pairs",
    "d07wx_recovered_recall",
    "d07q_int8_verify_pairs",
    "d07qx_int8_agreement",
    "d03g_neardup_gate_quality",
    "sim10w_knn_graph_wideband",
    "sim10wx_wideband_agreement",
    "sim10q_int8_knn_graph",
    "sim10qx_int8_rank_stability",
    "e01_ingest_to_training",
]

DETAIL_NODES = re.compile(
    r"\(\d+\) (Scan parquet|BroadcastHashJoin|SortMergeJoin|"
    r"BroadcastNestedLoopJoin|ShuffledHashJoin|Exchange|HashAggregate|"
    r"ObjectHashAggregate|SortAggregate|TakeOrderedAndProject|Generate|"
    r"Window|Expand|ArrowEvalPython|MapInPandas|Filter|Sort)\b"
)


def condense(plan: str) -> tuple[str, dict]:
    """Return (tree, facts) — the node tree plus extracted properties."""
    lines = plan.splitlines()
    tree: list[str] = []
    for line in lines[1:]:
        if line.strip() == "":
            break
        tree.append(line.rstrip())
    joins = sorted(
        {m for m in re.findall(r"\(\d+\) (\w*Join\w*)", plan)}
    )
    shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    facts = {
        "joins": ", ".join(joins) or "—",
        "shuffles": shuffles,
        "pushed": sum(1 for p in pushed if p.strip()),
        "scan_cols": ", ".join(str(len([c for c in s.split(",") if c])) for s in schemas),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
    }
    return "\n".join(tree), facts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    qs = get_queries()
    rows = []
    sections = []
    for name in HEADLINE:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        tree, facts = condense(buf.getvalue())
        rows.append(
            f"| {name} | {facts['joins']} | {facts['shuffles']} "
            f"| {facts['pushed']} | {facts['scan_cols']} |"
        )
        sections.append(f"### {name}\n\n```\n{tree}\n```\n")

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit of the headline queries\n\n"
            f"Generated by `python tools/plan_audit.py {sf_dir}` "
            "(plans are planning-time; AQE may further coalesce/replan at "
            "runtime). Durable assertions: `tests/test_plans.py`.\n\n"
            "Scale summary — what to look for: broadcast joins on every "
            "dimension (the fact table never shuffles for a join), "
            "Exchange counts that stay constant as data grows, non-empty "
            "PushedFilters on filtered scans, and scans reading only the "
            "columns the query touches.\n\n"
            "| query | join strategies | exchanges | scans w/ pushdown | cols read per scan |\n"
            "|---|---|---|---|---|\n"
        )
        f.write("\n".join(rows))
        f.write("\n\n---\n\n")
        f.write("\n".join(sections))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
