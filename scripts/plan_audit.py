"""Generate PLAN_AUDIT.md: physical-plan properties of the headline
queries (join strategies, pushed filters, read-schema widths, codegen).

Run: python scripts/plan_audit.py   (writes PLAN_AUDIT.md at repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDITED = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_filters",
    "j1_inner_join",
    "j3_anti_join",
    "j5_asof_last_order",
    "r1_range_join_promo",
    "o1_global_topk",
    "w1_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "sim_ann_lsh_topk",
    "m1_migration_pipeline",
    "text_mixture_weights",
    "sim_cluster_stats",
    # round-4 surface
    "j6_salted_skew_join",
    "stream_late_data_policy",
    "text_chunk_windows",
    "text_bm25",
    "dedup_incremental",
    "sim_quantize_int8",
    "m2_incremental_upsert",
    # round-5 surface
    "q02_min_cost_supplier",
    "q08_market_share",
    "q11_important_stock",
    "q13_customer_distribution",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "m4_cdc_apply",
    "sim_recall_at_k",
    "text_vocab_coverage",
    "graph_pagerank",
    "j7_asof_nearest_order",
    "o4_keyset_pagination",
    "text_bigram_topk",
    "text_remove_dup_spans",
    "events_rfm_features",
    "events_bot_detection",
    "dedup_source_matrix",
    "sim_dim_truncation_recall",
    "sim_lsh_budget_sweep",
    "multimodal_image_ahash",
    # round-5 late additions
    "w6_time_range_rolling",
    "m5_agg_maintenance",
    "dedup_fuzzy_blocked",
    "o5_zorder_layout",
    "text_bigram_surprisal",
    "stream_window_approx_users",
    "s8_catalog_types",
    "events_hypertable_rollup",
    "a6_winsorized_stats",
    "p8_impute_group_mean",
    "sim_ann_ivf_rerank_topk",
    "text_bpe_merge_step",
    "a7_value_percentiles",
    # round-11 registrations (the restructured graph family rows are in
    # the round-10 block below)
    "w7_two_phase_distribution",
    "text_budget_sample",
    # round-12 registrations (the seven r11-queued flips)
    "dedup_recall_gate",
    "graph_k_core",
    "dedup_cdc_chunks",
    "dedup_winnowing",
    "text_cms_heavy_hitters",
    "sim_bitext_ann",
    "sim_bitext_margin",
    # round-13 registrations (the two r12-queued flips)
    "dedup_minhash_incremental",
    "dedup_leakage_safe_split",
    # round-10 registrations
    "graph_triangles",
    "text_approx_strata",
    "o6_bucketed_join",
    # round-10 late additions
    "graph_label_propagation",
    "text_importance_weights",
    "sim_ann_pq_adc_topk",
    "sim_hybrid_rrf",
    "text_bloom_contamination",
    "sim_mmr_rerank",
    "graph_negative_samples",
    # round-14 registrations (the twelve r13-queued flips)
    "stream_near_dup_gate",
    "dedup_clusters_incremental",
    "profile_drift_psi",
    "events_changepoint",
    "m7_snapshot_diff",
    "sim_kmeans_train",
    "sim_pq_train_step",
    "sim_centroid_prune",
    "sim_ivf_probe_sweep",
    "graph_jaccard_neighbors",
    "graph_adamic_adar",
    "o7_compaction_plan",
    # round-15 registrations (the seven r14-queued flips)
    "stream_drift_summary",
    "sim_hard_negatives",
    "profile_embedding_drift",
    "sim_ivf_freshness",
    "multimodal_vad_spans",
    "dedup_method_agreement",
    "m8_schema_evolution_plan",
    # round-16 registrations (the five r15-queued flips)
    "text_langid_ngram",
    "text_lang_sampling_weights",
    "events_ks_drift",
    "stream_ks_summary",
    "stream_cdc_apply_summary",
    # round-17 registrations (the seven r16-queued flips)
    "text_langid_mixture_audit",
    "text_bpe_encode",
    "text_bpe_fertility",
    "text_bpe_learn",
    "text_langid_confusion",
    "text_bpe_vocab_drift",
    "stream_langid_summary",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []

    def _release() -> None:
        # Audit each query from a CLEAN cache state (r12): a persisted
        # frame left by an earlier audited query substitutes
        # InMemoryTableScan into LATER queries' plans via the
        # CacheManager, erasing their PushedFilters/ReadSchema rows (the
        # dedup_recall_gate shingle cache blanked text_bloom's row).
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    for name in AUDITED:
        _release()
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        joins = {
            "BHJ": plan.count("BroadcastHashJoin"),
            "SMJ": plan.count("SortMergeJoin"),
            "SHJ": plan.count("ShuffledHashJoin"),
            "BNLJ": plan.count("BroadcastNestedLoopJoin"),
        }
        join_str = ", ".join(f"{k}x{v}" for k, v in joins.items() if v) or "—"
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "—"
        widths = [len(m.group(1).split(",")) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]
        topk = "yes" if "TakeOrderedAndProject" in plan else "—"
        rows.append((name, join_str, pushed, ",".join(map(str, widths)) or "—", topk))
    lines = [
        "# PLAN_AUDIT — physical-plan properties of the headline queries",
        "",
        f"Generated by scripts/plan_audit.py against {SF_DIR} (regenerate after",
        "plan-affecting changes; tests/test_plans.py pins the load-bearing",
        "properties).",
        "",
        "| query | joins | pushed filters | read-schema widths | top-k no-sort |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r) + " |")
    lines.append("")
    lines.append(
        "BHJ = broadcast hash join (dimension side), SMJ/SHJ = shuffle joins "
        "(fact-fact; AQE picks at runtime). BNLJ appears only to attach a "
        "broadcast single-row probe (constant work); node counts can include "
        "AQE re-planned subtrees. Read-schema widths show column pruning "
        "reaching each Parquet scan."
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
