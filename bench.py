"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-6 fix — BENCH_r05.json came back ``"parsed": null``
because the driver only keeps a bounded ~2.2 KB tail of stdout and the
single JSON line had grown past it at 124 queries, cutting off the head
of the line including the headline total):

- the full per-query dict goes to ``BENCH_FULL.json`` next to this file
  AND to an EARLIER stdout line (best-effort; may be truncated by bounded
  capture — the file is the durable copy);
- the FINAL stdout line is a compact summary
  ``{"metric", "value", "unit", "n_queries", "sf", "queries_file"}``
  (~130 bytes) that stays parseable at any registry size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "j1_inner_join",
    "j2_left_join_dims",
    "j3_anti_join",
    "a1_ordered_string_agg",
    "w1_topk_per_group",
    "w3_running_sum",
    "o1_global_topk",
    "agg_rollup",
    "stream_tumbling_window",
    "stream_sessionize",
    "dedup_exact",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "sim_cosine_topk",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_filters",
    "j5_asof_last_order",
    "r1_range_join_promo",
    "dedup_ngram_jaccard",
    "multimodal_frame_sample",
    "m1_migration_pipeline",
    "s7_dump_rewrite",
    "agg_approx_quantiles",
    "text_contamination",
    "multimodal_wav_features",
    "multimodal_image_resize",
    # round-3 surface
    "text_token_rarity",
    "text_pii_redaction",
    "text_global_ordinals",
    "profile_heavy_hitters",
    "multimodal_audio_frames",
    # round-4 surface
    "j6_salted_skew_join",
    "stream_late_data_policy",
    "text_chunk_windows",
    "text_bm25",
    "dedup_incremental",
    "sim_quantize_int8",
    "m2_incremental_upsert",
    "agg_pivot_event_types",
    "p7_unpivot_metrics",
    "a4_statistical_moments",
    # round-5 surface: cover every major family so perf rot can't hide
    # outside the headline set
    "dedup_clusters",
    "dedup_keep_canonical",
    "dedup_semantic",
    "sim_multi_probe_topk",
    "sim_kmeans_step",
    "events_funnel",
    "events_retention_cohorts",
    "events_session_stats",
    "stream_sliding_window",
    "stream_attribution_join",
    "text_pack_sequences",
    "text_tfidf_keywords",
    "text_lang_id",
    "agg_grouping_sets",
    "q04_order_priority",
    "f_json_extract",
    "multimodal_features",
    "text_mixture_weights",
    "sim_cluster_stats",
    "events_transition_matrix",
    "events_anomaly_buckets",
    "dedup_containment",
    "text_weighted_sample",
    "m3_scd2_history",
    "profile_table_stats",
    # round-5 deep TPC-H shapes (decorrelated subqueries, EXISTS chains)
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q11_important_stock",
    "q12_latency_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_promo_volume_suppliers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    # round-5 pipeline-QA surface
    "m4_cdc_apply",
    "sim_recall_at_k",
    "text_quality_buckets",
    "text_vocab_coverage",
    "graph_pagerank",
    "graph_degree_distribution",
    "j7_asof_nearest_order",
    "o4_keyset_pagination",
    "sim_dim_truncation_recall",
    "dedup_source_matrix",
    "events_bot_detection",
    "w5_distribution_functions",
    "a5_mode_per_group",
    "text_bigram_topk",
    "events_rfm_features",
    "text_remove_dup_spans",
    "multimodal_image_ahash",
    "sim_lsh_budget_sweep",
    "text_split_assign",
    "profile_fk_orphans",
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
    "sim_batch_topk",
    "m6_row_checksums",
    # round-6: complete registry coverage — the remaining (mostly
    # sub-0.5 s) catalog/function/text micro-queries, so the bench is
    # the FULL perf surface and no query can rot unmeasured
    "s1_catalog_tables",
    "s2_catalog_columns",
    "s3_catalog_column_lists",
    "s5_namespace_list",
    "s6_point_lookup",
    "s4_scan_projection",
    "p1_filter_pushdown",
    "p3_rename_project",
    "p6_conditional_rewrite",
    "j3_semi_join",
    "j4_repair_join",
    "a2_distinct",
    "a3_grouped_stats",
    "w2_lag_delta",
    "set_union",
    "set_intersect",
    "set_except",
    "agg_cube",
    "agg_approx_distinct",
    "p4_skip_columns",
    "w4_analytic_functions",
    "text_token_count",
    "text_fingerprint",
    "text_bpe_token_count",
    "text_stratified_sample",
    "text_repetition",
    "text_length_histogram",
    "text_sample_k_per_stratum",
    "text_duplicate_spans",
    "text_unigram_surprisal",
    # deliberate exact all-pairs baseline anchor (the recall ground
    # truth the LSH/IVF paths are judged against) — its quadratic cost
    # is BY DESIGN and documented; r13 trims the probe to the vec_id-even
    # half corpus (~2.8 s interleaved at sf0.1, was ~12 s full-corpus —
    # VERDICT r12 #4); included so even the anchor can't rot unmeasured
    "dedup_embedding_cosine",
    "stream_dedup_first",
    "f_json_typed_struct",
    "quality_quarantine",
    "f1_concat_reference",
    "f5_interval_shift",
    "f6_boolean_coercion",
    "f7_zero_date_handling",
    "f8_zero_datetime_handling",
    "f10_blob_empty",
    "f9_fk_zero_to_null",
    "f11_time_guard",
    "sim_cosine_scores",
    # round-10: the three operators that waited two rounds for a driver
    # row (VERDICT r8 #2 / r9 #1)
    "graph_triangles",
    "text_approx_strata",
    "o6_bucketed_join",
    # round-10 extension-surface additions: DSIR-style importance
    # weights + deterministic label-propagation communities
    "text_importance_weights",
    "graph_label_propagation",
    "sim_ann_pq_adc_topk",
    "sim_knn_label_audit",
    # hybrid sparse+dense retrieval with reciprocal-rank fusion
    "sim_hybrid_rrf",
    # Bloom-filter decontamination (constant-size sketch + broadcast probe)
    "text_bloom_contamination",
    # MMR diversified re-ranking (bounded greedy over the top-20)
    "sim_mmr_rerank",
    # deterministic negative sampling (contrastive training pairs)
    "graph_negative_samples",
    # round-11: the two-phase distribution-rank decomposition (the
    # declared 100 TB path for w4/w5, now exact-oracled end-to-end)
    "w7_two_phase_distribution",
    # round-11: budget-capped deterministic mixture draw
    "text_budget_sample",
    # round-12: the seven r11-queued registrations (VERDICT r11 #1)
    "dedup_recall_gate",
    "graph_k_core",
    "dedup_cdc_chunks",
    "dedup_winnowing",
    "text_cms_heavy_hitters",
    "sim_bitext_ann",
    # second declared anchor (VERDICT r11 #2): the exact cross-product
    # bitext baseline BY DESIGN (the recall ground truth behind
    # sim_bitext_ann, the exact_cosine_pairs rationale); r13 trims the
    # probe to the label%4 quarter split (~360k scored pairs / ~4.7 s
    # interleaved at sf0.1, was ~1M / ~9.8 s — VERDICT r12 #4); reported
    # under anchor_sec so pipeline_sec stays a production-path number.
    "sim_bitext_margin",
    # round-13: the two r12-queued registrations (VERDICT r12 #1)
    "dedup_minhash_incremental",
    "dedup_leakage_safe_split",
    # round-14: the twelve r13-queued registrations (VERDICT r13 #1 /
    # SURVEY §17.4) — streaming gate batch twin, incremental CC
    # maintenance, drift/changepoint monitoring, snapshot diff, the ANN
    # index-training quartet, the link-prediction pair, compaction plan
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
    # round-15: the seven r14-queued registrations (VERDICT r14 #1 /
    # SURVEY §18.1) — streaming drift audit, hard-negative mining,
    # embedding drift, IVF freshness, VAD spans, dedup method
    # agreement, schema-evolution plan
    "stream_drift_summary",
    "sim_hard_negatives",
    "profile_embedding_drift",
    "sim_ivf_freshness",
    "multimodal_vad_spans",
    "dedup_method_agreement",
    "m8_schema_evolution_plan",
    # round-16: the five r15-queued registrations (VERDICT r15 #2) —
    # language ID, alpha=0.5 sampling weights, two-sample KS drift, the
    # KS gate audit, the CDC sink audit
    "text_langid_ngram",
    "text_lang_sampling_weights",
    "events_ks_drift",
    "stream_ks_summary",
    "stream_cdc_apply_summary",
    # round-17: the seven r16-queued registrations (VERDICT r16 #1) —
    # langid mixture audit, BPE encode/fertility/learn/vocab-drift,
    # langid confusion, streaming langid gate. NOTE (VERDICT r16 #2):
    # text_langid_mixture_audit's count() plan keeps 2/12 scans
    # (outer-join elimination prunes the predicted-side pipeline), so
    # its counted number measures the 5-row spine; its honest floor is
    # recorded from a noop-write measurement (SURVEY §20.2).
    "text_langid_mixture_audit",
    "text_bpe_encode",
    "text_bpe_fertility",
    "text_bpe_learn",
    "text_langid_confusion",
    "text_bpe_vocab_drift",
    "stream_langid_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1].removeprefix("sf")
    spark = get_spark(app_name="mysql2psql_spark_bench")

    # warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # ... and the whole-stage-codegen machinery (Janino compiler init,
    # hash-agg + broadcast-join templates): without this the FIRST
    # measured query absorbs ~1 s of one-time compile infrastructure
    from pyspark.sql import functions as F

    small = spark.range(1000).select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    small.join(dim.hint("broadcast"), "k").groupBy("k").agg(F.sum("v")).collect()
    # ... and the Python worker pool + Arrow serialization path (first
    # mapInPandas otherwise pays ~1.5 s of one-time worker spawn)

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    # ... and each query's OWN generated-code classes: run the whole
    # headline set once at the smallest scale factor first. Whole-stage
    # codegen compiles per plan shape (Janino), and that one-time compile
    # (~1-3 s on the join-heavy dedup pipelines) otherwise lands inside
    # whichever sf0.1 measurement runs the shape first. Steady-state
    # latency is the number that predicts cluster behavior; the compile
    # amortizes to zero there. SPARK_GRAFT_BENCH_NO_WARMUP=1 skips.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_WARMUP") and os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is not None:
                try:
                    fn(spark, warm_dir).count()
                except Exception as exc:  # warmup must never fail the bench
                    print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # Session-scoped bucketed-table builds are SETUP, not query work
    # (VERDICT r10 #5: o6's first interleaved sample read 2.69 s vs a
    # 0.21 s steady state because the write rode the first execution):
    # the pay-the-shuffle-once layout contract means the FIRST touch in a
    # session carries a write that production amortizes across every
    # later query. Build the tables here, timed as their own artifact
    # field, so every measured sample — including the first — sees the
    # steady state a long-lived cluster sees.
    #
    # SETUP-SEAT CONTRACT (VERDICT r17 #2/#7 — the adjudicated posture):
    # a setup seat may build WRITE-ONCE LAYOUT OR MODEL ARTIFACTS ONLY —
    # bucketed table layouts and frozen offline-training products (the
    # langid profile) that production maintains outside the query path.
    # Seats must stay SESSION-SCOPED (a cold run retrains/rebuilds —
    # nothing persists across bench invocations; the scratch roots are
    # mkdtemp + atexit-cleaned), must be itemized in setup_detail below,
    # and must NEVER extend to per-query result frames or intermediates
    # of a measured query — that would be result caching, which this
    # harness forbids. The r17 verdict sanctioned the langid profile
    # seat conditionally on exactly these terms.
    setup_detail: dict[str, float] = {}

    def _timed_setup(label: str, fn_) -> None:
        t1 = time.perf_counter()
        fn_()
        setup_detail[label] = round(time.perf_counter() - t1, 3)

    t_setup = time.perf_counter()
    try:
        from mysql2psql_spark.queries.graph_q import coorder_edges, sc_pairs

        # shared part co-order edge table
        _timed_setup("coorder_edges", lambda: coorder_edges(spark, sf_dir))
        # shared supplier<->customer pair table
        _timed_setup("sc_pairs", lambda: sc_pairs(spark, sf_dir))
        fn = QUERIES.get("o6_bucketed_join")
        if fn is not None:
            # builds its two bucketed fact layouts
            _timed_setup("o6_bucketed_layouts", lambda: fn(spark, sf_dir))
        # frozen langid profile artifact (r17): trained once per
        # session, consumed by the streaming langid gate — offline
        # training is setup, not per-query work
        from mysql2psql_spark.operators.text import langid_profile_artifact
        from mysql2psql_spark.queries.text_q import _LANGID_K

        _timed_setup(
            "langid_profile_artifact",
            lambda: langid_profile_artifact(spark, sf_dir, k=_LANGID_K),
        )
    except Exception as exc:  # setup must never fail the bench
        print(f"# session setup failed: {exc}", file=sys.stderr)
    setup_sec = round(time.perf_counter() - t_setup, 3)

    def _release_persisted_rdds() -> None:
        """Free cached/persisted storage left by the previous query.

        The dedup/embedding operators materialize multiply-consumed
        aggregations via persist (operators/materialize.py), and the
        iterative operators leave localCheckpoint RDDs; both stay
        resident for the session. With 124 queries in one session the
        leftovers accumulate executor memory and their eviction/GC churn
        bleeds into LATER queries' measurements — each measured query
        should start from the same storage state. clearCache drops the
        CacheManager entries (persist path); the RDD sweep drops
        checkpoint storage the cache clear does not know about."""
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    # SPARK_GRAFT_BENCH_REPEAT=N records the per-query MEDIAN of N runs
    # instead of a single shot. Single-run totals on this host span up to
    # 3x for identical code under ambient load (documented across rounds
    # 4-6: the r6 committed artifact showed graph_pagerank at 5.19 s when
    # the steady-state median of the same code was ~2.1 s). Medians are
    # the number that compares across rounds, so since round 7 the
    # DEFAULT is 3 — the committed per-round artifact is a median run;
    # set SPARK_GRAFT_BENCH_REPEAT=1 for a quick single-shot sweep.
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    # PASS-INTERLEAVED medians (r10): run the whole headline list `repeat`
    # times and take each query's median ACROSS passes, instead of running
    # one query's reps back-to-back. Back-to-back reps sit within ~2 s of
    # each other, so a single multi-second ambient event (another process,
    # a page-cache storm, a GC on a co-tenant) spans ALL of a query's
    # samples and corrupts its median — exactly the signature of the
    # r8/r9 text_unigram_surprisal mystery (two driver artifacts at ~4 s
    # vs a 0.68 s interleaved floor for untouched code; the committed
    # PROBE_SESSION_AGE.json replayed the full 153-query prefix in one
    # session and measured the query at 0.369 s in position, refuting
    # session-age/GC-debt as the mechanism and leaving time-localized
    # interference). Pass-interleaving puts minutes between one query's
    # samples, so no single event can cover a median. Same total work,
    # same metric semantics.
    # SPARK_GRAFT_BENCH_NOOP=1 measures via a noop write (full
    # computation, no output) instead of count(). The default stays
    # count() for cross-round floor continuity, but count plans can be
    # JOIN-PRUNED (SURVEY §16 rule 15b: a spine-left-join query's row
    # count is provable without its expensive side — seven registered
    # queries under-measure by ~3.5 s total, table in §20.2); the noop
    # mode exists so protocol A/Bs and true-cost audits are one env var
    # away rather than ad-hoc scripts.
    noop = bool(os.environ.get("SPARK_GRAFT_BENCH_NOOP"))
    # Per-query protocol override (r17, VERDICT r16 #2): queries whose
    # COUNT plan is almost entirely join-pruned measure a spine, not a
    # pipeline — text_langid_mixture_audit's count plan keeps 1 of its
    # 6 scans (outer-join elimination proves the row count from the
    # 5-row language spine alone; measured 0.35 s counted vs 3.21 s
    # noop at sf0.1). Such rows ALWAYS measure via noop-write so every
    # bench number is a pipeline cost; rows= is reported -1 for them.
    # The seven legacy partially-prunable rows (§20.2) keep count() for
    # floor continuity — their counted numbers still track >40% of the
    # pipeline, and the §20.2 table is the standing correction.
    noop_always = {"text_langid_mixture_audit"}
    samples: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for p in range(repeat):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            _release_persisted_rdds()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop or name in noop_always:
                df.write.format("noop").mode("overwrite").save()
                rows[name] = -1  # noop mode computes but does not count
            else:
                rows[name] = df.count()
            samples.setdefault(name, []).append(time.perf_counter() - t0)
        print(f"# pass {p + 1}/{repeat} done", file=sys.stderr)
    times: dict[str, float] = {}
    for name, s in samples.items():
        times[name] = round(sorted(s)[len(s) // 2], 3)
        print(
            f"# {name}: {times[name]:.3f}s rows={rows[name]} "
            f"samples={[round(x, 3) for x in s]}",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)
    # anchors are deliberate O(n^2) ground-truth baselines (recall
    # oracles), ~12% of the headline sum: report them on their own line
    # item so cross-round drift in the PIPELINE total isn't dominated by
    # one by-design-quadratic query (VERDICT r8 #7 / r9 #5). "value"
    # stays the all-queries total for cross-round continuity.
    anchors = {"dedup_embedding_cosine", "sim_bitext_margin"}
    anchor_total = round(sum(v for k, v in times.items() if k in anchors), 3)
    pipeline_total = round(total - anchor_total, 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "pipeline_sec": pipeline_total,
        "anchor_sec": anchor_total,
        "setup_sec": setup_sec,
        "setup_detail": setup_detail,
        "queries": times,
        "sf": float(sf),
        "repeat": repeat,
        "protocol": "noop" if noop else "count",
        "noop_always": sorted(noop_always),
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"# could not write {full_path}: {exc}", file=sys.stderr)
    print(json.dumps(full))  # earlier line: full detail (may be tail-truncated)
    # "top": the 25 most expensive queries at centisecond precision
    # (~1 KB) — per-query data that SURVIVES the driver's bounded tail
    # capture, so round-over-round PERF can compute a real per-query
    # comparison (VERDICT r17 #3: the full `queries` dict lives in an
    # earlier, tail-truncated line and in BENCH_FULL.json, which the
    # driver does not read; two rounds of PERF had n_common == 0).
    # Additive only: the final line keeps every existing field.
    top = {
        k: round(v, 2)
        for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:25]
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "pipeline_sec": pipeline_total,
                "anchor_sec": anchor_total,
                "setup_sec": setup_sec,
                "n_queries": len(times),
                "sf": float(sf),
                "repeat": repeat,
                "protocol": "noop" if noop else "count",
                "noop_always": sorted(noop_always),
                "queries_file": "BENCH_FULL.json",
                "top": top,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
