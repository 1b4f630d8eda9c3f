"""5-10x scale probe: replicate the sf0.1 corpus and rerun the heavy
operators to check the wall-time growth curve (the README table).

Replication scheme (matches the round-3/4 probes):
- documents x DOC_REPS: replica k offsets doc_id by k * 10_000_000 and
  keeps text identical, so every original near-dup pair fans out to
  DOC_REPS^2 cross-replica pairs — output grows ~200x while input grows
  5x, stressing candidate generation far harder than a fresh corpus
  would.
- embeddings x VEC_REPS: replica k scales every vector by (1 + k/10)
  and offsets vec_id by k * 10_000_000. Scaling preserves cosine
  exactly, so each vector gains VEC_REPS-1 exact-cosine duplicates.

Usage: python scripts/scale_probe.py  [--doc-reps 5] [--vec-reps 10]
Writes replicas under /tmp/scale_probe/ and prints one line per op.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/scale_probe"

PROBED = [
    "dedup_embedding_lsh",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "text_contamination",
    "graph_pagerank",
    # round-5 late additions: gram-keyed LM scoring, blocked ER join,
    # value-bounded window, key-merge maintenance
    "text_bigram_surprisal",
    "dedup_fuzzy_blocked",
    "w6_time_range_rolling",
    "m5_agg_maintenance",
    "sim_ann_ivf_rerank_topk",
    "sim_batch_topk",
    # round-6 additions: the CDC/SCD2/checksum migration family
    # (m4 rides the events replication — user_id kept, so per-key
    # changelog density grows 5x; m3 rides the customer replication —
    # c_custkey kept, so every version chain grows 5x; m6 rides the
    # orders replication — 5x rows through one md5+BIT_XOR scan)
    "m3_scd2_history",
    "m4_cdc_apply",
    "m6_row_checksums",
    # round-10 registrations: triangles rides the lineitem replication
    # (5x raw pair volume into the SAME distinct graph — the collect_set
    # dedup absorbs the multiplicity, so the triangle stages should stay
    # ~flat while the edge build grows linearly); o6 rides lineitem +
    # orders (5x fact rows through the bucketed write + exchange-free
    # join); approx_strata rides documents (5x per-language density
    # through the percentile sketch — sketch size is constant, so the
    # aggregation should scale with the scan).
    "graph_triangles",
    "o6_bucketed_join",
    "text_approx_strata",
    # round-10 late additions: label propagation rides the lineitem
    # replication like triangles (5x raw pair volume, same distinct
    # graph); DSIR importance weights ride documents (5x corpus through
    # the hashed-ngram feature scan); PQ-ADC rides embeddings (10x
    # vectors through the quantize projection + Arrow encode kernel —
    # linear scan, no corpus shuffle).
    "graph_label_propagation",
    "text_importance_weights",
    "sim_ann_pq_adc_topk",
    # kNN label audit rides embeddings (10x vectors -> 10x cluster sizes
    # -> 100x work in the cluster-local quadratic kernel: the harsher
    # direction; growing the cluster COUNT instead is embarrassingly
    # parallel).
    "sim_knn_label_audit",
    # hybrid RRF rides BOTH replications (5x docs through the BM25
    # stats + 10x vectors through the dense scan); each arm still ends
    # in a top-50 TakeOrderedAndProject, so the fusion join stays at
    # <=100 rows and wall time should track the two scans linearly.
    "sim_hybrid_rrf",
    # Bloom decontamination rides documents (5x corpus through the
    # row-local probe; the filter build stays benchmark-sized and the
    # word table is constant at M/W rows — wall should track the scan).
    "text_bloom_contamination",
    # MMR rides embeddings (10x vectors through the flat-projection
    # relevance scan + TakeOrdered(20); the greedy stays 20x20 ints
    # regardless, so wall should track the linear scan only).
    "sim_mmr_rerank",
    # negative sampling rides lineitem (5x raw pair volume into the SAME
    # distinct graph: vertex set, anchors, and draws are unchanged, so
    # the anti-join probes the same edges and wall tracks the edge build).
    "graph_negative_samples",
    # r11: the two-phase distribution decomposition rides events (event
    # replicas KEEP event_type, so each type's stream grows 5x — the
    # per-key direction the bucket decomposition exists for; the plain
    # w5 window funnels each 5x stream through one task).
    "w7_two_phase_distribution",
    # r11: the budget-capped draw rides documents (5x corpus under the
    # SAME per-language token budget — selected prefixes change, since
    # new doc_ids hash into the draw order, but the OUTPUT stays
    # budget-bounded and the wall should track the token-count scan).
    "text_budget_sample",
    # r12 registrations (first probed ad-hoc in r11; the recall gate is
    # new here — it rides documents with BOTH its pipelines fanning
    # cross-replica pairs ~25x while the output stays ONE row, so wall
    # should track the two candidate joins, not the pair count).
    "dedup_recall_gate",
    "dedup_cdc_chunks",   # wall flat at 5x dup density (r11 measured)
    "dedup_winnowing",    # match join bounded by per-hash df, not pairs
    "text_cms_heavy_hitters",  # fixed d x w grid; wall tracks the scan
    "graph_k_core",       # same distinct graph under 5x raw pair volume
    "sim_bitext_ann",     # x1.9 wall at 10x vectors (r11); 0 rows by
    # design there (cosine-identical replicas saturate neighborhoods ->
    # margins collapse to ~1.0 < 1.1 — the miner suppressing
    # duplicate-dense hubs is its published purpose)
    # sim_bitext_margin deliberately NOT probed: it REFUSES at 10x
    # (10250 x 9750 > the 2.5e7 counted gate) — that refusal is its
    # scale contract and is pinned in test_operators.
    # r14 registrations (first probed at queue time, r13 — numbers in
    # each query's verification record + README scale table):
    "stream_near_dup_gate",        # x1.5 wall at 5x docs, x25 output —
    # per-trigger cost is band-collision-bounded, not corpus-bounded
    "dedup_clusters_incremental",  # x2.6 wall at 5x docs under ~25x
    # pair fan-out — truth-pipeline-bound (the recall gate's class)
    "profile_drift_psi",   # one corpus scan; bucket-sized output
    "events_changepoint",  # dense hourly spine; one (type,bucket) agg
    "m7_snapshot_diff",    # rides orders 5x through one full-outer join
    "sim_kmeans_train",    # per iteration: one Arrow assignment pass +
    # one (cluster,dim) agg emitting k*d rows regardless of corpus
    "sim_pq_train_step",   # pre-aggregated codebook-sized partials;
    # the corpus never shuffles
    "sim_centroid_prune",  # centroid count bounds per-task window size
    "sim_ivf_probe_sweep", # one scored scan; arms derived row-locally
    "graph_jaccard_neighbors",  # wedge-join candidates, never all pairs
    "graph_adamic_adar",        # same wedge machinery, weighted terms
    "o7_compaction_plan",  # inventory-sized agg; pack window on the
    # inventory frame only
    # r15 registrations (first probed at queue time, r14 — numbers in
    # each query's verification record):
    "stream_drift_summary",   # x1.2 wall at 5x events; two parity
    # triggers + bucket-sized full-outer audit join
    "sim_hard_negatives",     # cluster-blocked int64 kernel; x10
    # vectors probed — blocked quadratic bounded by cluster size
    "profile_embedding_drift",  # one assignment pass; centroid-sized agg
    "sim_ivf_freshness",      # one assignment pass + one agg; flat at 10x
    "multimodal_vad_spans",   # row-local decode; x1.1 wall at 5x docs
    "dedup_method_agreement", # three at-floor method pipelines; pair
    # sets bounded by each method's banding, never all-pairs
    # m8_schema_evolution_plan deliberately NOT probed: SF-INVARIANT by
    # construction (catalog-only — identical 44-row plan at all SFs,
    # pinned in test_operators); replica probing would measure nothing.
    # r16 registrations (first probed at queue time, r15 — numbers in
    # each query's verification record):
    "stream_cdc_apply_summary",  # wall flat at 5x events; trigger-job
    # fixed overhead dominates, compaction exchange grows linearly
    "text_langid_ngram",      # x1.15 wall at 5x docs; profile table
    # constant (langs x 40), gram scans dominate
    "events_ks_drift",        # wall flat on BOTH growth axes (5x rows
    # via value-replicas; 5x ECDF table via perturbed values — r15)
    "stream_ks_summary",      # two parity triggers over value-table-
    # sized partials; the stream_drift_summary class
    # text_lang_sampling_weights deliberately NOT probed: output is
    # n_langs rows at any SF (one map-side-combined agg + a 1-row
    # window); replica probing measures nothing beyond the scan.
    # r17 registrations (first probed at queue time, r16 — numbers in
    # each query's verification record):
    "text_langid_mixture_audit",  # rides the langid class; spine join
    # adds an n_langs-row left join only
    "text_bpe_encode",        # chained folds over the distinct-word
    # frame; 5x docs grows the word scan linearly, vocab work flat
    "text_bpe_fertility",     # flat at 5x docs (1.224 -> 0.819);
    # per-language integer sums over the encoded frame
    "text_bpe_learn",         # FLAT at 5x docs (2.919 -> 2.634);
    # per-iteration work is vocab-sized regardless of corpus size
    "text_langid_confusion",  # x1.65 wall at 5x docs — sublinear,
    # gram-scan-bound, the langid class
    "text_bpe_vocab_drift",   # x1.4 at 5x docs; two linear word-count
    # scans, vocab work flat
    "stream_langid_summary",  # x1.2 at 5x docs; trigger/pipeline-bound
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-reps", type=int, default=5)
    ap.add_argument("--vec-reps", type=int, default=10)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of the probed query names to run",
    )
    args = ap.parse_args()
    probed = PROBED if args.only is None else [
        n for n in args.only.split(",") if n in QUERIES
    ]

    from pyspark.sql import functions as F

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = None
    for k in range(args.doc_reps):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10_000_000))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    reps = None
    for k in range(args.vec_reps):
        r = emb.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            F.transform("embedding", lambda x: x * (1.0 + k / 10.0)).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # lineitem/orders x DOC_REPS for the graph probe: replica k offsets
    # the order keys (join stays consistent) AND the customer keys, so
    # the customer side of the supplier<->customer graph grows 5x in
    # NODES while the shared suppliers grow 5x in DEGREE — hub stress,
    # the pattern that breaks naive all-pairs graph code.
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    reps = None
    for k in range(args.doc_reps):
        r = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    reps = None
    for k in range(args.doc_reps):
        r = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 1_000_000))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    # events x DOC_REPS for the window probe: replica k offsets event_id
    # but KEEPS user_id, so per-user event density grows 5x — each
    # rolling RANGE frame holds 5x the rows, the harsher direction for a
    # value-bounded window (vs growing the user population).
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    reps = None
    for k in range(args.doc_reps):
        r = ev.withColumn("event_id", F.col("event_id") + F.lit(k * 1_000_000_000))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/events.parquet")

    # customer x DOC_REPS for the SCD2 probe: replicas KEEP c_custkey,
    # so every key's per-version row group grows 5x — the per-key window
    # sort is the scaling dimension for history builds (the harsher
    # direction vs growing the key population, which only widens the
    # hash exchange).
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    reps = None
    for k in range(args.doc_reps):
        reps = cust if reps is None else reps.unionByName(cust)
    reps.write.mode("overwrite").parquet(f"{DST}/customer.parquet")

    # part x DOC_REPS for the blocked-ER probe: replica k suffixes a
    # revision token onto the name, so every block gains 5x members and
    # cross-revision near-matches (edit distance 1) — per-block
    # quadratic stress while the block count stays fixed.
    part = spark.read.parquet(f"{SRC}/part.parquet")
    reps = None
    for k in range(args.doc_reps):
        r = part.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(k * 10_000_000)
        ).withColumn("p_name", F.concat(F.col("p_name"), F.lit(f" rev{k}")))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{DST}/part.parquet")

    # session-setup (r11, same discipline as bench.py): the write-once
    # bucketed graph tables are layout work — build them for BOTH dirs
    # before timing, so the probed walls measure the steady query (the
    # one-time 5x build+write is reported on its own line).
    try:
        from mysql2psql_spark.queries.graph_q import coorder_edges, sc_pairs

        for d in (SRC, DST):
            t0 = time.perf_counter()
            coorder_edges(spark, d)
            sc_pairs(spark, d)
            print(f"# graph-table setup {d}: {time.perf_counter() - t0:.2f}s", flush=True)
    except Exception as exc:
        print(f"# session setup failed: {exc}", flush=True)

    for name in probed:
        fn = QUERIES[name]
        # warm the plan shape at base scale, like bench.py does
        fn(spark, SRC).count()
        t0 = time.perf_counter()
        base_n = fn(spark, SRC).count()
        t_base = time.perf_counter() - t0
        t0 = time.perf_counter()
        big_n = fn(spark, DST).count()
        t_big = time.perf_counter() - t0
        print(
            f"{name}: base {t_base:.2f}s ({base_n} rows) -> "
            f"replicated {t_big:.2f}s ({big_n} rows), wall x{t_big / t_base:.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
