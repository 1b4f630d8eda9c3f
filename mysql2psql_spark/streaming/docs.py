"""Structured Streaming twins of the document-dedup gates.

A continuously-ingesting training pipeline dedups ARRIVING documents,
not the standing corpus: each micro-batch is fingerprinted and gated
(a) against everything already seen on the stream and (b) against the
frozen corpus fingerprint set. The batch semantics are defined and
oracle-checked by ``queries/text_q.py::dedup_exact`` and
``queries/dedup_q.py::dedup_incremental``; these wire the same
expressions through readStream.

State-size posture: the cross-batch dedup state is ONE 16-byte md5 per
distinct document ever seen (dropDuplicates on the fingerprint column),
the minimal state any exact streaming dedup can hold — there is no
time bound on content recurrence, so no watermark applies. The
stream-static corpus join keeps NO streaming state at all: the corpus
side is a static frame that Spark re-plans per micro-batch (broadcast
while it fits; hash join keyed by the uniform md5 otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream (swap for kafka in production; schema
    contract identical)."""
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(path)


def read_document_stream_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL landing-zone stream — the common real-world arrival format
    (sources/jsonl.py documents the splittability/escaping rationale):
    upstream crawlers drop .jsonl shards into a directory and each
    micro-batch picks up the new files. Schema-first, like the batch
    reader; dirty lines surface as all-null rows rather than killing the
    stream (file streams cannot FAILFAST retroactively), so the gates
    downstream treat null text as quarantine."""
    return spark.readStream.schema(DOCUMENTS_SCHEMA).json(path)


def content_dedup_stream(stream: DataFrame) -> DataFrame:
    """First arrival of each distinct content fingerprint survives; every
    later duplicate — same batch or any later batch — is dropped.
    Streaming twin of ``dedup_exact``'s keep-first semantics."""
    return stream.withColumn("fp", F.md5("text")).dropDuplicates(["fp"])


def incremental_dedup_stream(stream: DataFrame, corpus_fps: DataFrame) -> DataFrame:
    """Flag each arriving document whose fingerprint already exists in the
    standing corpus (stream-static left join on the md5 key) — the
    streaming twin of ``dedup_incremental``. ``corpus_fps`` is a static
    frame with a single ``fp`` column (distinct)."""
    gated = (
        stream.withColumn("fp", F.md5("text"))
        .join(corpus_fps.withColumn("_hit", F.lit(True)), "fp", "left")
        .select(
            "doc_id",
            "fp",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("dup_of_corpus"),
        )
    )
    return gated


def near_dup_gate_foreach_batch(
    corpus_shingles: "DataFrame | None",
    out_dir: str,
    threshold: float = 0.5,
    caches=None,
    corpus_tables=None,
    n_parts: "int | None" = None,
):
    """foreachBatch gate: NEAR-dup flag each arriving micro-batch against
    the standing corpus — the streaming face of
    ``queries/dedup_q.py::dedup_minhash_incremental`` (exact-fingerprint
    ``incremental_dedup_stream`` catches only verbatim recurrence; this
    catches edits/near-copies via the same banding + exact-verify as the
    batch twin, whose DuckDB oracle defines the semantics).

    ``corpus_shingles`` is the STANDING corpus's exploded (doc_id, sh)
    frame — at 100 TB a persisted ingest artifact whose banded tables
    the gate probes; here its banded tables are built and persisted ONCE
    at gate construction (register their release on ``caches`` — the
    CacheHandle convention — for when the stream stops). Per-trigger
    cost is the batch operator's: new x corpus band collisions only,
    however large the corpus.

    Executor-storage posture (ADVICE r12): the gate keeps no Spark
    STREAMING state, and per-trigger CACHE state is bounded too — the
    batch-side MinHash frame each trigger persists differs per
    micro-batch plan (CacheManager dedup never applies across triggers),
    so it is released at the end of every ``apply`` via a per-trigger
    CacheHandle; only the one shared corpus-side frame persists for the
    gate's lifetime. Without this, a long-running stream accumulates one
    cached frame per trigger for its lifetime.

    Writes are batch_id-versioned (``{out_dir}/batch=<id>`` overwrite —
    the cdc_foreach_batch_sink idempotence discipline), so at-least-once
    replays still yield exactly-once gate output."""
    from mysql2psql_spark.operators.dedup import (
        _minhash_tables,
        minhash_lsh_cross_pairs,
    )
    from mysql2psql_spark.operators.materialize import CacheHandle
    from mysql2psql_spark.operators.text import shingle_hash_table

    # ``corpus_tables`` lets a caller that ALSO probes the corpus (the
    # stream_near_dup_gate summary query's batch twin) share one build —
    # the 100 TB shape, where the banded tables are one standing ingest
    # artifact. Caller-owned: not registered on ``caches`` here.
    if corpus_tables is None:
        if corpus_shingles is None:
            raise ValueError("need corpus_shingles or corpus_tables")
        corpus_tables = _minhash_tables(corpus_shingles, n_parts=n_parts)
        if caches is not None:
            caches.append(corpus_tables[0])

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        with CacheHandle() as batch_caches:
            pairs = minhash_lsh_cross_pairs(
                shingle_hash_table(batch_df),
                None,
                threshold=threshold,
                caches=batch_caches,
                corpus_tables=corpus_tables,
                n_parts=n_parts,
            )
            pairs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


# ---------------------------------------------------------------------------
# Streaming language-ID gate: the production deployment shape of
# text_langid_ngram — profiles are TRAINED OFFLINE (frozen, broadcast,
# languages x k rows) and arriving documents are classified per
# micro-batch; each trigger writes its (lang_pred, n_docs) COUNT
# partial batch_id-versioned under the shared lineage guard (the
# drift/KS/CDC discipline). Classification is PER-DOCUMENT PURE given
# frozen profiles (the doc-profile window partitions by doc_id; the
# scoring join reads only broadcast state), so per-batch counts are
# associative and the compacted summary equals the one-shot batch
# classification for ANY micro-batch partitioning of the same docs.
# Per-trigger cost: one batch-sized gram pipeline against broadcast
# profiles; streaming state ZERO.
# ---------------------------------------------------------------------------
def langid_counts_foreach_batch(
    profiles: DataFrame,
    langs: DataFrame,
    out_dir: str,
    lineage: str | None = None,
    k: int = 40,
    caches=None,
):
    """Return a foreachBatch function classifying each micro-batch of
    documents (doc_id, text) against the FROZEN ``profiles`` table and
    writing the per-batch (lang_pred, n_docs) partial to
    ``{out_dir}/batch=<id>``. ``profiles``/``langs`` are materialized at
    gate construction and their release registered on ``caches`` (the
    CacheHandle convention — REQUIRED, r17 ADVICE: a handle-less gate
    would leak executor cache for the session): without the persist
    each trigger would re-run the whole profile TRAINING pipeline, and
    a training re-run mid-stream would also violate the frozen-profiles
    contract the associativity argument rests on."""
    from mysql2psql_spark.operators.materialize import materialize
    from mysql2psql_spark.operators.text import char_ngram_table, langid_classify
    from mysql2psql_spark.streaming.events import _guard_versioned_out_dir

    if caches is None:
        raise ValueError(
            "langid_counts_foreach_batch requires a CacheHandle (caches=): "
            "the gate persists the frozen profile tables at construction "
            "and the caller must own their release"
        )
    profiles = materialize(profiles)
    langs = materialize(langs)
    caches.append(profiles)
    caches.append(langs)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _guard_versioned_out_dir(
            batch_df.sparkSession, out_dir, lineage, batch_id, gate="langid gate"
        )
        grams = char_ngram_table(batch_df)
        pred = langid_classify(grams, profiles, k=k, langs=langs)
        part = pred.groupBy("lang_pred").agg(
            F.count("*").cast("bigint").alias("n_docs")
        )
        part.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


def read_langid_summary(spark: SparkSession, out_dir: str) -> DataFrame:
    """Predicted-language document counts over everything the gate has
    seen: sum the per-batch partials (associative) — identical to the
    one-shot batch classification aggregated by lang_pred. The same
    roll-up-compaction contract as the drift/KS gates applies."""
    schema = "lang_pred string, n_docs bigint"
    parts = spark.read.schema(schema).parquet(f"{out_dir}/batch=*")
    return parts.groupBy("lang_pred").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Streaming quality gate: the production deployment shape of
# text_quality_score — the corpus side tables (unigram tf + total,
# shingle document frequencies) are TRAINED OFFLINE (frozen,
# vocabulary-sized) and arriving documents are scored and bucketed per
# micro-batch; each trigger writes its (bucket, n_docs,
# sum_score_micro) partial batch_id-versioned under the shared lineage
# guard (the drift/KS/CDC/langid discipline). Scoring is PER-DOCUMENT
# PURE given the frozen tables (quality_signals_frozen: every join
# reads only the frozen side state; out-of-corpus tokens fall back to
# tf=1, shingles to df=1 — deterministic, no corpus feedback), so
# per-batch count/sum partials are associative and the compacted
# summary equals the one-shot batch scoring for ANY micro-batch
# partitioning. Per-trigger cost: one batch-sized signal pipeline
# against the frozen tables; streaming state ZERO.
# ---------------------------------------------------------------------------
def quality_counts_foreach_batch(
    tf: DataFrame,
    tot: DataFrame,
    dfreq: DataFrame,
    out_dir: str,
    lineage: str | None = None,
    caches=None,
):
    """Return a foreachBatch function scoring each micro-batch of
    documents against the FROZEN (tf, tot, dfreq) quality tables and
    writing the per-batch (bucket, n_docs, sum_score_micro) partial to
    ``{out_dir}/batch=<id>``. The tables are materialized at gate
    construction and their release registered on ``caches`` (the
    CacheHandle convention — REQUIRED, the langid-gate rule): without
    the persist each trigger would re-run the corpus-sized tf/df
    TRAINING pipelines, and a training re-run mid-stream would violate
    the frozen contract the associativity argument rests on."""
    from mysql2psql_spark.operators.materialize import materialize
    from mysql2psql_spark.operators.text import quality_signals_frozen
    from mysql2psql_spark.streaming.events import _guard_versioned_out_dir

    if caches is None:
        raise ValueError(
            "quality_counts_foreach_batch requires a CacheHandle (caches=): "
            "the gate persists the frozen quality tables at construction "
            "and the caller must own their release"
        )
    tf = materialize(tf)
    tot = materialize(tot)
    dfreq = materialize(dfreq)
    caches.append(tf)
    caches.append(tot)
    caches.append(dfreq)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _guard_versioned_out_dir(
            batch_df.sparkSession, out_dir, lineage, batch_id, gate="quality gate"
        )
        scored = quality_signals_frozen(batch_df, tf, tot, dfreq)
        part = scored.groupBy("bucket").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("score_micro").cast("bigint").alias("sum_score_micro"),
        )
        part.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


def read_quality_summary(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-bucket document counts + score mass over everything the gate
    has seen: sum the per-batch partials (associative — count and sum
    both) — identical to the one-shot batch scoring aggregated by
    bucket. The same roll-up-compaction contract as the other gates."""
    schema = "bucket string, n_docs bigint, sum_score_micro bigint"
    parts = spark.read.schema(schema).parquet(f"{out_dir}/batch=*")
    return parts.groupBy("bucket").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_score_micro").cast("bigint").alias("sum_score_micro"),
    )
