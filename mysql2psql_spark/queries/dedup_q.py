"""Scale-path dedup + multimodal queries.

dedup_minhash_lsh / dedup_simhash are probabilistic-candidate operators
(exact-verified for MinHash), so they carry no SQL oracle — the driver
records the weaker rows-only check, and tests/test_operators.py pins
their agreement with the exact dedup_ngram_jaccard verifier instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2psql_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
from mysql2psql_spark.operators.multimodal import extract_features, with_binary_payload
from mysql2psql_spark.operators.text import shingle_hash_table
from mysql2psql_spark.queries import query
from mysql2psql_spark.sources import load_table


@query("dedup_minhash_lsh")  # rows-only: probabilistic candidate generation
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(shingle_hash_table(d), threshold=0.5)


@query("dedup_simhash")  # rows-only: Hamming-band candidates
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash features = 3-word shingle hashes (unigram features are
    # useless on a small vocabulary: every doc has nearly the same word
    # set, so unigram SimHashes collide corpus-wide)
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(shingle_hash_table(d), max_hamming=7)


# ---------------------------------------------------------------------------
# Multimodal plumbing: binary payload -> Arrow-batched mapInPandas feature
# extraction. The deterministic stub (size + 4-byte magic hex) is fully
# oracle-checkable, so the Spark-side contract is hash-verified even though
# the real codec is stubbed.
# ---------------------------------------------------------------------------
@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           SUBSTR(UPPER(HEX(ENCODE(text))), 1, 8) AS head_hex
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(d))


# Frame sampling (video keyframe shape): 16-byte frames, every 4th kept.
# The oracle restates the chunking as hex-substring arithmetic.
@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(j AS INT) AS frame_idx,
           UPPER(SUBSTR(HEX(ENCODE(text)), CAST(j AS INT) * 32 + 1, 32)) AS frame_hex
    FROM documents,
         LATERAL (SELECT UNNEST(RANGE(0, CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 16.0) AS INT), 4)) AS j)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(d))


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the exact-Jaccard pair
# graph, cluster id = min reachable doc id (the canonical-representative
# step after candidate generation). The oracle walks the same graph with
# a recursive CTE.
# ---------------------------------------------------------------------------
from mysql2psql_spark.queries import ORACLE as _ORACLE_REG  # noqa: E402
from mysql2psql_spark.queries.text_q import dedup_ngram_jaccard  # noqa: E402

_PAIRS_SQL = _ORACLE_REG["dedup_ngram_jaccard"]


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst != r.src
    )
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.operators.dedup import connected_components

    return connected_components(dedup_ngram_jaccard(spark, sf_dir))
