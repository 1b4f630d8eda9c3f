"""Embedding-dedup and ANN queries over `embeddings` (vec_id, embedding
float[64], label).

All three are fully oracled, including the LSH-based ones: the hyperplanes
are deterministic literals, so the DuckDB oracle reproduces the identical
signature -> banding/pruning -> exact-verify pipeline in ANSI SQL. The
testdata embeddings are near-isotropic (max pairwise cosine ~0.51), so the
near-dup threshold is 0.4 to exercise non-trivial output; the high-cosine
recall regime is pinned by tests/test_operators.py on synthetic perturbed
clusters instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql2psql_spark.operators.embedding import (
    TABLE_R,
    TABLES_L,
    ann_topk_ivf,
    ann_topk_lsh,
    exact_cosine_pairs,
    hyperplanes,
    lsh_cosine_pairs,
    signature_sql,
    table_keys_sql,
)
from mysql2psql_spark.queries import query
from mysql2psql_spark.sources import load_table

_PLANES = hyperplanes()
_SIG = signature_sql("CAST(embedding AS DOUBLE[])", _PLANES)
_THRESHOLD = 0.4

_ORACLE_EXACT = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) >= {_THRESHOLD}
"""


@query("dedup_embedding_cosine", oracle=_ORACLE_EXACT)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return exact_cosine_pairs(emb, _THRESHOLD)


# L independent table keys per vector; a pair is a candidate iff it
# collides in >= 1 table — the oracle states the OR-construction as a
# disjunction over key equalities.
_PLANES_LSH = hyperplanes(TABLES_L * TABLE_R)
_KEYS = table_keys_sql("CAST(embedding AS DOUBLE[])", _PLANES_LSH)
_KEY_COLS = ",\n             ".join(f"{k} AS k{t}" for t, k in enumerate(_KEYS))
_KEY_MATCH = " OR ".join(f"a.k{t} = b.k{t}" for t in range(TABLES_L))
_ORACLE_LSH = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_KEY_COLS}
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ({_KEY_MATCH})
      AND ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) >= {_THRESHOLD}
"""


@query("dedup_embedding_lsh", oracle=_ORACLE_LSH)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(emb, _THRESHOLD, planes=_PLANES_LSH)


_ORACLE_ANN = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_SIG} AS sig
      FROM embeddings
    ),
    probe AS (SELECT v AS q_vec, sig AS q_sig FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(LIST_COSINE_SIMILARITY(e.v, p.q_vec), 6) AS cos_sim
    FROM e CROSS JOIN probe p
    WHERE e.vec_id != 0 AND BIT_COUNT(XOR(e.sig, p.q_sig)) <= 6
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
"""


@query("sim_ann_lsh_topk", oracle=_ORACLE_ANN)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Hamming budget 6 of 16 bits: on the near-isotropic testdata this
    # scores ~27% of the corpus (captures the true top-1 at hamming 6);
    # clustered production embeddings prune far more sharply at the same
    # budget because true neighbors sit at hamming 0-2.
    return ann_topk_lsh(emb, probe_id=0, k=10, max_hamming=6, planes=_PLANES)


# IVF ANN: 16 deterministic seed centroids (first 16 vectors), assign by
# highest rounded cosine (ties -> lowest seed), probe the 4 lists nearest
# the query, exact-score survivors. The oracle restates coarse
# quantization + multi-probe + rerank in ANSI SQL.
_ORACLE_IVF = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT vec_id AS sid, v AS sv FROM e WHERE vec_id < 16),
    assign AS (
      SELECT e.vec_id, e.v, s.sid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(LIST_COSINE_SIMILARITY(e.v, s.sv), 6) DESC, s.sid
             ) AS rn
      FROM e CROSS JOIN seeds s
    ),
    clus AS (SELECT vec_id, v, sid FROM assign WHERE rn = 1),
    probe AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probe_clusters AS (
      SELECT s.sid FROM seeds s CROSS JOIN probe p
      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, s.sv), 6) DESC, s.sid
      LIMIT 4
    )
    SELECT c.vec_id, ROUND(LIST_COSINE_SIMILARITY(c.v, p.qv), 6) AS cos_sim
    FROM clus c JOIN probe_clusters pc ON c.sid = pc.sid CROSS JOIN probe p
    WHERE c.vec_id != 0
    ORDER BY cos_sim DESC, c.vec_id
    LIMIT 10
"""


@query("sim_ann_ivf_topk", oracle=_ORACLE_IVF)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_ivf(emb, probe_id=0, k=10, n_centroids=16, n_probe=4)
