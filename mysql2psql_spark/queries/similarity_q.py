"""Similarity-search queries over `embeddings` (ANN surface).

Brute-force cosine against a probe vector is the exact baseline (oracle-
checked against DuckDB's list_cosine_similarity on DOUBLE[]); rounding
happens before any ordering/filtering so rank boundaries are identical in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2psql_spark.operators.similarity import brute_force_scores
from mysql2psql_spark.queries import query
from mysql2psql_spark.sources import load_table


def _scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return brute_force_scores(emb, probe).filter(F.col("vec_id") != 0)


_ORACLE_SCORES = """
    WITH probe AS (
      SELECT CAST(embedding AS DOUBLE[]) AS q_vec
      FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), p.q_vec), 6) AS cos_sim
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id != 0
"""


@query("sim_cosine_scores", oracle=_ORACLE_SCORES)
def sim_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scores(spark, sf_dir).select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


@query(
    "sim_cosine_topk",
    oracle=f"SELECT vec_id, cos_sim FROM ({_ORACLE_SCORES}) ORDER BY cos_sim DESC, vec_id LIMIT 10",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scores(spark, sf_dir).select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    # Round BEFORE ranking so ties break on vec_id identically in both
    # engines; TakeOrderedAndProject keeps this a no-shuffle top-k.
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)


# Multi-probe batch ANN: k probes broadcast against the corpus in one
# pass, per-probe top-3 via window rank (the serving-batch shape: cost is
# |corpus| x |probes| fused multiply-adds, one shuffle for the rank).
_ORACLE_MULTI = """
    WITH probes AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT p.q_id, e.vec_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), p.q_vec), 6) AS cos_sim
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id != p.q_id
    )
    SELECT q_id, vec_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 3
"""


@query("sim_multi_probe_topk", oracle=_ORACLE_MULTI)
def sim_multi_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = brute_force_scores(emb, probes).filter(F.col("vec_id") != F.col("q_id"))
    scored = scored.select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    rn = F.row_number().over(W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id"))
    return scored.withColumn("rn", rn).filter(F.col("rn") <= 3).drop("rn")
