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
