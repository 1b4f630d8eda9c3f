"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exact baseline: a broadcast of the query
vector(s) against a linear scan — embarrassingly parallel, no shuffle.
The scale path (IVF/LSH bucketing) trades exactness for pruning; see
operators/dedup.py for the LSH machinery shared with MinHash.

Dot products use F.zip_with + F.aggregate with DOUBLE accumulation in
array order, which matches DuckDB's list_cosine_similarity on DOUBLE[]
bit-for-bit in practice (results are still rounded before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_scores(
    embeddings: DataFrame,
    query_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Cosine of every (embedding, query) pair. ``query_vectors`` is small
    by construction (the probe set) and is broadcast — the big side never
    shuffles, so this scales to any corpus size; cost is |corpus| x |probes|
    fused multiply-adds inside codegen."""
    return embeddings.crossJoin(F.broadcast(query_vectors)).select(
        F.col(id_col),
        F.col(query_id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim"),
    )
