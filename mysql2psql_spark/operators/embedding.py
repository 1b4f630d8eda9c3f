"""Embedding-space operators: cosine near-dup pairs and ANN top-k.

Extension surface beyond the reference (which has no vector data; SURVEY.md
§7 step 8): the operators a training-data pipeline runs over an
`array<float>` embedding column.

Three tiers, all DataFrame-native:

- exact all-pairs cosine (`exact_cosine_pairs`): the correctness baseline.
  O(n^2) — fine for verification scales, NOT the 100 TB path.
- hyperplane-LSH near-dup (`lsh_cosine_pairs`): sign-bit signatures from
  B fixed random hyperplanes; band the B bits into chunks and equi-join on
  (chunk_idx, chunk_value) so candidate generation is a hash-partitioned
  join instead of a cross join; exact cosine verifies candidates. By
  SimHash theory P[sign differs] = theta/pi per hyperplane, so a
  cosine-0.95 pair (theta ~ 18deg) lands at expected Hamming ~0.1*B and
  chunked banding (pigeonhole: Hamming < n_chunks implies >= 1 exact chunk
  match) catches it with near-certainty.
- LSH-pruned ANN top-k (`ann_topk_lsh`): score only vectors whose
  signature is within `max_hamming` of the probe's, then exact cosine
  top-k within the pruned set. With data bucketed/partitioned by
  signature, the filter becomes partition pruning at scale.

The hyperplanes are DETERMINISTIC literals (seeded numpy, rounded to 6
decimals) shared with the SQL oracles, so even the "approximate"
operators are exactly reproducible in DuckDB — the oracle expresses the
same signature + banding + verify logic in ANSI SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql2psql_spark.operators.similarity import cosine

DIM = 64
BITS = 16
CHUNKS = 8  # 8 chunks x 2 bits: lossless for pairs at Hamming <= 7


def hyperplanes(bits: int = BITS, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    """The fixed hyperplane matrix, rounded so Spark and the SQL oracle
    compute from identical literals."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((bits, dim))]


def signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as one integer: bit i set iff vec . plane_i > 0.
    Pure codegen'd expressions — one fused pass over the array per plane."""
    sig = F.lit(0).cast("long")
    for i, w in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in w]), lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def signature_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """The same signature as ANSI SQL (DuckDB list_dot_product)."""
    terms = [
        f"(CASE WHEN LIST_DOT_PRODUCT({vec_expr}, {list(w)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, w in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def exact_cosine_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All-pairs cosine >= threshold, id_a < id_b. Exact baseline."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    cos = F.round(cosine(F.col("v_a"), F.col("v_b")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    chunks: int = CHUNKS,
) -> DataFrame:
    """Near-dup pairs via hyperplane-LSH banding, exact-cosine verified.

    Candidate rows carry only (id, chunk, val) — the vectors rejoin just
    for the candidate set, so the banding shuffle is ~20 bytes/row
    regardless of embedding width (same shape as dedup.minhash_lsh_pairs).
    """
    planes = planes or hyperplanes()
    bits_per_chunk = len(planes) // chunks
    mask = (1 << bits_per_chunk) - 1
    sig = emb.select(F.col(id_col), signature(F.col(vec_col), planes).alias("sig"))
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("chunk"),
                F.shiftrightunsigned(F.col("sig"), j * bits_per_chunk)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for j in range(chunks)
        ]
    )
    buckets = sig.select(id_col, F.explode(chunk_structs).alias("ck")).select(
        id_col, F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = emb.select(F.col(id_col), F.col(vec_col))
    cand = cand.join(
        vecs.withColumnRenamed(id_col, "id_a").withColumnRenamed(vec_col, "v_a"), "id_a"
    ).join(vecs.withColumnRenamed(id_col, "id_b").withColumnRenamed(vec_col, "v_b"), "id_b")
    cos = F.round(cosine(F.col("v_a"), F.col("v_b")), 6)
    return cand.select("id_a", "id_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def ann_topk_lsh(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    max_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k by cosine: prune to signatures within
    `max_hamming` of the probe's, exact-score the survivors.

    The probe row (1 row) broadcasts; the corpus side is a scan + cheap
    bit-count filter, so the scored set shrinks by the bucket selectivity
    (~sum_{i<=h} C(B,i)/2^B of the corpus for random data, much sharper
    for clustered data). No shuffle on the corpus side; final top-k is
    TakeOrderedAndProject.
    """
    planes = planes or hyperplanes()
    sig = emb.select(
        F.col(id_col), F.col(vec_col), signature(F.col(vec_col), planes).alias("sig")
    )
    probe = sig.filter(F.col(id_col) == probe_id).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), F.col("sig").alias("q_sig")
    )
    hamming = F.bit_count(F.col("sig").bitwiseXOR(F.col("q_sig")))
    return (
        sig.filter(F.col(id_col) != probe_id)
        .join(F.broadcast(probe))
        .filter(hamming <= max_hamming)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
