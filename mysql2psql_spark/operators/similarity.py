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


def cosine_pairs_df(pairs: DataFrame, round_to: int = 6) -> Column | DataFrame:
    """(id_a, id_b, v_a, v_b) -> (id_a, id_b, cos_sim), codegen'd.

    The row-level HOF form (aggregate over zip_with) evaluates interpreted
    — fine for a handful of rows, ~10x slower over a large candidate set.
    This shape explodes the zipped pair once and hash-aggregates plain
    products; a pair's exploded rows never leave their input partition, so
    map-side partial aggregation accumulates each sum sequentially in
    position order (bit-compatible with DuckDB's LIST_COSINE_SIMILARITY).
    """
    ex = pairs.select(
        "id_a", "id_b", F.posexplode(F.arrays_zip("v_a", "v_b")).alias("pos", "p")
    ).select(
        "id_a",
        "id_b",
        F.col("p.v_a").cast("double").alias("xa"),
        F.col("p.v_b").cast("double").alias("xb"),
    )
    agg = ex.groupBy("id_a", "id_b").agg(
        F.sum(F.col("xa") * F.col("xb")).alias("dot"),
        F.sum(F.col("xa") * F.col("xa")).alias("na"),
        F.sum(F.col("xb") * F.col("xb")).alias("nb"),
    )
    return agg.select(
        "id_a",
        "id_b",
        F.round(F.col("dot") / (F.sqrt("na") * F.sqrt("nb")), round_to).alias("cos_sim"),
    )


def batch_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "embedding",
    exclude_self: bool = True,
    fanout: int = 64,
) -> DataFrame:
    """Exact top-k neighbors for EVERY probe in ONE corpus pass — the
    batch serving stage (queries arrive in batches; the corpus scan is
    the dominant cost at scale, so batching divides it by the batch
    size). Returns (probe_id, vec_id, cos_sim, rnk) with rnk 1..k,
    ordered by cos_sim desc with id tiebreak.

    The probe frame is small by construction and broadcast: the corpus
    never shuffles for the scoring. The rank is TWO-PHASE: a local
    row_number inside (probe, hash-bucket-of-candidate) partitions —
    ``fanout`` buckets per probe, so the full |corpus| x |probes| score
    exchange spreads over |probes| * fanout partitions — then a global
    rank per probe over the <= fanout * k surviving rows. A single
    per-probe window would funnel the ENTIRE corpus's scores for one
    probe into one task (a guaranteed sort-spill straggler at corpus
    scale); two-phase is exact for row_number because any global top-k
    row is necessarily in its bucket's top-k under the same total order
    (cos_sim desc, id asc — deterministic tiebreak). ``exclude_self=
    True`` drops the probe's own corpus row (probe ids drawn from the
    corpus id space); pass False when probes live in a separate id
    namespace.
    """
    from pyspark.sql.window import Window as W

    pairs = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    ).crossJoin(
        F.broadcast(
            probes.select(
                F.col(probe_id_col).alias("id_b"), F.col(probe_vec_col).alias("v_b")
            )
        )
    )
    if exclude_self:
        pairs = pairs.filter(F.col("id_a") != F.col("id_b"))
    scored = cosine_pairs_df(pairs)
    order = [F.col("cos_sim").desc(), F.col("id_a")]
    if fanout > 1:
        bucket = F.pmod(F.xxhash64("id_a"), F.lit(fanout))
        wl = W.partitionBy(F.col("id_b"), bucket).orderBy(*order)
        scored = scored.withColumn("lrnk", F.row_number().over(wl)).filter(
            F.col("lrnk") <= k
        )
    w = W.partitionBy("id_b").orderBy(*order)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id_b").alias("probe_id"),
            F.col("id_a").alias("vec_id"),
            "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


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


def mmr_select(
    vecs: dict[int, list[int]],
    rel_d2: dict[int, int],
    k: int,
) -> list[tuple[int, int, int | None]]:
    """Greedy Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998) with lambda = 1/2 over integer-grid vectors: pick the most
    relevant candidate first, then repeatedly the candidate maximizing
    ``min_j d2(i, selected_j) - rel_d2[i]`` (novelty minus relevance
    distance — both int64, so the trajectory is exactly reproducible),
    ties toward the smallest id. Returns ``(id, rank, novelty_d2)``
    triples in selection order; the first pick's novelty is ``None``.

    Pure driver-side function by design: callers (sim_mmr_rerank) hand it
    a COUNTED-SMALL collected candidate set (<= 20 rows), keeping the
    O(k^2 * dim) integer work bounded at any corpus size."""

    def d2(a: int, b: int) -> int:
        return sum((x - y) * (x - y) for x, y in zip(vecs[a], vecs[b]))

    first = min(vecs, key=lambda v: (rel_d2[v], v))
    sel: list[int] = [first]
    nov: dict[int, int | None] = {first: None}
    while len(sel) < min(k, len(vecs)):
        best = max(
            (v for v in vecs if v not in nov),
            key=lambda v: (min(d2(v, s) for s in sel) - rel_d2[v], -v),
        )
        nov[best] = min(d2(best, s) for s in sel)
        sel.append(best)
    return [(v, i + 1, nov[v]) for i, v in enumerate(sel)]
