"""Embedding-space operators: cosine near-dup pairs and ANN top-k.

Extension surface beyond the reference (which has no vector data; SURVEY.md
§7 step 8): the operators a training-data pipeline runs over an
`array<float>` embedding column.

Three tiers, all DataFrame-native:

- exact all-pairs cosine (`exact_cosine_pairs`): the correctness baseline.
  O(n^2) — fine for verification scales, NOT the 100 TB path.
- hyperplane-LSH near-dup (`lsh_cosine_pairs`): the E2LSH OR-construction
  — L independent tables, each keyed by r sign-bits from fixed random
  hyperplanes; a pair is a candidate iff it collides in >= 1 table, then
  exact cosine verifies. P[bit agrees] = 1 - theta/pi, so a cosine-0.95
  pair hits a 10-bit table with p ~ 0.9^10 = 0.35 and L=12 tables give
  recall 1-(1-0.35)^12 ~ 0.994 (higher still at 0.97+). The r-bit key
  space (2^r values) is what keeps buckets O(N/2^r) — banding by tiny
  chunks of one signature floods buckets on isotropic corpora (measured:
  2-bit chunks made ~1M candidate pairs from 2000 vectors).
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
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql2psql_spark.operators.similarity import cosine, cosine_pairs_df

DIM = 64
BITS = 16  # packed single-signature width (ANN pruning)
TABLES_L = 12  # near-dup: L independent hash tables ...
TABLE_R = 10  # ... of r sign-bits each


def hyperplanes(bits: int = BITS, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    """The fixed hyperplane matrix, rounded so Spark and the SQL oracle
    compute from identical literals."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((bits, dim))]


def _packed_keys_df(
    emb: DataFrame,
    planes: list[list[float]],
    tables: int,
    r: int,
    id_col: str,
    vec_col: str,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, keys: array<bigint>[tables]) — key of table t = the r
    sign-bits of planes [t*r, (t+1)*r) packed into an integer.

    Dense matmul is exactly what Arrow-batched pandas execution is for:
    one numpy (batch x dim) @ (dim x B) product per batch, no explode, no
    B-wide codegen'd aggregate (measured: the JVM conditional-sum shape
    spends ~6 s per query just compiling the 120-aggregate plan, and HOF
    lambdas evaluate interpreted). Partition-local, no shuffle. Vectors
    are cast to float64 BEFORE the product, matching the SQL oracle's
    CAST(embedding AS DOUBLE[]); a sign flip vs the oracle's sequential
    LIST_DOT_PRODUCT would need |dot| within summation-order error
    (~1e-14 relative) of zero — negligible for non-degenerate inputs.
    """
    import pandas as pd  # worker-side

    w = np.array(planes, dtype=np.float64).T  # (dim, tables*r)
    shifts = np.array([1 << j for j in range(r)], dtype=np.int64)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = (v @ w) > 0  # (rows, tables*r)
            keys = [
                (bits[:, t * r : (t + 1) * r] * shifts).sum(axis=1) for t in range(tables)
            ]
            out = {id_col: pdf[id_col], "keys": list(np.stack(keys, axis=1))}
            if carry_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    schema = f"{id_col} bigint, keys array<bigint>"
    if carry_vec:
        schema += f", {vec_col} array<float>"
    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def signature_df(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig): bit i of sig set iff vec . plane_i > 0 (one packed
    B-bit signature; see _packed_keys_df for the execution shape)."""
    packed = _packed_keys_df(emb, planes, tables=1, r=len(planes), id_col=id_col, vec_col=vec_col)
    return packed.select(F.col(id_col), F.get("keys", 0).alias("sig"))


def signature_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """The same signature as ANSI SQL (DuckDB list_dot_product)."""
    terms = [
        f"(CASE WHEN LIST_DOT_PRODUCT({vec_expr}, {list(w)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, w in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def table_keys_df(
    emb: DataFrame,
    planes: list[list[float]],
    tables: int = TABLES_L,
    r: int = TABLE_R,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, key): one row per (vector, hash table); see
    _packed_keys_df for the execution shape."""
    packed = _packed_keys_df(emb, planes, tables, r, id_col, vec_col)
    return packed.select(F.col(id_col), F.posexplode("keys").alias("table", "key"))


def table_keys_sql(
    vec_expr: str, planes: list[list[float]], tables: int = TABLES_L, r: int = TABLE_R
) -> list[str]:
    """The L table-key expressions as ANSI SQL (one per table)."""
    keys = []
    for t in range(tables):
        terms = [
            f"(CASE WHEN LIST_DOT_PRODUCT({vec_expr}, {list(planes[t * r + j])}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(r)
        ]
        keys.append("(" + " + ".join(terms) + ")")
    return keys


def exact_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All-pairs cosine >= threshold, id_a < id_b. Exact baseline —
    quadratic BY DESIGN (the recall anchor the LSH/IVF tiers are graded
    against), and therefore gated on the COUNTED corpus size so no
    caller can accidentally run the anchor at production scale (the same
    measure-then-choose discipline as connected_components' driver gate,
    operators/dedup.py). The default 100k rows bounds the self-join at
    ~5e9 candidate pairs — hours of cluster work, the outer limit of
    "deliberate benchmark run"; beyond it this raises and points at the
    corpus-linear alternatives (lsh_cosine_pairs, semantic_dedup,
    ivf_topk). ``max_rows=None`` disables the gate for callers who have
    genuinely decided to pay the quadratic cost. The guard scan is
    BOUNDED: counting ``limit(max_rows + 1)`` stops the scan as soon as
    max_rows + 1 rows exist (CollectLimit short-circuits), so an
    over-limit production corpus pays ~max_rows rows of scan to be
    refused instead of a full corpus pass; under the limit it costs the
    same small count as before (ADVICE r7 flagged the unconditional
    full count inside the timed region)."""
    if max_rows is not None:
        n = emb.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"exact_cosine_pairs is an all-pairs O(n^2) baseline; corpus has "
                f"more than max_rows={max_rows} rows. Use lsh_cosine_pairs or "
                f"semantic_dedup for near-dup pairs at scale, or pass "
                f"max_rows=None to force the exact run."
            )
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    # engine="arrow": at this operator's pair volumes (the O(n^2) exact
    # baseline — ~500k pairs at sf0.1) the mapInArrow sum engine beats
    # the 64x-row explode+hash-agg by ~26% (same-session 5-rep A/B:
    # 3.60 -> 2.66 s median, outputs asserted bit-identical); the
    # SMALL-candidate consumers (ann/semantic, ~10-15k pairs) keep the
    # explode default, which A/B'd faster there (2.85 vs 3.90) — engine
    # choice is a property of the CALLER's pair volume, like fanout.
    return cosine_pairs_df(pairs, engine="arrow").filter(
        F.col("cos_sim") >= threshold
    )


def lsh_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    tables: int = TABLES_L,
    r: int = TABLE_R,
) -> DataFrame:
    """Near-dup pairs via multi-table hyperplane LSH, exact-cosine
    verified.

    Candidate rows carry only (id, table, key) — the vectors rejoin just
    for the candidate set, so the bucket-join shuffle is ~24 bytes/row
    regardless of embedding width (same shape as dedup.minhash_lsh_pairs).

    The bucket table is materialized once (lazy localCheckpoint): both
    self-join sides consume it, and a bare keyed repartition is neither
    reliably deduped by ReusedExchange nor safe from AQE coalescing
    (measured: the mapInPandas signature matmul ran once per join side,
    4 FileScans in the sf0.1 plan).
    """
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    planes = planes or hyperplanes(tables * r)
    buckets = _materialize(table_keys_df(emb, planes, tables, r, id_col, vec_col))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = emb.select(F.col(id_col), F.col(vec_col))
    cand = cand.join(
        vecs.withColumnRenamed(id_col, "id_a").withColumnRenamed(vec_col, "v_a"), "id_a"
    ).join(vecs.withColumnRenamed(id_col, "id_b").withColumnRenamed(vec_col, "v_b"), "id_b")
    return cosine_pairs_df(cand).filter(F.col("cos_sim") >= threshold)


def ivf_assign(
    emb: DataFrame,
    seeds: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_cos: bool = False,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, cluster[, cos]): IVF coarse quantization — each vector assigned
    to the seed centroid with the highest (rounded) cosine; ties break to
    the lowest seed id. One Arrow-batched matmul per batch, no shuffle.
    ``with_cos=True`` additionally emits the winning rounded cosine (the
    assignment quality signal k-means refinement aggregates).

    Seeds are a small driver-side list by definition (the centroid table);
    at scale they come from a sampled k-means — here they are the first C
    vectors, which keeps the operator fully deterministic and lets the SQL
    oracle restate the same assignment.

    ``carry_vec=True`` additionally passes the input vector column
    through (r18, guide §2.4): the Lloyd refinement loop consumed
    (id, cluster) and immediately JOINED the corpus frame back to get
    the vectors for the mean aggregation — one corpus-scale join per
    iteration whose only purpose was re-attaching a column the
    assignment pass already held. float64 values round-trip Arrow
    bit-exactly, so the carried column is identical to the joined one."""
    import pandas as pd  # worker-side

    s = np.array([v for _, v in seeds], dtype=np.float64)  # (C, dim)
    s_norm = np.sqrt((s * s).sum(axis=1))

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            v_norm = np.sqrt((v * v).sum(axis=1))
            cos = np.round((v @ s.T) / np.outer(v_norm, s_norm), 6)
            out = {id_col: pdf[id_col], "cluster": cos.argmax(axis=1)}
            if with_cos:
                out["cos"] = cos.max(axis=1)
            if carry_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    schema = f"{id_col} bigint, cluster int"
    if with_cos:
        schema += ", cos double"
    if carry_vec:
        schema += f", {vec_col} array<double>"
    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def collect_seeds(
    emb: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """The deterministic centroid table: the first `n_centroids` vectors
    by id — a bounded driver-side read (n_centroids rows by construction)."""
    rows = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return [(r[0], [float(x) for x in r[1]]) for r in rows]


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse-cluster the
    corpus, then mark within-cluster pairs with cosine >= threshold as
    semantic duplicates; each duplicate keeps its lowest-id cluster-mate.
    Returns (drop_id, keep_id, n_dup_neighbors, max_cos).

    The scale shape is the paper's: the quadratic compare runs per
    CLUSTER, never across the corpus — candidate pairs are bounded by
    cluster sizes, and with ~sqrt(N) clusters each compare is executor-
    local after one cluster-keyed shuffle. The explicit repartition on
    the cluster key is the shared exchange BOTH self-join sides reuse, so
    the Arrow assignment matmul executes once (same pattern as
    lsh_cosine_pairs)."""
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    seeds = collect_seeds(emb, n_centroids, id_col, vec_col)
    # materialized once: both self-join sides consume it, and the bare
    # cluster-keyed repartition was neither ReusedExchange-deduped (the
    # Arrow assignment pass executed per side) nor safe from AQE
    # coalescing on small shuffles
    clustered = _materialize(
        ivf_assign(emb, seeds, id_col, vec_col).join(
            emb.select(id_col, vec_col), id_col
        )
    )
    a, b = clustered.alias("a"), clustered.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{vec_col}").alias("v_a"),
        F.col(f"b.{vec_col}").alias("v_b"),
    )
    dup = cosine_pairs_df(pairs).filter(F.col("cos_sim") >= threshold)
    return dup.groupBy(F.col("id_a").alias("drop_id")).agg(
        F.min("id_b").alias("keep_id"),
        F.count("*").alias("n_dup_neighbors"),
        F.round(F.max("cos_sim"), 6).alias("max_cos"),
    )


def kmeans_refine_step(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration from the deterministic seed centroids:
    assign every vector to its nearest seed by cosine, then report the
    per-cluster refinement statistics (cluster, n_members, centroid_norm,
    mean_cos) where centroid_norm is the L2 norm of the recomputed mean
    vector. This is the convergence signal of the distributed k-means a
    pipeline runs to build IVF lists / SemDeDup clusters.

    Execution: one Arrow matmul assignment pass (no shuffle), a
    dimension-exploded partial aggregation — (cluster, dim) keys make the
    centroid recompute a uniform hash agg with map-side combine, 64*C
    result rows regardless of corpus size — and a C-row broadcast-joined
    stats table. No window, no collect beyond the seed table."""
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    seeds = collect_seeds(emb, n_centroids, id_col, vec_col)
    # materialized once so BOTH aggregation consumers (centroid
    # recompute + member stats) read the assignment output instead of
    # re-running the Arrow matmul pass
    assigned = _materialize(
        ivf_assign(emb, seeds, id_col, vec_col, with_cos=True).join(
            emb.select(id_col, vec_col), id_col
        )
    )
    dims = assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
    cent = dims.groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
    norm = cent.groupBy("cluster").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    # the per-member cosines are exact multiples of 1e-6 (rounded in the
    # assignment), so their MEAN lands exactly on .5e-6 boundaries where a
    # 1-ulp cross-engine difference in the double SUM flips the final
    # rounding — aggregate them as exact micro-integers instead, so both
    # engines round the identical quotient of identical integers
    stats = assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(
            (
                F.sum(F.round(F.col("cos") * 1e6).cast("long")).cast("double")
                / F.count("*")
            )
            / F.lit(1e6),
            6,
        ).alias("mean_cos"),
    )
    return stats.join(norm, "cluster").select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_members",
        "centroid_norm",
        "mean_cos",
    )


def ann_topk_ivf(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into `n_centroids` inverted
    lists, search only the `n_probe` lists nearest the query, exact-score
    the survivors. The scan side carries a cheap int filter (with data
    written partitioned by cluster this becomes partition pruning); only
    ~n_probe/n_centroids of the corpus is ever scored."""
    seed_rows = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()  # centroid table: n_centroids rows by construction
    )
    seeds = [(r[0], [float(x) for x in r[1]]) for r in seed_rows]
    probe_row = emb.filter(F.col(id_col) == probe_id).select(vec_col).head()
    q = np.asarray(probe_row[0], dtype=np.float64)
    s = np.array([v for _, v in seeds], dtype=np.float64)
    cos_q = np.round(
        (s @ q) / (np.sqrt((s * s).sum(axis=1)) * np.sqrt((q * q).sum())), 6
    )
    # top-n_probe clusters, ties to lower seed id (stable argsort on -cos)
    probe_clusters = [int(c) for c in np.argsort(-cos_q, kind="stable")[:n_probe]]

    assigned = ivf_assign(emb, seeds, id_col, vec_col).filter(
        F.col("cluster").isin(probe_clusters)
    )
    cand = assigned.filter(F.col(id_col) != probe_id).join(
        emb.select(id_col, vec_col), id_col
    )
    pairs = cand.select(
        F.col(id_col).alias("id_a"),
        F.lit(probe_id).alias("id_b"),
        F.col(vec_col).alias("v_a"),
    ).withColumn("v_b", F.array(*[F.lit(float(x)) for x in q]))
    return (
        cosine_pairs_df(pairs)
        .select(F.col("id_a").alias(id_col), "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_scored_candidates(
    emb: DataFrame,
    probe_id: int,
    max_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """The shared candidate stage of hyperplane-LSH ANN: (id, hamming,
    cos_sim) for every corpus row whose signature is within
    ``max_hamming`` of the probe's — ONE Arrow matmul pass, cosine only
    for survivors, hamming RETAINED so callers evaluating several
    budgets at once (the ``sim_lsh_budget_sweep`` tuning curve) score
    the corpus once at the widest budget and derive every tighter
    budget by a row-local filter (budget-b candidates are exactly the
    h <= b subset under the same signature).

    The probe's vector and signature are resolved DRIVER-SIDE (a bounded
    1-row collect, like ann_topk_ivf's centroid read) and enter the plan
    as literals; no corpus self-join, no shuffle.
    """
    planes = planes or hyperplanes()
    probe_row = emb.filter(F.col(id_col) == probe_id).select(vec_col).head()
    # identical arithmetic to _packed_keys_df: (rows x dim) @ (dim x B)
    q = np.asarray([np.asarray(probe_row[0], dtype=np.float64)])
    w = np.array(planes, dtype=np.float64).T
    q_bits = (q @ w) > 0
    shifts = np.array([1 << j for j in range(len(planes))], dtype=np.int64)
    q_sig = int((q_bits[0] * shifts).sum())

    sig = _packed_keys_df(
        emb, planes, tables=1, r=len(planes), id_col=id_col, vec_col=vec_col, carry_vec=True
    ).select(F.col(id_col), F.get("keys", 0).alias("sig"), F.col(vec_col))
    hamming = F.bit_count(F.col("sig").bitwiseXOR(F.lit(q_sig)))
    q_vec = F.array(*[F.lit(float(x)) for x in probe_row[0]])
    return sig.filter(
        (F.col(id_col) != probe_id) & (hamming <= max_hamming)
    ).select(
        F.col(id_col),
        hamming.cast("int").alias("hamming"),
        F.round(cosine(F.col(vec_col), q_vec), 6).alias("cos_sim"),
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
    `max_hamming` of the probe's, exact-score the survivors
    (:func:`lsh_scored_candidates`), TakeOrderedAndProject the top k.
    The signature pass executes exactly once (the pre-r5 shape consumed
    the mapInPandas output from two filter subtrees, which re-executes
    the matmul per consumer — there is no exchange for the runtime stage
    cache to dedupe on). The scored set shrinks by the bucket
    selectivity (~sum_{i<=h} C(B,i)/2^B of the corpus for random data,
    much sharper for clustered data)."""
    return (
        lsh_scored_candidates(
            emb, probe_id, max_hamming, id_col=id_col, vec_col=vec_col, planes=planes
        )
        .select(F.col(id_col), "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ann_topk_ivf_rerank(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized-search + exact-rerank ANN (the production two-stage
    shape: FAISS IVF-flat with scalar-quantized first pass): probe the
    `n_probe` IVF lists nearest the query, score the survivors with the
    int8-quantized integer dot product (per-dim min/max codes — 1 byte/
    dim instead of 8, the first pass a memory-bound index serves), keep
    the top `shortlist` by approximate score, then exact-rerank only
    those with full-precision cosine. At scale the full-precision
    vectors are fetched for `shortlist` rows, not for every candidate in
    the probed lists. Returns (id, approx_score, cos_sim) for the top k.

    Every stage is integer- or rounding-exact, so a SQL oracle can
    restate the whole pipeline: codes are deterministic integers
    (sim_quantize_int8's arithmetic), the approximate ranking orders by
    an exact BIGINT, and the rerank uses the engine-standard rounded
    cosine with id tiebreaks."""
    from mysql2psql_spark.operators.materialize import materialize

    seeds = collect_seeds(emb, n_centroids, id_col, vec_col)
    probe_row = emb.filter(F.col(id_col) == probe_id).select(vec_col).head()
    q = np.asarray(probe_row[0], dtype=np.float64)
    s = np.array([v for _, v in seeds], dtype=np.float64)
    cos_q = np.round(
        (s @ q) / (np.sqrt((s * s).sum(axis=1)) * np.sqrt((q * q).sum())), 6
    )
    probe_clusters = [int(c) for c in np.argsort(-cos_q, kind="stable")[:n_probe]]

    assigned = (
        ivf_assign(emb, seeds, id_col, vec_col)
        .filter(F.col("cluster").isin(probe_clusters))
        .filter(F.col(id_col) != probe_id)
        .select(id_col)
    )

    # per-dim min/max int8 codes over the corpus (sim_quantize_int8 math)
    ex = emb.select(
        id_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    st = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    code = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor((F.col("v") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn")) + 0.5),
        )
        .otherwise(0)
        .cast("long")
    )
    codes = ex.join(F.broadcast(st), "dim").select(id_col, "dim", code.alias("code"))
    qcodes = codes.filter(F.col(id_col) == probe_id).select(
        "dim", F.col("code").alias("qcode")
    )
    # materialized once: both the rerank's candidate filter and the
    # score rejoin consume the shortlist, and without it the corpus-wide
    # quantization explode + sort-limit executes once per consumer
    approx = materialize(
        codes.join(assigned, id_col)
        .join(F.broadcast(qcodes), "dim")
        .groupBy(id_col)
        .agg(
            F.sum((F.col("code") - 128) * (F.col("qcode") - 128)).alias("approx_score")
        )
        .orderBy(F.col("approx_score").desc(), id_col)
        .limit(shortlist)
    )

    pairs = (
        emb.join(F.broadcast(approx.select(id_col)), id_col)
        .select(
            F.col(id_col).alias("id_a"),
            F.lit(probe_id).alias("id_b"),
            F.col(vec_col).cast("array<double>").alias("v_a"),
        )
        .withColumn("v_b", F.array(*[F.lit(float(x)) for x in q]))
    )
    return (
        cosine_pairs_df(pairs)
        .join(
            F.broadcast(approx.withColumnRenamed(id_col, "id_a")), "id_a"
        )
        .select(F.col("id_a").alias(id_col), "approx_score", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011): split each vector into m
# subvectors, encode each against a small per-subspace codebook, search
# with asymmetric-distance computation (ADC) — the memory-bound regime of
# billion-scale ANN, complementing the IVF and LSH paths above.
#
# Exactness discipline: every element is first quantized to an integer
# micro-grid — q(x) = round(x * 1e6) as BIGINT, computed identically by
# Spark and the SQL oracle — after which ALL distances are pure int64
# sums of squared differences: exact under any summation order, any
# engine, and inside the Arrow kernel. (Same cross-engine integer-grid
# discipline as pagerank's contributions; here it also makes the numpy
# kernel bit-identical to the relational oracle by construction.)
#
# Why a pandas UDF for the encode (the one dense-numeric kernel in the
# engine): the m*n_centroids distance argmin is 1,024 multiply-adds per
# row at m=4, n=16, dim=64, and both built-in formulations measured
# pathological on a 2,000-row corpus — higher-order-function folds
# (aggregate(zip_with(...))) evaluate interpreted per element (~4 us/
# element, 7.7 s/query), and flattening into per-element expressions
# generates a 1,024-subexpression projection that Janino fails to
# compile (InternalCompilerException at ~15k generated lines, falling
# back to interpreted: 30 s/query). The Arrow-vectorized kernel does the
# same int64 arithmetic in numpy at memory bandwidth. This is the
# documented "built-ins genuinely can't express it efficiently" case
# (SURVEY §2.12); the quantize step, ranking, and rerank stay JVM-side.
# ---------------------------------------------------------------------------


def quantize_elements(vec: Column, dim: int, scale: float = 1e6) -> Column:
    """``round(x * scale)`` per element as ``array<bigint>`` — the
    micro-grid quantization shared by the PQ operator and its oracle.

    Emitted as a FLAT projection of ``dim`` small terms over the (once-
    cast) array attribute: whole-stage codegen binds the cast array to a
    local and evaluates 64 cheap scalar expressions; a ``transform()``
    HOF would be interpreted per element per row."""
    return F.array(
        *[F.round(F.element_at(vec, d + 1) * scale).cast("bigint") for d in range(dim)]
    )


def pq_adc_topk(
    corpus: DataFrame,
    codebook: list[list[list[int]]],
    probe: list[int],
    probe_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """ADC top-k: PQ-encode every corpus vector row-locally against the
    broadcast ``codebook`` (m subspaces x n_centroids x sub_dim, already
    on the integer micro-grid — quantize with :func:`quantize_elements`),
    rank by the summed per-subspace LUT distances, exact-rerank the k
    survivors. ``probe`` is the quantized probe vector.

    Scale shape — the production PQ layout: NO shuffle touches the
    corpus. Quantize is a flat JVM projection; encode+ADC is one Arrow
    batch kernel per partition against the closure-broadcast codebook
    (argmin ties break to the SMALLEST centroid id — np.argmin's first
    minimum — which the oracle mirrors with ORDER BY d2n, c); the global
    top-k is TakeOrderedAndProject (per-partition heads, never a full
    sort); the exact rerank touches k rows. At 100 TB the cost is one
    scan + k-row tail work, and the per-subspace codes are what a
    serving layer would persist."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window as W

    m = len(codebook)
    n_centroids = len(codebook[0])
    sub_dim = len(codebook[0][0])
    dim = m * sub_dim
    cb = np.asarray(codebook, dtype=np.int64)  # (m, nc, sub)
    pv = np.asarray(probe, dtype=np.int64).reshape(m, sub_dim)
    lut = ((cb - pv[:, None, :]) ** 2).sum(axis=-1)  # (m, nc) int64
    j_idx = np.arange(m)

    @pandas_udf("bigint")
    def adc_udf(qemb: pd.Series) -> pd.Series:
        if len(qemb) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(qemb.to_numpy()).astype(np.int64).reshape(-1, m, sub_dim)
        d = ((x[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=-1)  # (N, m, nc)
        codes = d.argmin(axis=-1)  # first min = smallest centroid id
        return pd.Series(lut[j_idx[None, :], codes].sum(axis=1))

    base = (
        corpus.filter(F.col(id_col) != probe_id)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_emb"))
        .select(F.col(id_col), quantize_elements(F.col("_emb"), dim).alias("_qemb"))
    )
    scored = (
        base.select(F.col(id_col), "_qemb", adc_udf(F.col("_qemb")).alias("adc_d2n"))
        .orderBy("adc_d2n", id_col)
        .limit(k)
    )
    probe_lit = F.lit(probe).cast("array<bigint>")
    ex = F.aggregate(
        F.zip_with(F.col("_qemb"), probe_lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    win = W.orderBy("adc_d2n", id_col)
    return (
        scored.withColumn("ex_d2n", ex)
        .withColumn("rnk", F.row_number().over(win).cast("int"))
        .select(
            id_col,
            F.round(F.col("adc_d2n") / 1e12, 6).alias("adc_dist2"),
            F.round(F.col("ex_d2n") / 1e12, 6).alias("exact_dist2"),
            "rnk",
        )
    )


def knn_label_audit(
    emb: DataFrame,
    seeds: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = 1e6,
    max_cluster_rows: int | None = 100_000,
) -> DataFrame:
    """Per-vector label-noise audit (the kNN-consistency core of Confident
    Learning, Northcutt et al. 2021): inside each IVF cluster, find every
    vector's k nearest neighbors on the integer micro-grid L2 metric
    (:func:`quantize_elements` — exact int64, any engine) and compare the
    neighborhood's majority label (ties -> smallest label; neighbor ties
    -> smallest id) with the vector's own. Returns one row per vector:
    ``(id, own_label, knn_label, is_flagged)``; vectors alone in their
    cluster keep their own label and are never flagged.

    Scale shape — the SemDeDup posture: one Arrow assignment pass
    (:func:`ivf_assign`, no shuffle), ONE shuffle by cluster id, then a
    partition-local numpy kernel per cluster — quadratic only within a
    cluster, linear in the corpus for bounded cluster sizes. The kernel
    is int64 end-to-end, so the audit is bit-identical to the relational
    oracle under any partitioning.

    The linearity claim rests ENTIRELY on cluster balance: a degenerate
    clustering (one mega-cluster swallowing the corpus) re-creates the
    all-pairs blowup the exact_cosine_pairs 100k gate exists to prevent
    — so the max cluster size is COUNTED first (one small aggregate over
    the assignment frame) and an over-limit clustering is REFUSED with
    the linear alternatives named: re-seed with more / better-spread
    centroids (collect_seeds with a larger C), split the hot cluster and
    re-audit it alone, or cap the neighborhood by sampling within the
    cluster.
    ``max_cluster_rows=None`` disables the gate for callers who have
    decided to pay the quadratic cost (r10 verdict #7)."""
    import pyspark.sql.types as T

    dim = len(seeds[0][1])
    assign = ivf_assign(emb, seeds, id_col=id_col, vec_col=vec_col)
    if max_cluster_rows is not None:
        hot = (
            assign.groupBy("cluster")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if hot is not None and hot > max_cluster_rows:
            raise ValueError(
                f"knn_label_audit is quadratic within a cluster; the largest "
                f"IVF cluster holds {hot} rows > max_cluster_rows="
                f"{max_cluster_rows}. Re-seed with more / better-spread "
                f"centroids (collect_seeds, larger C), split the hot cluster and "
                f"audit it separately, or pass max_cluster_rows=None to "
                f"force the quadratic run."
            )
    q = emb.select(
        id_col,
        F.col(label_col).cast("int").alias("_lbl"),
        quantize_elements(F.col(vec_col).cast("array<double>"), dim, scale).alias("_q"),
    ).join(assign, id_col)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("own_label", T.IntegerType()),
            T.StructField("knn_label", T.IntegerType()),
            T.StructField("is_flagged", T.BooleanType()),
        ]
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)  # stable-argsort ties then break by id
        n = len(pdf)
        ids = pdf[id_col].to_numpy()
        labs = pdf["_lbl"].to_numpy()
        if n == 1:
            return pd.DataFrame(
                {id_col: ids, "own_label": labs, "knn_label": labs,
                 "is_flagged": [False]}
            )
        x = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
        # (n, n) int64 pairwise grid distances via the exact expansion
        # s_a + s_b - 2*a.b — n is a cluster, not the corpus, and the
        # identity avoids materializing the (n, n, dim) difference cube
        # (12.5 GB at a 1250-member cluster; int64 bounds: elements
        # <= 2e6 in |.|, so dot terms <= 64*(2e6)^2 ~ 2.6e14 << 2^63).
        # The kernel is fully vectorized (no per-row python loop):
        # diagonal sentinel removes self, stable argsort over id-sorted
        # rows breaks distance ties toward the smaller id, and the vote is
        # a one-hot bincount whose argmax takes the FIRST maximum =
        # smallest label (labels indexed via sorted unique).
        s = (x * x).sum(axis=1)
        d = s[:, None] + s[None, :] - 2 * (x @ x.T)
        np.fill_diagonal(d, np.iinfo(np.int64).max)
        nn = np.argsort(d, axis=1, kind="stable")[:, : min(k, n - 1)]  # (n, <=k)
        uniq = np.unique(labs)  # sorted
        lab_idx = np.searchsorted(uniq, labs)
        votes = (lab_idx[nn][:, :, None] == np.arange(len(uniq))).sum(axis=1)
        maj = uniq[votes.argmax(axis=1)]
        return pd.DataFrame(
            {id_col: ids, "own_label": labs, "knn_label": maj,
             "is_flagged": maj != labs}
        )

    return q.groupBy("cluster").applyInPandas(per_cluster, schema=out_schema)


def hard_negatives(
    emb: DataFrame,
    seeds: list[tuple[int, list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = 1e6,
    max_cluster_rows: int | None = 100_000,
) -> DataFrame:
    """Per-anchor hard-negative mining for contrastive training (the
    ANN-shortlist negative selection of DPR, Karpukhin et al. 2020, and
    the in-batch-negatives successors): inside each IVF cluster, every
    vector's k nearest DIFFERENT-label neighbors on the integer
    micro-grid L2 metric are its hard negatives — near the anchor, yet
    labeled otherwise, exactly the examples a contrastive loss learns
    most from. Also emits the anchor's nearest SAME-label distance and
    the per-negative margin ``d2 - d2_pos`` (an int, exact): a negative
    with margin < 0 sits closer than the best positive — the
    curriculum-ordering signal mining pipelines sort by.

    Returns one row per (anchor, negative): ``(id, own_label, neg_id,
    neg_label, rank, d2, margin)``; margin is NULL when the anchor has
    no same-label neighbor in its cluster. Anchors with no
    different-label neighbor in their cluster emit nothing.

    Scale shape — identical to :func:`knn_label_audit` (the SemDeDup
    posture): one Arrow assignment pass (:func:`ivf_assign`, no
    shuffle), ONE shuffle by cluster id, then a partition-local numpy
    kernel — quadratic only within a cluster, linear in the corpus for
    bounded cluster sizes, with the same counted max-cluster-size gate
    refusing degenerate clusterings (``max_cluster_rows=None``
    disables). Distances are int64 grid sums (dot terms bounded well
    under 2^63 — the audit kernel's bound), so the kernel is
    bit-identical to the relational oracle under any partitioning."""
    import pyspark.sql.types as T

    dim = len(seeds[0][1])
    assign = ivf_assign(emb, seeds, id_col=id_col, vec_col=vec_col)
    if max_cluster_rows is not None:
        hot = (
            assign.groupBy("cluster")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if hot is not None and hot > max_cluster_rows:
            raise ValueError(
                f"hard_negatives is quadratic within a cluster; the largest "
                f"IVF cluster holds {hot} rows > max_cluster_rows="
                f"{max_cluster_rows}. Re-seed with more / better-spread "
                f"centroids (collect_seeds, larger C), mine the hot cluster "
                f"separately, or pass max_cluster_rows=None to force the "
                f"quadratic run."
            )
    q = emb.select(
        id_col,
        F.col(label_col).cast("int").alias("_lbl"),
        quantize_elements(F.col(vec_col).cast("array<double>"), dim, scale).alias("_q"),
    ).join(assign, id_col)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("own_label", T.IntegerType()),
            T.StructField("neg_id", T.LongType()),
            T.StructField("neg_label", T.IntegerType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("d2", T.LongType()),
            T.StructField("margin", T.LongType()),
        ]
    )
    sent = np.iinfo(np.int64).max

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)  # stable-argsort ties then break by id
        n = len(pdf)
        ids = pdf[id_col].to_numpy()
        labs = pdf["_lbl"].to_numpy()
        if n == 1:
            return pd.DataFrame(
                {f.name: pd.Series([], dtype="object") for f in out_schema}
            )
        x = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
        s = (x * x).sum(axis=1)
        d = s[:, None] + s[None, :] - 2 * (x @ x.T)
        np.fill_diagonal(d, sent)
        same = labs[:, None] == labs[None, :]
        dneg = np.where(same, sent, d)
        dpos = np.where(same, d, sent).min(axis=1)  # self already sentinel
        kk = min(k, n - 1)
        nn = np.argsort(dneg, axis=1, kind="stable")[:, :kk]
        rows = {c: [] for c in (
            id_col, "own_label", "neg_id", "neg_label", "rank", "d2", "margin"
        )}
        rr = np.arange(n)
        picked = dneg[rr[:, None], nn]  # (n, kk)
        for r in range(kk):
            ok = picked[:, r] < sent
            if not ok.any():
                break
            rows[id_col].extend(ids[ok])
            rows["own_label"].extend(labs[ok])
            rows["neg_id"].extend(ids[nn[ok, r]])
            rows["neg_label"].extend(labs[nn[ok, r]])
            rows["rank"].extend([r + 1] * int(ok.sum()))
            rows["d2"].extend(picked[ok, r])
            rows["margin"].extend(
                int(pd_) - int(pp) if pp < sent else None
                for pd_, pp in zip(picked[ok, r], dpos[ok])
            )
        return pd.DataFrame(rows)

    return q.groupBy("cluster").applyInPandas(per_cluster, schema=out_schema)


def _lloyd_centroids(
    base: DataFrame,
    emb: DataFrame,
    n_centroids: int,
    n_iterations: int,
    id_col: str,
    vec_col: str,
) -> dict[int, list[float]]:
    """The Lloyd refinement loop shared by :func:`kmeans_train` and
    :func:`centroid_prune`: per iteration, one Arrow assignment pass +
    one (cluster, dim) micro-integer mean agg (k*d rows collected — the
    broadcast-variable shape); empty clusters keep their previous
    centroid. ``base`` must be the double-cast (and usually
    materialized) corpus frame; ``emb`` supplies the raw seeds."""
    cents: dict[int, list[float]] = dict(
        collect_seeds(emb, n_centroids, id_col, vec_col)
    )
    dim = len(next(iter(cents.values())))
    for _ in range(n_iterations):
        seeds = [(c, cents[c]) for c in sorted(cents)]
        # carry_vec: the assignment pass already holds each vector, so
        # emitting it alongside the cluster removes the per-iteration
        # corpus join that existed only to re-attach it (r18, guide
        # §2.4; float64 is Arrow-bit-exact, sums below are int64 —
        # identical aggregation input, identical means)
        asg = ivf_assign(base, seeds, id_col, vec_col, carry_vec=True)
        rows = (
            asg.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    (
                        F.sum(F.round(F.col("x") * 1e6).cast("long")).cast("double")
                        / F.count("*")
                    )
                    / F.lit(1e6)
                ).alias("m")
            )
            .collect()  # k*d rows by construction — the broadcast shape
        )
        new: dict[int, dict[int, float]] = {}
        for r in rows:
            new.setdefault(int(r["cluster"]), {})[int(r["dim"])] = float(r["m"])
        for c in cents:
            if c in new:  # empty clusters keep their previous centroid
                cents[c] = [new[c][d] for d in range(dim)]
    return cents


def kmeans_train(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches: list | None = None,
) -> DataFrame:
    """Distributed Lloyd's algorithm to a FIXED iteration count — the IVF
    codebook build that `kmeans_refine_step` is one round of. Starting
    from the deterministic seed centroids (first `n_centroids` vectors),
    each iteration assigns every vector to its nearest centroid by
    rounded cosine (ties to the lowest cluster id) and recomputes each
    centroid as the dimension-wise mean of its members; a cluster that
    loses all members keeps its previous centroid. Returns the final
    per-cluster profile (cluster, n_members, centroid_norm, mean_cos).

    Scale shape (the textbook distributed Lloyd): per iteration, ONE
    Arrow-batched assignment pass over the corpus (no shuffle — the
    centroid table rides into the closure) plus ONE (cluster, dim)-keyed
    hash agg with map-side combine whose output is k*d rows REGARDLESS
    of corpus size; the centroid table collected to the driver between
    iterations is k*d doubles by construction (the broadcast-variable
    shape every cluster k-means uses). Nothing quadratic, nothing
    corpus-sized ever moves.

    Cross-engine determinism: centroid means are computed over
    micro-integer-quantized inputs (SUM of BIGINT is exact and
    order-free, divided once), so the oracle's iteration-2 centroids are
    bit-identical to Spark's and rounding drift cannot compound across
    iterations; cosines are rounded to 6dp before every comparison (the
    engine-standard guard).
    """
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    base = _materialize(
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    )
    if caches is not None:
        caches.append(base)
    cents = _lloyd_centroids(base, emb, n_centroids, n_iterations, id_col, vec_col)
    dim = len(next(iter(cents.values())))
    seeds = [(c, cents[c]) for c in sorted(cents)]
    final = ivf_assign(base, seeds, id_col, vec_col, with_cos=True)
    stats = final.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(
            (
                F.sum(F.round(F.col("cos") * 1e6).cast("long")).cast("double")
                / F.count("*")
            )
            / F.lit(1e6),
            6,
        ).alias("mean_cos"),
    )
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        [(c, d, cents[c][d]) for c in sorted(cents) for d in range(dim)],
        "cluster int, dim int, m double",
    )
    norms = cent_df.groupBy("cluster").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    return stats.join(norms, "cluster").select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_members",
        "centroid_norm",
        "mean_cos",
    )


def pq_train_step(
    emb: DataFrame,
    m: int = 4,
    n_centroids: int = 16,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One k-means step of product-quantization codebook training — the
    build counterpart of :func:`pq_adc_topk` (which consumes a trained
    codebook): every vector's m subvectors are assigned to their nearest
    sub-centroid on the integer micro-grid (argmin ties to the smallest
    centroid id, the PQ discipline), and each (subspace, centroid) cell
    reports its membership, the refreshed mean subvector's norm, and the
    mean assignment distance — the DISTORTION curve PQ training watches
    for convergence. Returns (subspace, centroid, n_members,
    centroid_norm, distortion); cells that attracted no member are
    absent (their centroid is unchanged — the caller keeps it).

    Scale shape: NO shuffle ever touches the corpus. One Arrow kernel
    per partition assigns against the closure-broadcast codebook and
    emits PRE-AGGREGATED partials (<= m * n_centroids * sub_dim rows per
    batch: per-cell member counts, integer distance sums, per-dimension
    integer coordinate sums), so the only exchange carries
    codebook-sized frames. Everything that crosses engines is an exact
    BIGINT sum divided once — bit-identical in the oracle."""
    import pandas as pd  # worker-side

    dim = m * sub_dim
    q = emb.select(
        F.col(id_col),
        quantize_elements(F.col(vec_col).cast("array<double>"), dim).alias("_qemb"),
    )
    # codebook: the first n_centroids vectors' quantized subvectors — the
    # same counted-small driver collect as sim_ann_pq_adc_topk's build
    cb_rows = sorted(
        q.orderBy(id_col).limit(n_centroids).collect(), key=lambda r: r[0]
    )
    seed_ids = [int(r[0]) for r in cb_rows]
    cb = np.array(
        [
            [list(r["_qemb"][j * sub_dim : (j + 1) * sub_dim]) for r in cb_rows]
            for j in range(m)
        ],
        dtype=np.int64,
    )  # (m, nc, sub)

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = (
                np.stack(pdf["_qemb"].to_numpy())
                .astype(np.int64)
                .reshape(-1, m, sub_dim)
            )
            n = x.shape[0]
            d = ((x[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=-1)
            codes = d.argmin(axis=-1)  # first min = smallest centroid id
            out = {"j": [], "c": [], "pos": [], "sum_qx": [], "n": [], "sum_d2n": []}
            rows_idx = np.arange(n)
            for j in range(m):
                cj = codes[:, j]
                dj = d[rows_idx, j, cj]
                for c in range(n_centroids):
                    mask = cj == c
                    k = int(mask.sum())
                    if k == 0:
                        continue
                    sq = x[mask, j, :].sum(axis=0)
                    # per-cell distances are int64-bounded (~sub_dim *
                    # qx_range^2 ≈ 6e13 each) but their BATCH sum is
                    # not: ~1.5e5 members in one Arrow batch could wrap
                    # int64 silently. Object dtype sums via Python ints
                    # (arbitrary precision); the downstream partial is
                    # DECIMAL(38,0), so the exactness survives the agg.
                    sd = int(dj[mask].astype(object).sum())
                    for pos in range(sub_dim):
                        out["j"].append(j)
                        out["c"].append(c)
                        out["pos"].append(pos)
                        out["sum_qx"].append(int(sq[pos]))
                        out["n"].append(k if pos == 0 else 0)
                        out["sum_d2n"].append(sd if pos == 0 else 0)
            yield pd.DataFrame(out)

    # sum_d2n crosses the Arrow boundary as decimal(38,0): the per-cell
    # batch sum is a Python int that can legitimately exceed int64 (the
    # same bound the kernel comment derives), and a `long` column would
    # overflow at conversion exactly where the old int64 sum wrapped.
    p = q.mapInPandas(
        partials,
        schema="j int, c int, pos int, sum_qx long, n long, sum_d2n decimal(38,0)",
    )
    agg = p.groupBy("j", "c", "pos").agg(
        F.sum(F.col("sum_qx").cast("decimal(38,0)")).alias("sq"),
        F.sum("n").alias("n_part"),
        F.sum("sum_d2n").alias("sd_part"),
    )
    # per-cell totals via a window over the codebook-sized agg frame — a
    # separate stats aggregation joined back would consume `agg` twice
    # and re-run the corpus kernel (mapInPandas output sits above its
    # last exchange, the materialize.py class), doubling the scan
    from pyspark.sql.window import Window as _W

    cell = _W.partitionBy("j", "c")
    tot = agg.select(
        "j",
        "c",
        "sq",
        F.sum("n_part").over(cell).alias("n"),
        F.sum("sd_part").over(cell).alias("sd"),
    )
    mp = F.col("sq").cast("double") / F.col("n")
    norm = tot.groupBy("j", "c", "n", "sd").agg(
        F.round(F.sqrt(F.sum(mp * mp)) / F.lit(1e6), 6).alias("centroid_norm")
    )
    seed_map = F.create_map(
        *[x for i, s in enumerate(seed_ids) for x in (F.lit(i), F.lit(s))]
    )
    return norm.select(
        F.col("j").alias("subspace"),
        seed_map[F.col("c")].cast("bigint").alias("centroid"),
        F.col("n").cast("bigint").alias("n_members"),
        "centroid_norm",
        F.round((F.col("sd").cast("double") / F.col("n")) / F.lit(1e12), 6).alias(
            "distortion"
        ),
    )


def centroid_prune(
    emb: DataFrame,
    n_centroids: int = 16,
    drop_num: int = 3,
    drop_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches: list | None = None,
) -> DataFrame:
    """Prototype-based corpus pruning (the SSL-prototypes rule of
    Sorscher et al. 2022, arXiv:2206.14486, as used by large-corpus
    curation pipelines): cluster the corpus, rank each cluster's members
    by cosine to the 1-step-REFINED centroid (most prototypical first,
    id tiebreak), and emit the top drop_num/drop_den fraction per
    cluster — the examples a large-data regime prunes FIRST (they carry
    the least marginal information; keeping the hard shell beats random
    at scale). Complements ``semantic_dedup``: that drops near-DUPLICATE
    pairs, this drops PROTOTYPICAL singletons.

    Returns the prune list (vec_id, cluster, cos_to_centroid,
    prot_rank). Scale shape: one Lloyd refinement (Arrow pass + k*d-row
    agg, see :func:`_lloyd_centroids`) + one assignment pass + ONE
    cluster-partitioned window over (cluster)-keyed rows — the
    per-cluster ranking shuffles each row once and never compares
    pairs. Parallelism note: the window runs one task per cluster, so
    n_centroids is the parallelism AND the per-task row bound — at
    production scale k scales with the corpus (the same
    cluster-size-bounding discipline knn_label_audit documents), which
    simultaneously keeps every cluster window executor-sized."""
    from pyspark.sql.window import Window as _W

    from mysql2psql_spark.operators.materialize import materialize as _materialize

    base = _materialize(
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    )
    if caches is not None:
        caches.append(base)
    cents = _lloyd_centroids(base, emb, n_centroids, 1, id_col, vec_col)
    seeds = [(c, cents[c]) for c in sorted(cents)]
    asg = ivf_assign(base, seeds, id_col, vec_col, with_cos=True)
    rank_w = _W.partitionBy("cluster").orderBy(F.desc("cos"), F.col(id_col))
    size_w = _W.partitionBy("cluster")
    rk = asg.select(
        F.col(id_col),
        "cluster",
        "cos",
        F.row_number().over(rank_w).alias("prot_rank"),
        F.count("*").over(size_w).alias("n"),
    )
    return rk.filter(
        F.col("prot_rank") <= F.floor(F.col("n") * drop_num / drop_den)
    ).select(
        F.col(id_col),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col("cos").alias("cos_to_centroid"),
        F.col("prot_rank").cast("bigint").alias("prot_rank"),
    )


def ivf_scored_candidates(
    emb: DataFrame,
    probe_id: int,
    n_centroids: int = 16,
    max_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The shared candidate stage of IVF ANN tuning sweeps: (id,
    probe_rank, cos_sim) for every corpus row assigned to one of the
    ``max_probe`` clusters nearest the probe, with each candidate
    carrying its cluster's PROBE RANK — so callers evaluating several
    n_probe budgets at once (`sim_ivf_probe_sweep`) score the corpus
    ONCE at the widest budget and derive every tighter budget by a
    row-local ``probe_rank <= b`` filter (budget-b candidates are
    exactly that subset under the same coarse quantizer). The
    lsh_scored_candidates pattern, cluster-rank flavored."""
    seed_rows = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()  # centroid table: n_centroids rows by construction
    )
    seeds = [(r[0], [float(x) for x in r[1]]) for r in seed_rows]
    probe_row = emb.filter(F.col(id_col) == probe_id).select(vec_col).head()
    q = np.asarray(probe_row[0], dtype=np.float64)
    s = np.array([v for _, v in seeds], dtype=np.float64)
    cos_q = np.round(
        (s @ q) / (np.sqrt((s * s).sum(axis=1)) * np.sqrt((q * q).sum())), 6
    )
    ranked = [int(c) for c in np.argsort(-cos_q, kind="stable")[:max_probe]]
    rank_map = F.create_map(
        *[x for r, c in enumerate(ranked) for x in (F.lit(c), F.lit(r + 1))]
    )
    assigned = ivf_assign(emb, seeds, id_col, vec_col).filter(
        F.col("cluster").isin(ranked) & (F.col(id_col) != probe_id)
    )
    cand = assigned.join(emb.select(id_col, vec_col), id_col)
    pairs = cand.select(
        F.col(id_col).alias("id_a"),
        F.lit(probe_id).alias("id_b"),
        F.col(vec_col).alias("v_a"),
        rank_map[F.col("cluster")].cast("int").alias("probe_rank"),
    ).withColumn("v_b", F.array(*[F.lit(float(x)) for x in q]))
    return cosine_pairs_df(pairs, extra_cols=("probe_rank",)).select(
        F.col("id_a").alias(id_col), "probe_rank", "cos_sim"
    )


def knn_graph(
    emb: DataFrame,
    k: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches=None,
) -> DataFrame:
    """Approximate mutual-kNN graph over IVF coarse clusters — the
    neighborhood-graph construction step that SemDeDup-style cluster
    pruning, graph-based ANN serving, and density-aware sampling all
    start from. For each vector: its top-``k`` within-cluster
    neighbors by rounded cosine (ties: neighbor id ascending), with a
    ``mutual`` flag marking edges whose reverse edge also survived the
    top-k cut (mutual-kNN is the symmetric backbone most downstream
    clustering keeps). Returns (src, dst, cos_sim, rank, mutual).

    Scale shape: the compare runs per CLUSTER, never across the corpus
    (the `semantic_dedup` candidate discipline — one cluster-keyed
    exchange both self-join sides reuse via the shared materialize);
    the per-source top-k window partitions by src inside a cluster, so
    no global ordering exists anywhere; the mutuality check is a
    self-join of two n*k-sized edge frames on the (src, dst) key.
    At 100 TB, n_centroids grows ~sqrt(N) to bound cluster sizes, and
    the edge frame stays linear in the corpus (n*k rows). ``caches``
    (CacheHandle convention) registers the two persisted frames for
    caller-controlled release in long-lived sessions; the per-call
    bench/driver sessions may omit it."""
    from pyspark.sql import Window

    from mysql2psql_spark.operators.materialize import materialize as _materialize

    seeds = collect_seeds(emb, n_centroids, id_col, vec_col)
    clustered = _materialize(
        ivf_assign(emb, seeds, id_col, vec_col).join(
            emb.select(id_col, vec_col), id_col
        )
    )
    if caches is not None:
        caches.append(clustered)
    a, b = clustered.alias("a"), clustered.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{vec_col}").alias("v_a"),
        F.col(f"b.{vec_col}").alias("v_b"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), F.asc("id_b"))
    ranked = (
        cosine_pairs_df(pairs)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            "cos_sim",
            "rank",
        )
    )
    edges = _materialize(ranked)
    if caches is not None:
        caches.append(edges)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(True).alias("rev")
    )
    return edges.join(rev, ["src", "dst"], "left").select(
        "src",
        "dst",
        "cos_sim",
        "rank",
        F.coalesce(F.col("rev"), F.lit(False)).alias("mutual"),
    )


def knn_graph_delta(
    corpus: DataFrame,
    new: DataFrame,
    k: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches=None,
) -> DataFrame:
    """Incremental maintenance of the mutual-kNN graph under a new
    vector batch — the `dedup_minhash_incremental` discipline applied
    to `knn_graph`: the coarse quantizer stays FROZEN (seeds = the
    first ``n_centroids`` corpus vectors by id — retraining it would
    silently re-bucket the standing graph), arriving vectors are
    assigned to their clusters, and ONLY the touched clusters'
    neighborhoods are recomputed — every top-k list outside them is
    provably unchanged (neighbor candidacy is cluster-local, so a new
    arrival can only displace edges inside its own cluster). Returns
    the replacement edge rows (src, dst, cos_sim, rank, mutual,
    src_is_new) for sources in touched clusters; the caller unions
    them over the standing graph's untouched rows.

    Scale shape: work is O(members of touched clusters), never
    O(corpus) — with n_centroids ~ sqrt(N) a batch of B vectors
    touches at most B clusters of ~sqrt(N) members. The fixture's
    batch scatters into every cluster (the worst case, probed); the
    mutuality self-join stays inside the touched edge frame."""
    from pyspark.sql import Window

    from mysql2psql_spark.operators.materialize import materialize as _materialize

    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    seeds = [(r[0], [float(x) for x in r[1]]) for r in seed_rows]
    both = corpus.select(id_col, vec_col).withColumn(
        "is_new", F.lit(False)
    ).unionByName(new.select(id_col, vec_col).withColumn("is_new", F.lit(True)))
    assigned = _materialize(
        ivf_assign(both, seeds, id_col, vec_col).join(both, id_col)
    )
    if caches is not None:
        caches.append(assigned)
    touched = assigned.filter(F.col("is_new")).select("cluster").distinct()
    members = assigned.join(F.broadcast(touched), "cluster")
    a, b = members.alias("a"), members.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{vec_col}").alias("v_a"),
        F.col(f"b.{vec_col}").alias("v_b"),
        F.col("a.is_new").alias("src_is_new"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), F.asc("id_b"))
    ranked = (
        cosine_pairs_df(pairs, extra_cols=("src_is_new",))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            "cos_sim",
            "rank",
            "src_is_new",
        )
    )
    edges = _materialize(ranked)
    if caches is not None:
        caches.append(edges)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(True).alias("rev")
    )
    return edges.join(rev, ["src", "dst"], "left").select(
        "src",
        "dst",
        "cos_sim",
        "rank",
        F.coalesce(F.col("rev"), F.lit(False)).alias("mutual"),
        "src_is_new",
    )
