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


_COSINE_PAIRS_ENGINE = "explode"  # module default; kill switch for probe A/Bs


def cosine_pairs_df(
    pairs: DataFrame,
    round_to: int = 6,
    extra_cols: tuple[str, ...] = (),
    engine: str | None = None,
) -> Column | DataFrame:
    """(id_a, id_b, v_a, v_b) -> (id_a, id_b, cos_sim).

    Two row-identical execution shapes (the shingle_hash_table
    discipline — flipping ``engine`` never changes a downstream hash):

    - ``engine="arrow"``: one ``mapInArrow`` pass computes the
      three partial sums (dot, |a|^2, |b|^2) per pair with NumPy over
      the list arrays' backing buffers (guide §4.2 — a fixed-dim
      ``list<float>`` Arrow column is one contiguous values buffer, so
      the batch reshapes to an (n, dim) matrix zero-copy) and the
      division/sqrt/round stay Spark-side expressions. Accumulation
      runs dimension-by-dimension over float64 columns — the SAME
      position-order IEEE sequence (widen, multiply, add) as the
      explode shape's map-side partial aggregation, so the result is
      bit-identical (asserted exact, pre-round, in
      test_cosine_pairs_engines_bit_identical). No per-pair row
      fan-out, no hash aggregation, no exchange: the pass preserves the
      input partitioning.
    - ``engine="explode"`` (default): posexplode the zipped pair once and
      hash-aggregate plain codegen products; a pair's exploded rows
      never leave their input partition, so map-side partial
      aggregation accumulates each sum sequentially in position order
      (bit-compatible with DuckDB's LIST_COSINE_SIMILARITY). Kept as
      the pure-JVM cross-check and the fallback for exotic inputs
      (ragged dims / null elements), which the arrow path detects and
      routes per batch to an order-identical scalar loop.

    ``extra_cols``: additional pair-level columns (functionally
    dependent on the (id_a, id_b) key — e.g. a candidate's cluster or
    probe rank) carried through; output cardinality is unchanged.
    """
    engine = engine or _COSINE_PAIRS_ENGINE
    if engine == "arrow":
        return _cosine_pairs_arrow(pairs, round_to, extra_cols)
    ex = pairs.select(
        "id_a",
        "id_b",
        *extra_cols,
        F.posexplode(F.arrays_zip("v_a", "v_b")).alias("pos", "p"),
    ).select(
        "id_a",
        "id_b",
        *extra_cols,
        F.col("p.v_a").cast("double").alias("xa"),
        F.col("p.v_b").cast("double").alias("xb"),
    )
    agg = ex.groupBy("id_a", "id_b", *extra_cols).agg(
        F.sum(F.col("xa") * F.col("xb")).alias("dot"),
        F.sum(F.col("xa") * F.col("xa")).alias("na"),
        F.sum(F.col("xb") * F.col("xb")).alias("nb"),
    )
    return agg.select(
        "id_a",
        "id_b",
        *extra_cols,
        F.round(F.col("dot") / (F.sqrt("na") * F.sqrt("nb")), round_to).alias("cos_sim"),
    )


def _cosine_pairs_arrow(
    pairs: DataFrame, round_to: int, extra_cols: tuple[str, ...]
) -> DataFrame:
    """The mapInArrow engine of :func:`cosine_pairs_df` — see there."""
    from pyspark.sql import types as T

    keep = ["id_a", "id_b", *extra_cols]
    sel = pairs.select(*keep, "v_a", "v_b")
    out_fields = [f for f in sel.schema.fields if f.name in keep]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("dot", T.DoubleType()),
            T.StructField("na", T.DoubleType()),
            T.StructField("nb", T.DoubleType()),
        ]
    )

    def run(batches):
        # heavy imports once per task (guide §4.5)
        import numpy as np
        import pyarrow as pa

        def sums_fast(col, n):
            """(n, dim) float64 views of a uniform list column, or None."""
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            # top-level null arrays AND null elements inside the child
            # values both change the explode shape's null semantics —
            # route either to the order-identical scalar path
            if arr.null_count or arr.values.null_count:
                return None
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + n + 1
            ]
            widths = np.diff(offs)
            if n and (widths.min() != widths.max()):
                return None
            vals = arr.flatten().to_numpy(zero_copy_only=False)
            if vals.dtype != np.float64:
                vals = vals.astype(np.float64)
            return vals.reshape(n, widths[0] if n else 0)

        def scalar_sums(va_list, vb_list):
            """Order-identical fallback for ragged/null rows with the
            exact explode-shape semantics: zip_with pads the shorter
            array with nulls, SUM skips null terms (an all-null sum is
            NULL), and a zero-length zip produces no group at all (the
            pair is dropped, signalled here by n_rows == 0)."""
            rows = []
            for a, b in zip(va_list, vb_list):
                if a is None or b is None:
                    # arrays_zip(null, x) is NULL; posexplode(NULL)
                    # yields no rows, so the pair is dropped
                    rows.append((None, None, None, 0))
                    continue
                n_rows = max(len(a), len(b))
                dot = na = nb = None
                for i in range(n_rows):
                    x = float(a[i]) if i < len(a) and a[i] is not None else None
                    y = float(b[i]) if i < len(b) and b[i] is not None else None
                    if x is not None and y is not None:
                        dot = (0.0 if dot is None else dot) + x * y
                    if x is not None:
                        na = (0.0 if na is None else na) + x * x
                    if y is not None:
                        nb = (0.0 if nb is None else nb) + y * y
                rows.append((dot, na, nb, n_rows))
            return rows

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            va = sums_fast(batch.column("v_a"), n)
            vb = sums_fast(batch.column("v_b"), n)
            keep_cols = [batch.column(k) for k in keep]
            if va is not None and vb is not None and va.shape == vb.shape:
                dim = va.shape[1]
                if dim == 0:
                    continue  # explode shape drops all-empty pairs
                dot = va[:, 0] * vb[:, 0]
                na = va[:, 0] * va[:, 0]
                nb = vb[:, 0] * vb[:, 0]
                for d in range(1, dim):
                    dot = dot + va[:, d] * vb[:, d]
                    na = na + va[:, d] * va[:, d]
                    nb = nb + vb[:, d] * vb[:, d]
                yield pa.RecordBatch.from_arrays(
                    keep_cols
                    + [pa.array(dot), pa.array(na), pa.array(nb)],
                    schema=pa.schema(
                        list(zip(keep, (c.type for c in keep_cols)))
                        + [
                            ("dot", pa.float64()),
                            ("na", pa.float64()),
                            ("nb", pa.float64()),
                        ]
                    ),
                )
            else:
                rows = scalar_sums(
                    batch.column("v_a").to_pylist(), batch.column("v_b").to_pylist()
                )
                mask = [r[3] > 0 for r in rows]
                tbl = pa.table(
                    dict(
                        zip(
                            keep + ["dot", "na", "nb"],
                            keep_cols
                            + [
                                pa.array([r[0] for r in rows], pa.float64()),
                                pa.array([r[1] for r in rows], pa.float64()),
                                pa.array([r[2] for r in rows], pa.float64()),
                            ],
                        )
                    )
                ).filter(pa.array(mask))
                for b in tbl.to_batches():
                    if b.num_rows:
                        yield b

    agg = sel.mapInArrow(run, schema=out_schema)
    return agg.select(
        "id_a",
        "id_b",
        *extra_cols,
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


def topk_sum(
    scored: DataFrame,
    key_col: str,
    other_col: str,
    score_col: str,
    k: int,
    fanout: int = 32,
) -> DataFrame:
    """Exact per-key sum of the top-``k`` scores, TWO-PHASE: a local
    row_number inside (key, hash-bucket-of-other) partitions — ``fanout``
    buckets per key, so the full candidate exchange spreads over
    |keys| * fanout partitions — then a global row_number per key over
    the <= fanout * k surviving rows. A single per-key window would
    funnel EVERY candidate score for one key through one task (the
    batch_topk straggler analysis applies verbatim); two-phase is exact
    because any global top-k row is necessarily in its bucket's top-k
    under the same total order (score desc, other-id asc — deterministic
    tiebreak). Returns (key_col, ksum) with ksum = int64 sum of the
    top-k scores, the exact-decimal discipline the margin oracle needs.
    """
    from pyspark.sql.window import Window as W

    local = W.partitionBy(
        key_col, F.pmod(F.hash(F.col(other_col)), F.lit(fanout))
    ).orderBy(F.col(score_col).desc(), F.col(other_col))
    survivors = (
        scored.select(key_col, other_col, score_col)
        .withColumn("_r", F.row_number().over(local))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    final = W.partitionBy(key_col).orderBy(F.col(score_col).desc(), F.col(other_col))
    return (
        survivors.withColumn("_r", F.row_number().over(final))
        .filter(F.col("_r") <= k)
        .groupBy(key_col)
        .agg(F.sum(score_col).alias("ksum"))
    )


def bitext_margin_pairs(
    emb_x: DataFrame,
    emb_y: DataFrame,
    k: int = 4,
    threshold: float = 1.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
    max_pairs: int | None = 25_000_000,
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER parallel-corpus miner): score cross-side pairs by the
    RATIO margin

        margin(x, y) = cos(x, y) / ((avg_topk_cos(x, Y) + avg_topk_cos(y, X)) / 2)

    and keep MUTUAL-BEST pairs (y is x's argmax margin AND x is y's)
    with margin >= threshold. Margins normalize each pair's cosine by
    both endpoints' local neighborhood density, which is what separates
    true translations from hubs in high-density regions — a plain cosine
    threshold can't.

    Integer-exact: cosines are rounded to 6dp then scaled to int64
    (``c6``); the top-k neighborhood sums are int64 (order-free), and the
    margin is ONE double division of int64s rounded to 6dp — bit-identical
    on any engine/partitioning. Mutual-best is a hash AGGREGATE, not a
    window: per side, ``max(struct(margin, -other_id))`` picks the
    highest margin with ties toward the smallest partner id — map-side
    combinable, no per-key candidate funnel. The top-k sums use the
    two-phase :func:`topk_sum`.

    This entry scores the FULL cross product (the exact baseline), so it
    carries the same counted gate as ``exact_cosine_pairs``: |X| * |Y|
    must stay under ``max_pairs`` (default 2.5e7 ~ the sf0.1 bench
    ceiling). At production scale mine within ANN candidates instead:
    generate (x, y) candidates with ``ann_topk_ivf`` / ``lsh_scored_
    candidates`` per side and feed the scored frame through the same
    margin + mutual-best tail — every stage downstream of scoring is
    hash-keyed and linear in the candidate count.
    """
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    if max_pairs is not None:
        cap = int(max_pairs**0.5) * 8 + 2
        nx = emb_x.limit(cap).count()
        ny = emb_y.limit(cap).count()
        # A count that HIT the cap may be truncated, and a truncated count
        # UNDERestimates the product — a highly asymmetric input (|X| huge,
        # |Y| tiny) could slip under max_pairs and run the full quadratic
        # crossJoin (ADVICE r11, medium). If exactly one side is capped,
        # re-count it against the bound the other side's exact count
        # implies: with the other side at m rows, any true count >=
        # max_pairs // m + 1 makes the product exceed max_pairs, so a
        # limit at that value either returns the exact count (sound test)
        # or saturates at a value that already fails the test. Both-capped
        # needs no re-count: cap * cap = 64 * max_pairs + O(cap) always
        # refuses. The re-count stays bounded (CollectLimit short-circuits).
        if nx >= cap and ny < cap and ny > 0:
            nx = emb_x.limit(max_pairs // ny + 1).count()
        elif ny >= cap and nx < cap and nx > 0:
            ny = emb_y.limit(max_pairs // nx + 1).count()
        if nx * ny > max_pairs:
            raise ValueError(
                f"bitext_margin_pairs scores the full |X| x |Y| cross product "
                f"({nx} x {ny} > max_pairs={max_pairs}); restrict to ANN "
                f"candidates (ann_topk_ivf / lsh_scored_candidates) for "
                f"production corpora, or pass max_pairs=None to force it."
            )
    pairs = emb_x.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    ).crossJoin(emb_y.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")))
    scored = _materialize(
        cosine_pairs_df(pairs).select(
            "id_a",
            "id_b",
            F.round(F.col("cos_sim") * 1e6).cast("long").alias("c6"),
        )
    )
    if caches is not None:
        caches.append(scored)
    return margin_mutual_best(scored, k, threshold, fanout, caches=caches)


def margin_mutual_best(
    scored: DataFrame,
    k: int,
    threshold: float,
    fanout: int = 32,
    caches: "list[DataFrame] | None" = None,
    persist_m: bool = True,
) -> DataFrame:
    """The margin + mutual-best tail shared by :func:`bitext_margin_pairs`
    (exact cross-product scoring) and :func:`bitext_margin_ann` (LSH
    candidate scoring): given a scored candidate frame
    (id_a, id_b, c6: int64 cosine * 1e6), compute each pair's ratio
    margin against both endpoints' top-``k`` neighborhood sums
    (two-phase :func:`topk_sum`) and keep mutual-best pairs clearing
    ``threshold``. Every stage is hash-keyed and linear in the candidate
    count — this is the piece that stays IDENTICAL when the candidate
    generator swaps from the gated cross product to ANN at production
    scale. Callers must persist ``scored`` (three consumers: both
    topk_sum passes and the margin join).

    The margin frame ``m`` feeds BOTH mutual-best aggregations, and its
    subtree is the query's deepest (scored -> two two-phase topk_sum
    window pipelines -> two joins): left unmaterialized, the final
    best_x |><| best_y join carries a full copy of that subtree per
    branch (r17 plan: 2x the window/join stages, zero static exchange
    reuse). ``persist_m`` (default) persists the candidate-bounded
    (id_a, id_b, margin) frame — pair-table-sized at any corpus scale —
    so the deep subtree executes once; registered on ``caches`` when a
    handle is given (the CacheHandle release convention). Values are
    unaffected either way: margins are int64-exact by construction.
    ``persist_m=False`` is the measurement knob for the A/B."""
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    fwd = topk_sum(scored, "id_a", "id_b", "c6", k, fanout).withColumnRenamed(
        "ksum", "fsum"
    )
    bwd = topk_sum(scored, "id_b", "id_a", "c6", k, fanout).withColumnRenamed(
        "ksum", "bsum"
    )
    m = (
        scored.join(fwd, "id_a")
        .join(bwd, "id_b")
        .filter(F.col("fsum") + F.col("bsum") > 0)
        .select(
            "id_a",
            "id_b",
            F.round(
                (F.col("c6") * 2 * k).cast("double") / (F.col("fsum") + F.col("bsum")),
                6,
            ).alias("margin"),
        )
    )
    if persist_m:
        m = _materialize(m)
        if caches is not None:
            caches.append(m)
    best_x = m.groupBy("id_a").agg(
        F.max(F.struct(F.col("margin"), (-F.col("id_b")).alias("nb"))).alias("s")
    ).select("id_a", (-F.col("s.nb")).alias("id_b"), F.col("s.margin").alias("margin"))
    best_y = m.groupBy("id_b").agg(
        F.max(F.struct(F.col("margin"), (-F.col("id_a")).alias("na"))).alias("s")
    ).select("id_b", (-F.col("s.na")).alias("id_a"))
    return (
        best_x.join(best_y, ["id_a", "id_b"])
        .filter(F.col("margin") >= threshold)
        .select(
            F.col("id_a").alias("id_x"),
            F.col("id_b").alias("id_y"),
            "margin",
        )
    )


def bitext_margin_ann(
    emb_x: DataFrame,
    emb_y: DataFrame,
    k: int = 4,
    threshold: float = 1.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: "list[list[float]] | None" = None,
    tables: int | None = None,
    r: int | None = None,
    fanout: int = 32,
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """:func:`bitext_margin_pairs`' PRODUCTION path: identical margin +
    mutual-best tail (:func:`margin_mutual_best`), but candidates come
    from a cross-side multi-table hyperplane-LSH bucket join instead of
    the gated |X| x |Y| cross product — a pair is scored iff its packed
    sign-bit keys collide in >= 1 of the L tables (the OR-construction
    of operators/embedding.py::lsh_cosine_pairs, here across two
    corpora). Candidate volume is bucket-bounded, so nothing in the plan
    is quadratic in either corpus: the bucket join shuffles ~24-byte
    (id, table, key) rows, vectors rejoin only for the surviving
    candidate set, and the margin's top-k neighborhood sums run over
    each id's CANDIDATE neighbors — the standard ANN approximation of
    the CCMatrix miner, where margins are computed over retrieved k-NN
    lists rather than the full other-side corpus. Deterministic planes
    (embedding.hyperplanes literals) keep the candidate set, and
    therefore the margins, exactly reproducible by the SQL oracle."""
    from mysql2psql_spark.operators.embedding import (
        TABLE_R,
        TABLES_L,
        hyperplanes,
        table_keys_df,
    )
    from mysql2psql_spark.operators.materialize import materialize as _materialize

    tables = TABLES_L if tables is None else tables
    r = TABLE_R if r is None else r
    planes = planes or hyperplanes(tables * r)
    bx = table_keys_df(emb_x, planes, tables, r, id_col, vec_col).withColumnRenamed(
        id_col, "id_a"
    )
    by = table_keys_df(emb_y, planes, tables, r, id_col, vec_col).withColumnRenamed(
        id_col, "id_b"
    )
    cand = (
        bx.join(by, ["table", "key"])
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        emb_x.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")), "id_a"
    ).join(
        emb_y.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")), "id_b"
    )
    scored = _materialize(
        cosine_pairs_df(cand).select(
            "id_a",
            "id_b",
            F.round(F.col("cos_sim") * 1e6).cast("long").alias("c6"),
        )
    )
    if caches is not None:
        caches.append(scored)
    return margin_mutual_best(scored, k, threshold, fanout, caches=caches)
