"""operators/graph.py: PageRank against a pure-Python reference on small
graphs, plus structural properties (star-graph ordering, determinism
under repartitioning). The full-size oracle check lives in the registry
(graph_pagerank / graph_degree_distribution in tests/test_oracle.py).
"""

from __future__ import annotations

import math

from mysql2psql_spark.operators.graph import degrees, pagerank, undirected_edges


def _ref_pagerank(edge_pairs, iters=3, damping=0.85):
    """Dict-based reference with the SAME truncation discipline as the
    operator: contributions floor-truncated to the 1e-9 grid as exact
    ints, summed exactly, damped update floor-truncated back."""
    edges = set()
    for a, b in edge_pairs:
        edges.add((a, b))
        edges.add((b, a))
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {n: 1.0 for n in out}
    for _ in range(iters):
        acc = {}
        for s, d in edges:
            c = math.floor((ranks[s] / out[s]) * 1e9)
            acc[d] = acc.get(d, 0) + c
        ranks = {
            n: math.floor((0.15 + damping * (v / 1e9)) * 1e9) / 1e9
            for n, v in acc.items()
        }
    return ranks


def _run(spark, pairs, iters=3):
    df = spark.createDataFrame(pairs, ["a", "b"])
    edges = undirected_edges(df, "a", "b")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=iters).collect()}
    return got


def test_star_graph_center_dominates(spark):
    pairs = [("hub", f"leaf{i}") for i in range(4)]
    got = _run(spark, pairs)
    ref = _ref_pagerank(pairs)
    assert got == ref
    assert got["hub"] > max(got[f"leaf{i}"] for i in range(4))


def test_path_graph_matches_reference(spark):
    pairs = [("n1", "n2"), ("n2", "n3"), ("n3", "n4")]
    got = _run(spark, pairs)
    ref = _ref_pagerank(pairs)
    assert got == ref
    # symmetric path: ends equal, middles equal and higher
    assert got["n1"] == got["n4"] and got["n2"] == got["n3"]
    assert got["n2"] > got["n1"]


def test_rank_deterministic_under_repartition(spark):
    pairs = [(f"u{i}", f"v{i % 3}") for i in range(12)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    e1 = undirected_edges(df, "a", "b").repartition(1)
    e7 = undirected_edges(df, "a", "b").repartition(7)
    r1 = {r["node"]: r["rank"] for r in pagerank(e1).collect()}
    r7 = {r["node"]: r["rank"] for r in pagerank(e7).collect()}
    assert r1 == r7


def test_pagerank_cache_release_contract(spark):
    """``CacheHandle`` (context manager) releases the operator-persisted
    edge frame once ranks are consumed (the long-lived-session leak fix):
    inside the block the frame is cached, on exit the cache entry drops,
    and — because persist keeps lineage — re-collecting the ranks AFTER
    release still recomputes the same values. A plain list still
    satisfies the operator-side ``append`` contract (pre-r8 convention)."""
    from mysql2psql_spark.operators.materialize import CacheHandle

    pairs = [("hub", f"leaf{i}") for i in range(4)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    with CacheHandle() as handle:
        ranks = pagerank(undirected_edges(df, "a", "b"), caches=handle)
        got = {r["node"]: r["rank"] for r in ranks.collect()}
        assert len(handle.frames) == 1 and handle.frames[0].is_cached
        cached = handle.frames[0]
    assert not cached.is_cached and handle.frames == []
    handle.release()  # idempotent
    assert {r["node"]: r["rank"] for r in ranks.collect()} == got

    # legacy list accumulator still works
    handles: list = []
    pagerank(undirected_edges(df, "a", "b"), caches=handles).collect()
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist(False)


def test_pagerank_dedup_edges_matches_prededuped(spark):
    """``dedup_edges=True`` on a duplicate-bearing raw edge list yields
    bit-identical ranks to pre-deduped input (the dedup rides the one
    build shuffle — the flagship-query shape)."""
    pairs = [("hub", f"leaf{i}") for i in range(4)]
    raw = spark.createDataFrame(pairs * 3, ["a", "b"])  # duplicated pairs
    clean = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            undirected_edges(raw, "a", "b", pairs_distinct=True),
            dedup_edges=True,
        ).collect()
    }
    ref = {
        r["node"]: r["rank"]
        for r in pagerank(undirected_edges(clean, "a", "b")).collect()
    }
    assert got == ref == _ref_pagerank(pairs)


def test_degrees_bidirectional(spark):
    pairs = [("a", "b"), ("a", "c")]
    df = spark.createDataFrame(pairs, ["x", "y"])
    deg = {r["src"]: r["deg"] for r in degrees(undirected_edges(df, "x", "y")).collect()}
    assert deg == {"a": 2, "b": 1, "c": 1}


def _ref_triangles(pairs):
    """Brute-force per-node triangle counts."""
    import itertools

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] += 1
    return {n: c for n, c in counts.items() if c}


def test_triangles_matches_bruteforce(spark):
    from mysql2psql_spark.operators.graph import triangles

    # K4 plus a pendant and a disconnected edge: K4 has 4 triangles,
    # each K4 node in 3; pendant and isolated pair in none
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("x", "y")]
    df = spark.createDataFrame(pairs, ["u", "v"])
    got = {
        r.node: r.n_triangles
        for r in triangles(undirected_edges(df, "u", "v")).collect()
    }
    assert got == _ref_triangles(pairs) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_random_graph(spark):
    import random

    from mysql2psql_spark.operators.graph import triangles

    rng = random.Random(7)
    nodes = list(range(30))
    pairs = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    df = spark.createDataFrame(pairs, ["u", "v"])
    got = {
        r.node: r.n_triangles
        for r in triangles(undirected_edges(df, "u", "v")).collect()
    }
    assert got == _ref_triangles(pairs)


def test_triangles_duplicate_edges_not_overcounted(spark):
    """A duplicate-bearing edge list (the ADVICE r8 scenario: raw
    co-occurrence pairs repeat across groups) must count each triangle
    once — dedup_edges=True (the r9 default) folds the duplicates away
    before the wedge join, where they would multiply QUADRATICALLY."""
    from mysql2psql_spark.operators.graph import triangles

    base = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    dup = base * 3 + [("b", "a"), ("c", "a")]  # repeats + reversed repeats
    df = spark.createDataFrame(dup, ["u", "v"])
    edges = df.select(
        df.u.alias("src"), df.v.alias("dst")
    ).union(df.select(df.v.alias("src"), df.u.alias("dst")))
    got = {r.node: r.n_triangles for r in triangles(edges).collect()}
    assert got == _ref_triangles(base) == {"a": 1, "b": 1, "c": 1}
    # dedup_edges=False on the same duplicate-bearing list overcounts —
    # the guard exists precisely because this failure is silent
    raw = {r.node: r.n_triangles for r in triangles(edges, dedup_edges=False).collect()}
    assert raw["a"] > 1


def test_triangles_adjacency_matches_bruteforce_and_wedge(spark):
    """The adjacency-intersect formulation (operators/graph.py::
    triangles_adjacency) equals brute force AND the wedge-join
    triangles() on a random graph, including with duplicate raw pairs
    (collect_set absorbs them — no dedup exchange exists in this
    shape)."""
    import random

    from mysql2psql_spark.operators.graph import triangles, triangles_adjacency

    rng = random.Random(11)
    nodes = list(range(25))
    pairs = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(100)})
    dup = pairs * 2  # duplicate-bearing raw input
    df = spark.createDataFrame(dup, ["u", "v"])
    edges = df.select(df.u.alias("src"), df.v.alias("dst"))
    got = {r.node: r.n_triangles for r in triangles_adjacency(edges).collect()}
    wedge = {
        r.node: r.n_triangles
        for r in triangles(undirected_edges(df, "u", "v")).collect()
    }
    assert got == _ref_triangles(pairs) == wedge


def test_triangles_adjacency_degree_orientation(spark):
    """orient='degree' (the hub-shielded mode) finds exactly the same
    per-node counts as orient='id' and brute force — any consistent
    vertex total order counts each triangle once at its least vertex."""
    import random

    from mysql2psql_spark.operators.graph import triangles_adjacency

    rng = random.Random(13)
    nodes = list(range(20))
    pairs = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)})
    # add a low-id hub (node 0 connected to everything): the id-oriented
    # worst case the degree orientation exists for
    pairs = sorted(set(pairs) | {(0, n) for n in nodes if n != 0})
    df = spark.createDataFrame(pairs, ["u", "v"])
    edges = df.select(df.u.alias("src"), df.v.alias("dst"))
    by_id = {r.node: r.n_triangles for r in triangles_adjacency(edges).collect()}
    by_deg = {
        r.node: r.n_triangles
        for r in triangles_adjacency(edges, orient="degree").collect()
    }
    assert by_id == by_deg == _ref_triangles(pairs)


def _ref_lpa(pairs, rounds):
    """Pure-python synchronous LPA: mode of neighbor labels, ties to the
    smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            c = Counter(labels[u] for u in adj[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


def test_label_propagation_matches_reference(spark):
    """Two communities bridged by one edge: LPA labels must match the
    deterministic pure-python reference, including the mode tie-break
    toward the smaller label."""
    import random

    from mysql2psql_spark.operators.graph import label_propagation

    rng = random.Random(7)
    left = list(range(0, 10))
    right = list(range(10, 20))
    pairs = {tuple(sorted(rng.sample(left, 2))) for _ in range(40)}
    pairs |= {tuple(sorted(rng.sample(right, 2))) for _ in range(40)}
    pairs.add((9, 10))  # bridge
    pairs = sorted(pairs)
    df = spark.createDataFrame(pairs, ["a", "b"])
    und = undirected_edges(df, "a", "b", pairs_distinct=True)
    for rounds in (1, 2, 3):
        got = {r.v: r.lbl for r in label_propagation(und, rounds=rounds).collect()}
        assert got == _ref_lpa(pairs, rounds), f"rounds={rounds}"


def test_label_propagation_tie_breaks_to_smallest(spark):
    """A vertex with two equally-frequent neighbor labels adopts the
    smaller one — the determinism contract the SQL oracle unrolls."""
    from mysql2psql_spark.operators.graph import label_propagation

    # path 0-2-1: vertex 2 sees labels {0, 1} once each -> adopts 0
    df = spark.createDataFrame([(0, 2), (1, 2)], ["a", "b"])
    und = undirected_edges(df, "a", "b", pairs_distinct=True)
    got = {r.v: r.lbl for r in label_propagation(und, rounds=1).collect()}
    assert got[2] == 0
    assert got == _ref_lpa([(0, 2), (1, 2)], 1)


def test_label_propagation_caches_contract(spark):
    """ADVICE r10: label_propagation (and the other materialize()-using
    query paths) must let long-lived callers release operator-persisted
    frames via the pagerank CacheHandle contract."""
    from mysql2psql_spark.operators.graph import label_propagation, undirected_edges
    from mysql2psql_spark.operators.materialize import CacheHandle

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "a bigint, b bigint"
    )
    und = undirected_edges(pairs, "a", "b", pairs_distinct=True)
    with CacheHandle() as h:
        labels = label_propagation(und, rounds=2, caches=h)
        assert labels.count() == 5
        assert len(h.frames) == 1
        assert h.frames[0].storageLevel.useMemory
    assert not h.frames  # released on exit


# --- k-core peeling (QUEUED r12 registration: graph_k_core is built and
# oracled but unregistered this round per the r10 verdict's registry
# freeze, so its full DuckDB differential runs HERE) --------------------


def _ref_peel(edge_pairs, k, rounds):
    """Python reference: synchronous peel — each round simultaneously
    drops every vertex with degree < k in the current subgraph. Returns
    [(round, n_vertices, n_edges)]."""
    edges = {tuple(sorted(p)) for p in edge_pairs}
    alive = {v for e in edges for v in e}
    out = []
    for r in range(1, rounds + 1):
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        alive = {v for v in alive if deg.get(v, 0) >= k}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
        out.append((r, len(alive), len(edges)))
    return out


def test_k_core_profile_matches_reference(spark):
    """k_core_profile == the Python peel on a synthetic graph with a
    cascade: a 6-clique (5-core) + a path of hangers-on that peels off
    over several rounds at k=2."""
    import random

    from mysql2psql_spark.operators.graph import k_core_profile
    from mysql2psql_spark.operators.materialize import CacheHandle

    rng = random.Random(11)
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]  # clique
    pairs += [(5 + i, 6 + i) for i in range(8)]  # path tail
    pairs += [(rng.randrange(14), 20 + i) for i in range(10)]  # leaves
    df = spark.createDataFrame(sorted(set(pairs)), ["a", "b"])
    und = undirected_edges(df, "a", "b")
    with CacheHandle() as caches:
        got = sorted(
            (r.round, r.n_vertices, r.n_edges)
            for r in k_core_profile(und, k=2, rounds=4, caches=caches).collect()
        )
    assert got == _ref_peel(pairs, k=2, rounds=4)


def test_k_core_converges_to_profile_fixpoint(spark):
    """k_core (counted early-stop loop) returns exactly the survivor set
    a long fixed-round profile converges to — monotone peeling makes the
    fixpoint unique."""
    from mysql2psql_spark.operators.graph import k_core, k_core_profile
    from mysql2psql_spark.operators.materialize import CacheHandle

    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pairs += [(5 + i, 6 + i) for i in range(8)]
    df = spark.createDataFrame(sorted(set(pairs)), ["a", "b"])
    und = undirected_edges(df, "a", "b")
    with CacheHandle() as caches:
        core = sorted(r.v for r in k_core(und, k=2, caches=caches).collect())
        prof = k_core_profile(und, k=2, rounds=10, caches=caches).collect()
    final = max(prof, key=lambda r: r.round)
    assert len(core) == final.n_vertices
    assert core == sorted(range(6))  # the clique is the entire 2-core's floor
    ref = _ref_peel(pairs, k=2, rounds=10)[-1]
    assert (final.n_vertices, final.n_edges) == (ref[1], ref[2])


def test_k_core_releases_dead_rounds_without_handle(spark):
    """k_core with caches=None must not accumulate ~2 persisted frames
    per round for the loop's lifetime (ADVICE r11): after the loop, the
    only persist-backed storage left is the returned survivor frame plus
    truncate-round checkpoint blocks (bounded by the round count / 3,
    and documented to outlive DataFrame-level release). The peel below
    runs >= 5 rounds; un-released it held >= 10 frames."""
    from mysql2psql_spark.operators.graph import k_core

    sc = spark.sparkContext
    spark.catalog.clearCache()
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pairs += [(5 + i, 6 + i) for i in range(8)]  # peels one hop per round
    df = spark.createDataFrame(sorted(set(pairs)), ["a", "b"])
    und = undirected_edges(df, "a", "b")
    core = k_core(und, k=2, caches=None)
    assert sorted(r.v for r in core.collect()) == sorted(range(6))
    n_left = len(sc._jsc.getPersistentRDDs())
    # returned surv (1) + <= ceil(rounds/3) checkpoint frames * 2 + the
    # in-flight tail; the pre-fix behavior left ~2 per round (>= 12 at 6+
    # rounds). 6 is a generous post-fix ceiling that still fails pre-fix.
    assert n_left <= 6, f"{n_left} persisted RDDs left after k_core"
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def test_k_core_query_matches_oracle(spark, duck):
    """Full DuckDB differential for the queued graph_k_core query —
    identical protocol to test_oracle.py, run at sf0.01."""
    import pandas as pd

    from tests.conftest import SF_DIR_ORACLE
    from mysql2psql_spark.operators.materialize import CacheHandle
    from mysql2psql_spark.queries.graph_q import _ORACLE_KCORE, graph_k_core

    with CacheHandle() as caches:
        got = graph_k_core(spark, SF_DIR_ORACLE, caches=caches).toPandas()
    schema = SF_DIR_ORACLE.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    duck.execute(f"USE {schema}")
    want = duck.execute(_ORACLE_KCORE).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
