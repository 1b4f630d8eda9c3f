"""Property tests (SURVEY.md §5 item 4): the Column-expression dump
functions agree with direct Python models of the reference's row
functions (/root/reference/dumperAuxFuncs.py) on arbitrary inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql2psql_spark.rules.dump_functions import (
    convert_str_boolean,
    default_date,
    make_it_time,
    ref_to_nullable,
)

# value universe: numeric strings, garbage, zero-dates, real dates, None
VALUES = st.one_of(
    st.none(),
    st.integers(-5, 5).map(str),
    st.sampled_from(
        ["0000-00-00", "0000-00-00 00:00:00", "2020-05-01", "12:34", "9:30", "xx", "", "7.5"]
    ),
    st.text(alphabet="0123456789:-x ", max_size=12),
)


def _ref_convert_str_boolean(v):
    # dumperAuxFuncs.py:8-11: bool(int(value)) with any failure -> False
    try:
        return bool(int(v))
    except (TypeError, ValueError):
        return False


def _ref_default_date(v, nullable):
    # dumperAuxFuncs.py:13-21: zero-date prefix or NULL -> NULL / epoch
    bad = v is None or str(v).startswith("0000")
    if bad:
        return None if nullable else "1900-01-01"
    return v


def _ref_make_it_time(v, nullable):
    # dumperAuxFuncs.py:38-41: keep iff matches ^\d\d:\d\d
    ok = v is not None and re.match(r"^\d\d:\d\d", str(v))
    if ok:
        return v
    return None if nullable else "00:00"


def _ref_to_nullable(v):
    # dumperAuxFuncs.py:29-32: 0/'0' -> NULL
    return None if (v is not None and str(v) == "0") else v


@settings(max_examples=30, deadline=None)
@given(st.lists(VALUES, min_size=1, max_size=8))
def test_dump_functions_match_reference_model(spark_prop, values):
    spark = spark_prop
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        convert_str_boolean(F.col("v")).alias("b"),
        default_date(F.col("v"), nullable=True).alias("dn"),
        default_date(F.col("v"), nullable=False).alias("dnn"),
        make_it_time(F.col("v"), nullable=True).alias("tn"),
        make_it_time(F.col("v"), nullable=False).alias("tnn"),
        ref_to_nullable(F.col("v")).alias("r"),
    ).collect()
    for v, r in zip(values, rows):
        assert r.b == _ref_convert_str_boolean(v), (v, r.b)
        assert r.dn == _ref_default_date(v, True), (v, r.dn)
        assert r.dnn == _ref_default_date(v, False), (v, r.dnn)
        assert r.tn == _ref_make_it_time(v, True), (v, r.tn)
        assert r.tnn == _ref_make_it_time(v, False), (v, r.tnn)
        assert r.r == _ref_to_nullable(v), (v, r.r)


def _py_morton(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
def test_zorder_key_matches_python_model(spark_prop, pts):
    """Morton interleave property: the Column expression equals the pure
    Python model for arbitrary in-domain points, and distinct points get
    distinct keys (bijectivity on the 2^20 grid)."""
    from mysql2psql_spark.operators.layout import zorder_key

    spark = spark_prop
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert len(set(got.values())) == len(pts)
    for (x, y), z in got.items():
        assert z == _py_morton(x, y), (x, y, z)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 40),        # o_custkey
            st.integers(0, 364),       # day offset within 1997
            st.integers(1, 500000),    # price cents
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(0, 364),               # watermark day
)
def test_m5_merge_invariant_under_any_cut(spark_prop, orders, cut_day):
    """MV maintenance algebra: for ANY watermark position, base ⊕ delta
    must equal the full per-key aggregate — totals and counts exact."""
    import datetime

    from pyspark.sql import functions as PF

    spark = spark_prop
    rows = [
        (k, (datetime.datetime(1997, 1, 1) + datetime.timedelta(days=d)).strftime("%Y-%m-%d %H:%M:%S"), cents / 100.0)
        for (k, d, cents) in orders
    ]
    df = spark.createDataFrame(rows, "o_custkey BIGINT, o_orderdate STRING, o_totalprice DOUBLE").withColumn(
        "o_orderdate", PF.to_timestamp("o_orderdate")
    )
    cut = PF.to_timestamp(
        PF.lit((datetime.datetime(1997, 1, 1) + datetime.timedelta(days=cut_day)).strftime("%Y-%m-%d %H:%M:%S"))
    )

    def agg(frame):
        return frame.groupBy("o_custkey").agg(
            PF.count("*").alias("n"),
            PF.sum(PF.col("o_totalprice").cast("decimal(12,4)")).alias("s"),
        )

    base = agg(df.filter(PF.col("o_orderdate") < cut))
    delta = agg(df.filter(PF.col("o_orderdate") >= cut))
    zn = PF.lit(0).cast("bigint")
    zs = PF.lit(0).cast("decimal(12,4)")
    merged = {
        r.k: (r.n, r.s)
        for r in base.alias("b")
        .join(delta.alias("d"), PF.col("b.o_custkey") == PF.col("d.o_custkey"), "full_outer")
        .select(
            PF.coalesce(PF.col("b.o_custkey"), PF.col("d.o_custkey")).alias("k"),
            (PF.coalesce(PF.col("b.n"), zn) + PF.coalesce(PF.col("d.n"), zn)).alias("n"),
            (PF.coalesce(PF.col("b.s"), zs) + PF.coalesce(PF.col("d.s"), zs)).alias("s"),
        )
        .collect()
    }
    full = {r.o_custkey: (r.n, r.s) for r in agg(df).collect()}
    assert merged == full


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_paths_agree(spark_prop, raw_pairs):
    """Path equivalence property (r6): for ARBITRARY pair graphs, the
    driver union-find (small-graph gate) and the distributed min-label
    rounds must produce identical (node -> min reachable id) labelings,
    and both must match a pure-Python BFS model."""
    from mysql2psql_spark.operators.dedup import connected_components

    spark = spark_prop
    # normalize to doc_a < doc_b like the dedup operators emit
    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs})
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")

    # pure-Python reachability model
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for start in adj:
        seen, stack = {start}, [start]
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        want[start] = min(seen)

    got_driver = {
        r.doc_id: r.cluster_id for r in connected_components(df).collect()
    }
    got_dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got_driver == want
    assert got_dist == want


# ---------------------------------------------------------------------------
# MMR greedy selection (operators/similarity.py::mmr_select): pinned
# against a brute-force replay of the definition — at every step the pick
# must be the argmax of (min d2 to selected) - rel_d2 with ties toward
# the smallest id — plus explicit tie-break and k >= n edge pins.
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=4, max_size=4),
        min_size=1,
        max_size=12,
        unique_by=tuple,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_mmr_select_matches_definition(vec_rows, k):
    from mysql2psql_spark.operators.similarity import mmr_select

    vecs = {i: v for i, v in enumerate(vec_rows)}
    # relevance = distance to the zero vector (any fixed probe works)
    rel = {i: sum(x * x for x in v) for i, v in vecs.items()}
    out = mmr_select(vecs, rel, k)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(vecs[a], vecs[b]))

    assert len(out) == min(k, len(vecs))
    assert [r for _, r, _ in out] == list(range(1, len(out) + 1))
    selected = []
    for vid, rank, nov in out:
        remaining = [v for v in vecs if v not in selected]
        if rank == 1:
            want = min(remaining, key=lambda v: (rel[v], v))
            assert nov is None
        else:
            scores = {v: min(d2(v, s) for s in selected) - rel[v] for v in remaining}
            best_score = max(scores.values())
            want = min(v for v, s in scores.items() if s == best_score)
            assert nov == min(d2(vid, s) for s in selected)
        assert vid == want
        selected.append(vid)


def test_mmr_select_tie_breaks_to_smallest_id():
    from mysql2psql_spark.operators.similarity import mmr_select

    # three identical vectors: every score ties, so selection order must
    # be ascending id; novelty is 0 from rank 2 on
    vecs = {7: [1, 1], 3: [1, 1], 5: [1, 1]}
    rel = {7: 2, 3: 2, 5: 2}
    assert mmr_select(vecs, rel, 3) == [(3, 1, None), (5, 2, 0), (7, 3, 0)]


def test_mmr_select_k_exceeding_candidates():
    from mysql2psql_spark.operators.similarity import mmr_select

    vecs = {0: [0, 0], 1: [3, 4]}
    rel = {0: 0, 1: 25}
    out = mmr_select(vecs, rel, 10)
    assert out == [(0, 1, None), (1, 2, 25)]


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True
    ),
    n_buckets=st.sampled_from([1, 2, 7, 16, 64]),
)
@settings(max_examples=25, deadline=None)
def test_dense_index_is_bijective_and_matches_contract(spark_prop, keys, n_buckets):
    """dense_index must assign each row a UNIQUE ordinal covering
    0..n-1 exactly, equal to its rank under the advertised
    (key % n_buckets, key) total order — the SQL-restatable contract
    every consumer's oracle builds on (operators/indexing.py)."""
    from mysql2psql_spark.operators.indexing import dense_index

    df = spark_prop.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r["k"]: r["ordinal"]
        for r in dense_index(df, ["k"], n_buckets=n_buckets).collect()
    }
    want = {
        k: i for i, k in enumerate(sorted(keys, key=lambda k: (k % n_buckets, k)))
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),  # key
            st.sampled_from(["a", "b", "c"]),             # domain
            st.integers(min_value=0, max_value=50),       # weight
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    budget=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=20, deadline=None)
def test_budget_capped_sample_matches_bruteforce(spark_prop, rows, budget):
    """budget_capped_sample's two-phase hex-prefix running sum must equal
    the brute-force single-pass cumulative sum in md5(key) order per
    domain, with the inclusive <= budget cut (operators/text.py)."""
    import hashlib

    from mysql2psql_spark.operators.text import budget_capped_sample

    df = spark_prop.createDataFrame(rows, "k bigint, dom string, w bigint")
    got = {
        (r["k"], r["dom"]): r["cum_weight"]
        for r in budget_capped_sample(df, "dom", "w", "k", budget).collect()
    }
    want = {}
    for dom in {r[1] for r in rows}:
        cum = 0
        members = sorted(
            (r for r in rows if r[1] == dom),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        for k, _, w in members:
            cum += w
            if cum <= budget:
                want[(k, dom)] = cum
    assert got == want


@given(
    counts=st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2"]),
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=1),  # period
            st.integers(min_value=1, max_value=500),  # n
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
@settings(max_examples=10, deadline=None)
def test_drift_psi_tail_matches_python_model(spark_prop, counts):
    """operators/drift.py::drift_psi_tail over ARBITRARY summed count
    tables must equal an independent python restatement of the smoothed
    PSI formula (shares from raw counts, +1-per-bucket Laplace terms,
    6dp rounding), and every present term must be non-negative. One-
    period dims are legal input — a mid-stream summary read sees only
    period-0 counts until the stream crosses the frozen midpoint — and
    must yield NULL for the zero-total side's share and for psi_term
    (the partial-profile contract), never an ANSI division error."""
    import math

    from mysql2psql_spark.operators.drift import drift_psi_tail

    df = spark_prop.createDataFrame(
        counts, "dim string, bucket string, period int, n bigint"
    )
    got = {
        (r.dim, r.bucket): (r.n_a, r.n_b, r.share_a, r.share_b, r.psi_term)
        for r in drift_psi_tail(df).collect()
    }
    # python model
    agg: dict = {}
    for dim, bucket, period, n in counts:
        cell = agg.setdefault((dim, bucket), [0, 0])
        cell[period] += n
    want = {}
    for dim in {d for d, _ in agg}:
        cells = {b: v for (d, b), v in agg.items() if d == dim}
        tot_a = sum(v[0] for v in cells.values())
        tot_b = sum(v[1] for v in cells.values())
        nb = len(cells)
        for b, (n_a, n_b) in cells.items():
            pa = (n_a + 1) / (tot_a + nb)
            pb = (n_b + 1) / (tot_b + nb)
            want[(dim, b)] = (
                n_a,
                n_b,
                round(n_a / tot_a, 6) if tot_a else None,
                round(n_b / tot_b, 6) if tot_b else None,
                round((pa - pb) * math.log(pa / pb), 6)
                if tot_a and tot_b
                else None,
            )
    assert set(got) == set(want)
    for k, (n_a, n_b, sa, sb, term) in want.items():
        g = got[k]
        assert (g[0], g[1]) == (n_a, n_b), k
        for gi, wi in zip(g[2:], (sa, sb, term)):
            if wi is None:
                assert gi is None, (k, gi)
            else:
                assert gi is not None and abs(gi - wi) < 2e-6, (k, gi, wi)
        if g[4] is not None:
            assert g[4] >= 0


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=400),  # o_orderkey
            st.integers(min_value=1, max_value=50),  # o_custkey
            st.sampled_from(["O", "F", "P"]),
            st.floats(min_value=1.0, max_value=9999.0, allow_nan=False, width=32),
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=8, deadline=None)
def test_snapshot_diff_reconstructs_b_from_a(spark_prop, rows):
    """m7's change set, APPLIED to snapshot A in pure python (delete the
    removed keys, add the added keys, patch exactly the columns each
    'changed' row names with B's rule-derived values), must reconstruct
    snapshot B — the round-trip that makes a diff a usable CDC
    bootstrap, checked over arbitrary key sets."""
    import datetime as dt
    import tempfile

    from mysql2psql_spark.queries.migration_q import m7_snapshot_diff

    base_ts = dt.datetime(2024, 3, 1)
    full = [
        (k, ck, st_, float(tp), base_ts + dt.timedelta(days=k % 30), pr)
        for k, ck, st_, tp, pr in rows
    ]
    df = spark_prop.createDataFrame(
        full,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
        diff = m7_snapshot_diff(spark_prop, tmp).collect()

    a = {r[0]: r for r in full}
    # B by the rules (the operator's construction, replayed)
    b_want = {}
    for k, rec in a.items():
        if k % 97 == 3:
            pass  # removed
        else:
            b_want[k] = (
                rec[1],
                "X" if k % 89 == 7 else rec[2],
                rec[3] + 1.5 if k % 91 == 5 else rec[3],
                rec[4],
                "9-REASSIGNED" if k % 89 == 7 else rec[5],
            )
        if k % 101 == 11:
            b_want[k + 100000000] = (rec[1], "N", rec[3], rec[4], rec[5])
    # apply the DIFF to A
    b_got = {k: (r[1], r[2], r[3], r[4], r[5]) for k, r in a.items()}
    for d in diff:
        k = d.o_orderkey
        if d.change_type == "removed":
            del b_got[k]
        elif d.change_type == "added":
            src = a[k - 100000000]
            b_got[k] = (src[1], "N", src[3], src[4], src[5])
        else:
            cur = list(b_got[k])
            for col in d.changed_columns.split(","):
                if col == "o_orderstatus":
                    cur[1] = "X"
                elif col == "o_totalprice":
                    cur[2] = a[k][3] + 1.5
                elif col == "o_orderpriority":
                    cur[4] = "9-REASSIGNED"
                else:
                    raise AssertionError(f"unexpected changed col {col}")
            b_got[k] = tuple(cur)
    assert b_got == b_want


@given(
    buckets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # hour offset
            st.integers(min_value=1, max_value=9),  # events that hour
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=8, deadline=None)
def test_events_changepoint_matches_python_model(spark_prop, buckets):
    """events_changepoint over an arbitrary single-type stream must
    equal a pure-python CUSUM replay: dense hourly spine, S_t =
    cum - t*mu, argmax |S_t| with earliest-bucket tiebreak, before/after
    means."""
    import datetime as dt
    import tempfile

    from hypothesis import assume

    from mysql2psql_spark.queries.events_q import events_changepoint

    hours = {h for h, _ in buckets}
    assume(len(hours) >= 2)
    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for h, n in buckets:
        for j in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=j), eid, "t", 1.0, "{}")
            )
            eid += 1
    df = spark_prop.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = events_changepoint(spark_prop, tmp).collect()
    assert len(got) == 1
    g = got[0]
    # python replay — the model mirrors the engine's DOUBLE arithmetic
    # bit-for-bit (abs(cum - t * (tot / nb)), same operand order), and
    # the tie-break is a STRICT > on those doubles: rational ties can be
    # asymmetric by one ULP in float (hypothesis found [9,0,...,0,9]:
    # dev(t=1) and dev(t=6) equal as rationals, t=6 one ULP larger as
    # doubles), and the engine + its oracle both rank the raw doubles —
    # an epsilon tie-break here modeled a tolerance the engines don't
    # have. True bit-equal ties still break earliest in both.
    cnt = dict(buckets)
    lo, hi = min(hours), max(hours)
    xs = [cnt.get(h, 0) for h in range(lo, hi + 1)]
    nb = len(xs)
    mu = sum(xs) / nb
    best = None
    cum = 0
    for t, x in enumerate(xs, start=1):
        cum += x
        dev = abs(cum - t * mu)
        if best is None or dev > best[0]:
            best = (dev, t, cum)
    dev, t, cum = best
    assert g.n_buckets == nb
    want_bucket = int((base + dt.timedelta(hours=lo + t - 1)).timestamp())
    want_bucket -= want_bucket % 3600
    assert g.cp_bucket == want_bucket
    assert abs(g.cusum_stat - round(dev, 6)) < 1e-9
    assert abs(g.mean_before - round(cum / t, 6)) < 1e-9
    if nb > t:
        assert abs(g.mean_after - round((sum(xs) - cum) / (nb - t), 6)) < 1e-9
    else:
        assert g.mean_after is None


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=4,
    ),
    frame_samples=st.integers(min_value=1, max_value=8),
    thr=st.integers(min_value=0, max_value=5_000_000),
)
@settings(max_examples=10, deadline=None)
def test_vad_spans_matches_python_model(spark_prop, docs, frame_samples, thr):
    """operators/multimodal.py::vad_spans over ARBITRARY PCM16 payloads
    must equal a pure-python replay of the whole chain: real WAV encode
    -> real decode -> fixed framing with true-length tail -> the
    integer cross-multiplied voiced test (frame_energy >= thr * n,
    ties INCLUSIVE, n > 0 — a zero-length frame is never voiced, so an
    empty payload yields ZERO spans; r15 ADVICE) -> island merge ->
    per-span exact integer stats. Covers empty payloads, all-quiet,
    all-voiced, single-sample frames, and thr = 0 (every non-empty
    frame voiced)."""
    from mysql2psql_spark.operators.multimodal import encode_wav_pcm16, vad_spans

    rows = [(i, bytearray(encode_wav_pcm16(s))) for i, s in enumerate(docs)]
    df = spark_prop.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        (r.doc_id, r.span_idx): (
            r.start_frame, r.end_frame, r.n_frames, r.span_energy
        )
        for r in vad_spans(
            df, frame_samples=frame_samples, energy_per_sample=thr
        ).collect()
    }
    want = {}
    for i, s in enumerate(docs):
        frames = []
        # the decoder emits one zero-length stream for an empty payload;
        # the framer still iterates once (range(0, max(len,1), fs)) and
        # emits a single empty frame of energy 0 at true length 0 —
        # which the voiced test must EXCLUDE (0 >= thr*0 holds, but a
        # zero-length frame carries no voice)
        for j in range(0, max(len(s), 1), frame_samples):
            fr = s[j : j + frame_samples]
            frames.append((j // frame_samples, len(fr), sum(x * x for x in fr)))
        voiced = [(idx, e) for idx, n, e in frames if n > 0 and e >= thr * n]
        spans = []
        for k, (idx, e) in enumerate(voiced):
            if spans and idx - 1 == spans[-1][1]:
                st_, en, nf, se = spans.pop()
                spans.append((st_, idx, nf + 1, se + e))
            else:
                spans.append((idx, idx, 1, e))
        for k, (st_, en, nf, se) in enumerate(
            sorted(spans), start=1
        ):
            want[(i, k)] = (st_, en, nf, se)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-8, max_value=8).map(lambda v: v / 8.0),
                min_size=4,
                max_size=4,
            ).filter(lambda v: any(x != 0 for x in v)),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=3,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10, deadline=None)
def test_hard_negatives_matches_python_model(spark_prop, rows, k):
    """operators/embedding.py::hard_negatives over ARBITRARY small
    corpora must equal a pure-python model of the whole chain: rounded-
    cosine IVF assignment (ties -> lowest seed id), exact micro-grid
    quantization (components on the 1/8 grid are binary-exact, so
    round(x*1e6) never sits on a rounding tie), per-anchor different-
    label top-k by (d2, id), and the margin against the nearest same-
    label cluster peer (None when the anchor has no positive peer)."""
    import math

    from mysql2psql_spark.operators.embedding import collect_seeds, hard_negatives

    nc = 2
    data = [(i, list(vec), lab) for i, (vec, lab) in enumerate(rows)]
    df = spark_prop.createDataFrame(
        data, "vec_id bigint, embedding array<double>, label int"
    )
    seeds = collect_seeds(df, nc, "vec_id", "embedding")

    def q(x):
        s = 1 if x >= 0 else -1
        return s * int(math.floor(abs(x) * 1e6 + 0.5))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    qv = {i: [q(x) for x in vec] for i, vec, _ in data}
    labs = {i: l for i, _, l in data}
    clus: dict = {}
    for i, vec, _ in data:
        best = max(range(len(seeds)), key=lambda c: (cos(vec, seeds[c][1]), -c))
        clus.setdefault(best, []).append(i)
    want = set()
    for members in clus.values():
        for a in members:
            dpos = min(
                (
                    sum((x - y) ** 2 for x, y in zip(qv[a], qv[u]))
                    for u in members
                    if u != a and labs[u] == labs[a]
                ),
                default=None,
            )
            negs = sorted(
                (sum((x - y) ** 2 for x, y in zip(qv[a], qv[u])), u)
                for u in members
                if labs[u] != labs[a]
            )[:k]
            for r, (dd, u) in enumerate(negs, 1):
                want.add(
                    (a, labs[a], u, labs[u], r, dd,
                     dd - dpos if dpos is not None else None)
                )
    got = {
        (r.vec_id, r.own_label, r.neg_id, r.neg_label, r.rank, r.d2, r.margin)
        for r in hard_negatives(df, seeds, k=k).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["p", "q", "r"]),  # label
            st.text(alphabet="abc ", min_size=0, max_size=24),
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=10, deadline=None)
def test_langid_matches_python_model(spark_prop, docs, k):
    """operators/text.py langid chain over ARBITRARY tiny corpora must
    equal a pure-python Cavnar-Trenkle replay: char trigrams (docs
    shorter than 3 chars contribute nothing), per-label and per-doc
    top-k profiles ranked by (count DESC, gram ASC), out-of-place
    distance with k-penalty for unmatched grams, argmin prediction with
    (distance, label ASC) tie-break. The 4-char alphabet forces heavy
    gram collisions and rank ties, so the total-order tie-breaks are
    exercised hard."""
    from mysql2psql_spark.operators.text import (
        char_ngram_table,
        langid_classify,
        langid_profiles,
    )

    rows = [(i, lab, t) for i, (lab, t) in enumerate(docs)]
    df = spark_prop.createDataFrame(rows, "doc_id bigint, lang string, text string")
    grams = char_ngram_table(df, extra_cols=("lang",))
    profiles = langid_profiles(grams, k=k)
    pred = langid_classify(grams.select("doc_id", "gram"), profiles, k=k)
    got = {r.doc_id: (r.lang_pred, r.oop_distance) for r in pred.collect()}

    # pure-python model
    from collections import Counter

    def top_ranked(counter):
        ordered = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return {g: i + 1 for i, (g, _) in enumerate(ordered)}

    lang_counts: dict[str, Counter] = {}
    doc_counts: dict[int, Counter] = {}
    for i, lab, t in rows:
        gs = [t[j : j + 3] for j in range(len(t) - 2)]
        lang_counts.setdefault(lab, Counter()).update(gs)
        doc_counts[i] = Counter(gs)
    lp = {lab: top_ranked(c) for lab, c in lang_counts.items() if c}
    want = {}
    for i, c in doc_counts.items():
        if not c:
            continue  # no grams -> no prediction (absent row)
        dp = top_ranked(c)
        best = None
        for lab in sorted(lp):
            dist = sum(
                abs(r - lp[lab][g]) if g in lp[lab] else k
                for g, r in dp.items()
            )
            if best is None or dist < best[1]:
                best = (lab, dist)
        want[i] = best
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),          # key
            st.integers(min_value=0, max_value=6),  # value on a small grid (ties)
            st.integers(min_value=0, max_value=100),  # et
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_ks_two_sample_matches_python_model(spark_prop, rows):
    """operators/drift.py::ks_two_sample over ARBITRARY tie-heavy
    streams must equal a pure-python ECDF replay: midpoint period split
    (et*2 <= mn+mx), per-(key, value) counts, cumulative sums in value
    order, max |cum_a*n_b - cum_b*n_a| with the argmax at the SMALLEST
    value on ties. The 7-value grid forces heavy duplicate values and
    frequent diff ties, exercising both tie-breaks."""
    from mysql2psql_spark.operators.drift import ks_two_sample

    df = spark_prop.createDataFrame(
        [(k, float(v), e) for k, v, e in rows],
        "event_type string, value double, et bigint",
    )
    got = {
        r.event_type: (r.n_a, r.n_b, r.n_values, r.ks_num, r.ks_at_value)
        for r in ks_two_sample(df).collect()
    }

    ets = [e for _, _, e in rows]
    mid2 = min(ets) + max(ets)
    per_key: dict[str, dict[float, list[int]]] = {}
    for k, v, e in rows:
        c = per_key.setdefault(k, {}).setdefault(float(v), [0, 0])
        c[0 if e * 2 <= mid2 else 1] += 1
    want = {}
    for k, vals in per_key.items():
        n_a = sum(c[0] for c in vals.values())
        n_b = sum(c[1] for c in vals.values())
        cum_a = cum_b = 0
        best = None
        for v in sorted(vals):
            cum_a += vals[v][0]
            cum_b += vals[v][1]
            diff = abs(cum_a * n_b - cum_b * n_a)
            if best is None or diff > best[0]:
                best = (diff, v)
        want[k] = (n_a, n_b, len(vals), best[0], best[1])
    assert got == want


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", "cc"]),
            st.integers(min_value=1, max_value=50),  # token count
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None)
def test_lang_sampling_weights_match_python_model(spark_prop, docs):
    """The alpha=0.5 weight pipeline over ARBITRARY corpora must equal
    a pure-python replay: per-language token totals, HALF_UP-rounded
    micro-quantized sqrt (Decimal models Spark's round), integer
    normalization totals. Texts are built with exactly the drawn token
    counts so the whitespace tokenizer is exercised end to end."""
    from mysql2psql_spark.queries.text_q import text_lang_sampling_weights

    import math
    import os
    import tempfile
    from decimal import ROUND_HALF_UP, Decimal

    rows = [
        (i, lab, " ".join(f"t{j}" for j in range(n)))
        for i, (lab, n) in enumerate(docs)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark_prop.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.lang: (r.n_docs, r.n_tokens, r.total_tokens,
                     r.sqrt_tokens_micro, r.weight_denom)
            for r in text_lang_sampling_weights(spark_prop, td).collect()
        }

    agg: dict[str, list[int]] = {}
    for _, lab, text in rows:
        c = agg.setdefault(lab, [0, 0])
        c[0] += 1
        c[1] += len(text.split(" "))
    total = sum(v[1] for v in agg.values())
    q = {
        lab: int(
            Decimal(math.sqrt(v[1]) * 1e6).quantize(Decimal(1), ROUND_HALF_UP)
        )
        for lab, v in agg.items()
    }
    denom = sum(q.values())
    want = {
        lab: (v[0], v[1], total, q[lab], denom) for lab, v in agg.items()
    }
    assert got == want


@given(
    catalog=st.dictionaries(
        st.sampled_from(["t1", "t2", "tbl"]),
        st.lists(
            st.text(alphabet="abcdefgh_", min_size=1, max_size=12).filter(
                lambda n: not n.endswith("_etl_ts") and not n.startswith("r_")
            ),
            min_size=1,
            max_size=8,
            unique=True,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=10, deadline=None)
def test_schema_evolution_differ_matches_python_model(spark_prop, catalog):
    """The m8 differ over ARBITRARY catalogs must equal a pure-python
    replay of the whole chain: drop len%7==3, rename len%5==2 -> r_,
    reindex positions, append <table>_etl_ts timestamp, name-keyed full
    outer diff, added/dropped/moved classification, exact DDL strings
    (typed ADD, idempotent DROP IF EXISTS). Arbitrary name lengths
    exercise rule collisions the fixture never hits (e.g. a name both
    renamed AND colliding with an existing one is excluded by the
    unique filter, but drop-vs-rename interplay is fully covered)."""
    from mysql2psql_spark.queries.migration_q import schema_evolution_plan_from

    rows = [
        (t, c, i + 1, "varchar")
        for t, cols in sorted(catalog.items())
        for i, c in enumerate(cols)
    ]
    v1 = spark_prop.createDataFrame(
        rows, "table_name string, column_name string, pos int, pg_type string"
    )
    got = {
        (r.table_name, r.column_name, r.change_type): (
            r.pos_v1, r.pos_v2, r.ddl
        )
        for r in schema_evolution_plan_from(v1).collect()
    }

    want = {}
    for t, cols in catalog.items():
        v1_pos = {c: i + 1 for i, c in enumerate(cols)}
        kept = [c for c in cols if len(c) % 7 != 3]
        v2 = [("r_" + c) if len(c) % 5 == 2 else c for c in kept]
        v2_pos = {c: i + 1 for i, c in enumerate(v2)}
        v2_pos[f"{t}_etl_ts"] = len(v2) + 1
        v2_type = {f"{t}_etl_ts": "timestamp"}
        for c in v2:
            v2_type[c] = "varchar"
        for c, p in v1_pos.items():
            if c not in v2_pos:
                want[(t, c, "dropped")] = (
                    p, None,
                    f'ALTER TABLE "{t}" DROP COLUMN IF EXISTS "{c}";',
                )
            elif v2_pos[c] != p:
                want[(t, c, "moved")] = (p, v2_pos[c], None)
        for c, p in v2_pos.items():
            if c not in v1_pos:
                want[(t, c, "added")] = (
                    None, p,
                    f'ALTER TABLE "{t}" ADD COLUMN "{c}" {v2_type[c]};',
                )
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abtheing", min_size=1, max_size=10),
        min_size=1,
        max_size=12,
    ),
)
@settings(max_examples=15, deadline=None)
def test_bpe_fold_matches_python_greedy(spark_prop, words):
    """The Catalyst BPE fold (queries/text_q.py::_bpe_fold_expr chain)
    over ARBITRARY words must equal the published greedy-leftmost-with-
    skip application — including a SELF-PAIR rule ('a','a'), the class
    where overlapping occurrences make naive string replacement diverge
    (runs like 'aaaaa' must yield floor(k/2) merged + k%2 singles), and
    second-order rules consuming first-order outputs. This pins the
    leftmost-merge lemma the DuckDB recursive-CTE oracle relies on."""
    from pyspark.sql import functions as F

    from mysql2psql_spark.queries.text_q import _bpe_fold_expr
    from tests.test_operators import _bpe_greedy_python

    merges = [("a", "a"), ("t", "h"), ("th", "e"), ("aa", "b"), ("i", "n"), ("in", "g")]
    toks_expr = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    for pa, pb in merges:
        toks_expr = _bpe_fold_expr(toks_expr, pa, pb)
    df = spark_prop.createDataFrame([(w,) for w in set(words)], "word string")
    got = {
        r["word"]: r["toks"]
        for r in df.select("word", F.expr(toks_expr).alias("toks")).collect()
    }
    for w in set(words):
        assert got[w] == _bpe_greedy_python(w, merges), w


@given(
    docs=st.lists(
        st.text(alphabet="abth ", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=10, deadline=None)
def test_bpe_learn_matches_python_learner(spark_prop, docs, tmp_path_factory):
    """The K-step driver-loop BPE learner over ARBITRARY tiny corpora
    must equal a pure-python replay: frequency-weighted pair counts over
    the evolving tokenization, argmax under (count DESC, left ASC,
    right ASC), greedy-with-skip application, stop on exhaustion. The
    4-char alphabet forces heavy pair-count ties and self-pair runs
    ('aa' chains), the classes where tie-breaks and the leftmost-merge
    lemma earn their keep."""
    from collections import Counter

    from mysql2psql_spark.queries.text_q import _BPE_LEARN_K, text_bpe_learn

    tmp = tmp_path_factory.mktemp("bpe_learn_prop")
    rows = [(i, "xx", t) for i, t in enumerate(docs)]
    spark_prop.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in text_bpe_learn(spark_prop, str(tmp))
        .orderBy("merge_rank")
        .collect()
    ]

    wf = Counter(w for _, _, t in rows for w in t.split(" ") if w)
    toks = {w: list(w) for w in wf}
    want = []
    for k in range(1, _BPE_LEARN_K + 1):
        cnt = Counter()
        for w, f in wf.items():
            t = toks[w]
            for i in range(len(t) - 1):
                cnt[(t[i], t[i + 1])] += f
        if not cnt:
            break
        (pa, pb), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((k, pa, pb, c))
        for w in toks:
            t, out, i = toks[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == pa and t[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    assert got == want
