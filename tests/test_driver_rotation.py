"""Unit tests for the driver-rotation ordering (queries/__init__.py).

The grading driver walks ``queries()`` in dict order under a 50-entry
budget, so this ordering IS the correctness-evidence scheduler: a wrong
tier assignment silently starves a failing query of re-verification
(exactly what happened to text_pack_sequences in round 5)."""

from __future__ import annotations

import mysql2psql_spark.queries as q


def _order(monkeypatch, last_any, last_green, names):
    monkeypatch.setattr(q, "_driver_history", lambda: (last_any, last_green))
    return list(q.driver_ordered({n: n for n in names}))


def test_red_outranks_never_checked_outranks_stale(monkeypatch):
    names = ["stale_old", "red", "fresh", "brand_new", "stale_older"]
    last_any = {"stale_old": 3, "red": 4, "fresh": 5, "stale_older": 2}
    last_green = {"stale_old": 3, "red": 2, "fresh": 5, "stale_older": 2}
    got = _order(monkeypatch, last_any, last_green, names)
    # tier 0: red (latest row newer than latest green); tier 1: never
    # checked; tier 2: greens, oldest green first
    assert got == ["red", "brand_new", "stale_older", "stale_old", "fresh"]


def test_ties_keep_registration_order(monkeypatch):
    names = ["b_new", "a_new", "z_green", "a_green"]
    last_any = {"z_green": 3, "a_green": 3}
    last_green = {"z_green": 3, "a_green": 3}
    got = _order(monkeypatch, last_any, last_green, names)
    assert got == ["b_new", "a_new", "z_green", "a_green"]


def test_never_green_but_checked_counts_as_red(monkeypatch):
    """A query with driver rows but no green row ever must sit in the
    red tier, not the never-checked tier (its failure is live)."""
    names = ["always_red", "brand_new"]
    got = _order(monkeypatch, {"always_red": 4}, {}, names)
    assert got == ["always_red", "brand_new"]


def test_empty_history_keeps_registration_order(monkeypatch):
    names = ["c", "a", "b"]
    assert _order(monkeypatch, {}, {}, names) == names


def test_queries_and_oracle_budgets_align():
    """The real registry: the first 50 names of queries() and
    oracle_sql() must be identical, or the driver would hash a query
    against the wrong oracle budget slot."""
    import __spark_entry__ as m

    assert list(m.queries())[:50] == list(m.oracle_sql())[:50]


def test_bench_headline_covers_entire_registry():
    """bench.py's HEADLINE list IS the full perf surface (round-6
    decision: no query may rot unmeasured) — every registered query must
    appear exactly once, and no headline name may be unregistered (a
    typo would silently skip the row: bench's loop ignores unknown
    names). Anchors must be headline members, or the anchor split-out
    would read 0 and pipeline_sec would absorb a known quadratic."""
    import importlib.util
    import os

    from mysql2psql_spark.queries import QUERIES

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    headline = bench.HEADLINE
    assert len(headline) == len(set(headline)), "duplicate headline entries"
    assert set(headline) == set(QUERIES), (
        sorted(set(QUERIES) - set(headline)),  # registered but unmeasured
        sorted(set(headline) - set(QUERIES)),  # measured but unregistered
    )
    # the anchors bench.py splits out of pipeline_sec (kept in sync by
    # hand; this pin fails if an anchor is renamed or dropped)
    for anchor in ("dedup_embedding_cosine", "sim_bitext_margin"):
        assert anchor in headline
