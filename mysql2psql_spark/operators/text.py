"""Text-analysis column builders (language-ID heuristic, quality scoring,
token counting). Built-in functions only — JVM-side, codegen'd, linear
per-document cost, no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, pinned English stopword list (shared with the SQL oracles; keep
# sorted and lowercase).
STOPWORDS = (
    "a",
    "an",
    "and",
    "in",
    "is",
    "it",
    "of",
    "on",
    "or",
    "the",
    "to",
)


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def en_stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    return n_stop.cast("double") / F.size(toks)


def quality_score(text: Column) -> Column:
    """Lexical diversity: unique/total token ratio."""
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the dedup unit for MinHash / n-gram
    Jaccard). Built-in array functions only; docs with < k tokens yield an
    empty set. F.get is 0-based and OOB-safe (no ANSI element_at throw)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    make = lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)])  # noqa: E731
    return F.array_distinct(F.transform(idx, make))
