"""Spans positional algebra as position-array joins (SURVEY.md §3.3).

Reference parity:
  * SpanNearQuery ordered/unordered — lucene/core/src/java/org/apache/
    lucene/search/spans/SpanNearQuery.java (≈L40): two (or more) terms
    within `slop` intervening positions, optionally in order.
  * SpanFirstQuery — SpanFirstQuery.java: term within the first `end`
    positions.
  * Sloppy phrase — SloppyPhraseMatcher.java (≈L50): phrase matches with
    edit distance <= slop; each match contributes sloppyWeight =
    1/(1 + matchLength) to the phrase freq. NOTE: Lucene's matcher emits
    non-overlapping greedy matches; we score ALL qualifying position
    pairs — a documented simplification kept identical in the SQL oracle
    (the two sides stay comparable; parity with Lucene's exact greedy
    semantics is out of scope for this operator tier).

All operators take a token table (doc_id, term, pos) — the exploded
positions view of the inverted index — and return DataFrames; everything
is equi-joins + range predicates (Catalyst: broadcast/SMJ + codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(tokens: DataFrame, term: str, alias: str) -> DataFrame:
    return tokens.filter(F.col("term") == term).select(
        "doc_id", F.col("pos").alias(alias)
    )


def span_near(
    tokens: DataFrame,
    term_a: str,
    term_b: str,
    slop: int,
    in_order: bool = True,
) -> DataFrame:
    """Docs (with match count) where term_a..term_b occur within `slop`
    intervening positions; ordered or unordered."""
    pa_ = _positions(tokens, term_a, "pa")
    pb = _positions(tokens, term_b, "pb")
    j = pa_.join(pb, "doc_id")
    if in_order:
        dist = F.col("pb") - F.col("pa") - 1
        cond = (F.col("pb") > F.col("pa")) & (dist <= slop)
    else:
        dist = F.abs(F.col("pb") - F.col("pa")) - 1
        cond = (F.col("pa") != F.col("pb")) & (dist <= slop)
    return (
        j.filter(cond)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


def span_first(tokens: DataFrame, term: str, end: int) -> DataFrame:
    """Docs where `term` occurs within the first `end` positions
    (positions are 0-based here; end is exclusive)."""
    return (
        tokens.filter((F.col("term") == term) & (F.col("pos") < end))
        .select("doc_id")
        .distinct()
    )


def span_or(tokens: DataFrame, terms: list[str]) -> DataFrame:
    """SpanOrQuery (SpanOrQuery.java ≈L40): union of sub-spans — here the
    merged position stream of several terms; returns per-doc span count
    (distinct matching positions)."""
    return (
        tokens.filter(F.col("term").isin(list(terms)))
        .select("doc_id", "pos")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )


def span_not(
    tokens: DataFrame, include: str, exclude: str, dist: int = 0
) -> DataFrame:
    """SpanNotQuery (SpanNotQuery.java ≈L40): spans of `include` that do
    NOT overlap (within `dist` positions) any span of `exclude`. Single-term
    spans: an include position survives unless an exclude position lies in
    [pos-dist, pos+dist]. Anti-join on the proximity predicate."""
    inc = _positions(tokens, include, "pa")
    exc = _positions(tokens, exclude, "pb")
    survivors = inc.join(
        exc,
        (inc["doc_id"] == exc["doc_id"])
        & (F.abs(F.col("pb") - F.col("pa")) <= dist),
        "left_anti",
    )
    return survivors.groupBy("doc_id").agg(F.count("*").alias("n_spans"))


def sloppy_phrase_freq(
    tokens: DataFrame, term_a: str, term_b: str, slop: int
) -> DataFrame:
    """Per-doc sloppy phrase frequency: sum of 1/(1+matchLength) over all
    position pairs with matchLength = max(0, |pb - pa - 1|) <= slop
    (see module docstring for the all-pairs simplification)."""
    pa_ = _positions(tokens, term_a, "pa")
    pb = _positions(tokens, term_b, "pb")
    j = pa_.join(pb, "doc_id")
    ml = F.abs(F.col("pb") - F.col("pa") - 1)
    return (
        j.filter((F.col("pa") != F.col("pb")) & (ml <= slop))
        .groupBy("doc_id")
        .agg(F.sum(1.0 / (1.0 + ml)).alias("sloppy_freq"))
    )
