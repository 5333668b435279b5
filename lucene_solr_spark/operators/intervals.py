"""Intervals family (lucene/queries/.../intervals/Intervals.java ≈L60,
IntervalIterator.java): MINIMAL-interval semantics (Clarke & Cormack
"shortest substring retrieval": an interval match is a window containing
the required terms that contains no smaller such window).

Two-term algebra over the positions table (doc_id, term, pos) — all
Catalyst joins + window functions, no UDF:

  * ordered(a, b, max_gaps)  — Intervals.maxgaps(g, Intervals.ordered(..))
  * unordered(a, b, max_gaps) — Intervals.maxgaps(g, Intervals.unordered(..))
  * containing / not_containing — interval filters over those sets

Minimality proofs used below (two distinct terms):
  ordered: the candidate for an a at position p is [p, q] with q = the
  FIRST b after p; it is minimal iff no other a lies in (p, q) — otherwise
  that inner a forms a contained interval ending at the same q.
  unordered: a candidate [lo, hi] (one a, one b, either order) is minimal
  iff no other candidate is strictly contained in it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pos(tokens: DataFrame, term: str, alias: str) -> DataFrame:
    return tokens.filter(F.col("term") == term).select(
        "doc_id", F.col("pos").alias(alias)
    )


def minimal_ordered(
    tokens: DataFrame, term_a: str, term_b: str, max_gaps: int | None = None
) -> DataFrame:
    """Minimal ordered intervals a..b -> (doc_id, lo, hi)."""
    pa = _pos(tokens, term_a, "lo")
    pb = _pos(tokens, term_b, "pb")
    first_b = (
        pa.join(pb, "doc_id")
        .filter(F.col("pb") > F.col("lo"))
        .groupBy("doc_id", "lo")
        .agg(F.min("pb").alias("hi"))
    )
    w = Window.partitionBy("doc_id").orderBy("lo")
    nxt = F.lead("lo").over(w)
    out = first_b.withColumn("_nxt", nxt).filter(
        F.col("_nxt").isNull() | (F.col("_nxt") >= F.col("hi"))
    ).drop("_nxt")
    if max_gaps is not None:
        out = out.filter(F.col("hi") - F.col("lo") - 1 <= max_gaps)
    return out


def minimal_unordered(
    tokens: DataFrame, term_a: str, term_b: str, max_gaps: int | None = None
) -> DataFrame:
    """Minimal unordered intervals {a, b} -> (doc_id, lo, hi)."""
    pa = _pos(tokens, term_a, "pa")
    pb = _pos(tokens, term_b, "pb")
    cand = (
        pa.join(pb, "doc_id")
        .filter(F.col("pa") != F.col("pb"))
        .select(
            "doc_id",
            F.least("pa", "pb").alias("lo"),
            F.greatest("pa", "pb").alias("hi"),
        )
        .distinct()
    )
    inner = cand.select(
        F.col("doc_id").alias("doc_id"),
        F.col("lo").alias("ilo"),
        F.col("hi").alias("ihi"),
    )
    # an interval dies if ANOTHER candidate is strictly contained in it
    contained = (
        (F.col("ilo") >= F.col("lo"))
        & (F.col("ihi") <= F.col("hi"))
        & ((F.col("ilo") != F.col("lo")) | (F.col("ihi") != F.col("hi")))
    )
    out = cand.join(
        inner, (cand["doc_id"] == inner["doc_id"]) & contained, "left_anti"
    )
    if max_gaps is not None:
        out = out.filter(F.col("hi") - F.col("lo") - 1 <= max_gaps)
    return out


def minimal_ordered_n(
    tokens: DataFrame, terms: list[str], max_gaps: int | None = None
) -> DataFrame:
    """N-ary minimal ordered intervals t1..tn -> (doc_id, lo, hi).

    Chain construction (the IntervalIterator ordered algorithm): for each
    occurrence of t1 at lo, greedily take the FIRST t2 after it, then the
    first t3 after that, ... giving end hi(lo); hi is monotone
    non-decreasing in lo, so [lo, hi(lo)] contains [lo', hi(lo')] (lo'>lo)
    iff hi(lo')==hi(lo) — minimal = keep lo iff the next start's end is
    strictly larger (the LAST start achieving each end). n-1 equi-joins +
    min-aggs, one window — no UDF. Terms must be distinct (documented;
    Lucene's repeated-term intervals need per-slot disjoint positions)."""
    assert len(terms) >= 2 and len(set(terms)) == len(terms)
    cur = _pos(tokens, terms[0], "lo").withColumn("_prev", F.col("lo"))
    for t in terms[1:]:
        p = _pos(tokens, t, "_p")
        cur = (
            cur.join(p, "doc_id")
            .filter(F.col("_p") > F.col("_prev"))
            .groupBy("doc_id", "lo")
            .agg(F.min("_p").alias("_prev"))
        )
    chained = cur.withColumnRenamed("_prev", "hi")
    w = Window.partitionBy("doc_id").orderBy("lo")
    out = chained.withColumn("_nh", F.lead("hi").over(w)).filter(
        F.col("_nh").isNull() | (F.col("_nh") > F.col("hi"))
    ).drop("_nh")
    if max_gaps is not None:
        out = out.filter(
            F.col("hi") - F.col("lo") + 1 - len(terms) <= max_gaps
        )
    return out


def minimal_unordered_n(
    tokens: DataFrame, terms: list[str], max_gaps: int | None = None
) -> DataFrame:
    """N-ary minimal unordered intervals {t1..tn} -> (doc_id, lo, hi).

    Plane-sweep over the merged position stream (the Clarke & Cormack
    shortest-substring construction): at each occurrence p of any query
    term, last_i(p) = the latest occurrence of t_i at or before p; when
    every last_i is defined, [min_i last_i, p] is the candidate window
    ending at p (p always equals max_i last_i since p's own term's last
    is p). lo(p) is monotone non-decreasing in p, so a candidate is
    minimal iff its lo strictly exceeds the previous candidate's lo.
    One running-max window per term + one lag — no joins at all."""
    assert len(terms) >= 2 and len(set(terms)) == len(terms)
    src = tokens.filter(F.col("term").isin(list(terms)))
    sweep = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(sweep).alias(f"_l{i}")
        for i, t in enumerate(terms)
    ]
    # NB: Spark's least() SKIPS nulls, so "least is not null" would pass
    # with missing terms — require every per-term running max explicitly
    all_defined = F.lit(True)
    for i in range(len(terms)):
        all_defined = all_defined & F.col(f"_l{i}").isNotNull()
    cand = (
        src.select("doc_id", F.col("pos").alias("hi"), *lasts)
        .filter(all_defined)
        .select(
            "doc_id",
            F.least(*[F.col(f"_l{i}") for i in range(len(terms))]).alias("lo"),
            "hi",
        )
    )
    w = Window.partitionBy("doc_id").orderBy("hi")
    out = cand.withColumn("_pl", F.lag("lo").over(w)).filter(
        F.col("_pl").isNull() | (F.col("_pl") < F.col("lo"))
    ).drop("_pl")
    if max_gaps is not None:
        out = out.filter(
            F.col("hi") - F.col("lo") + 1 - len(terms) <= max_gaps
        )
    return out


# ---------------------------------------------------------------------------
# Nestable interval-SET algebra (Intervals.java composes sources
# arbitrarily: ordered(a, unordered(b, c)), containing(ordered(..), x), ...).
# Every combinator below takes and returns an interval set
# (doc_id, lo, hi) — term_intervals lifts a term's positions into the
# algebra, so expressions nest to any depth. All combinators emit MINIMAL
# sets (no member contains another), matching IntervalIterator's guarantee;
# maxgaps filters AFTER minimalization, like Lucene's MAXGAPS wrapper
# filtering the intervals its source produces.
# ---------------------------------------------------------------------------


def term_intervals(tokens: DataFrame, term: str) -> DataFrame:
    """Intervals.term: each occurrence is the width-1 interval [pos, pos]."""
    return tokens.filter(F.col("term") == term).select(
        "doc_id", F.col("pos").alias("lo"), F.col("pos").alias("hi")
    )


def minimalize(intervals: DataFrame) -> DataFrame:
    """Reduce to the minimal set: drop any interval that (non-strictly)
    contains a DIFFERENT interval of the set.

    One window, no self-join: over distinct intervals ordered by
    (lo DESC, hi ASC), every interval contained in the current row
    precedes it, so the running min of hi over strictly-preceding rows
    is <= hi exactly when a contained interval exists."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("lo"), F.asc("hi"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        intervals.select("doc_id", "lo", "hi")
        .distinct()
        .withColumn("_minh", F.min("hi").over(w))
        .filter(F.col("_minh").isNull() | (F.col("_minh") > F.col("hi")))
        .drop("_minh")
    )


def ordered_sets(
    a: DataFrame, b: DataFrame, max_gaps: int | None = None
) -> DataFrame:
    """Intervals.ordered over two interval SETS: for each a-interval the
    earliest b-interval starting after it ends -> [a.lo, b.hi], then
    minimalized. maxgaps counts the gap BETWEEN the sub-intervals
    (b.lo - a.hi - 1), Lucene's ordered-maxgaps accounting.

    Inputs must be minimal sets (all producers here are), which makes hi
    unique per doc — the chosen b is recovered from its hi alone."""
    bb = b.select(
        "doc_id", F.col("lo").alias("_blo"), F.col("hi").alias("_bhi")
    )
    cand = (
        a.join(bb, "doc_id")
        .filter(F.col("_blo") > F.col("hi"))
        .groupBy("doc_id", "lo", "hi")
        .agg(
            F.min(F.struct(F.col("_bhi"), F.col("_blo"))).alias("_b")
        )
        .select(
            "doc_id",
            "lo",
            (F.col("_b._blo") - F.col("hi") - 1).alias("_gap"),
            F.col("_b._bhi").alias("hi2"),
        )
        .withColumnRenamed("hi2", "_newhi")
    )
    gaps = cand.select(
        "doc_id", "lo", F.col("_newhi").alias("hi"), "_gap"
    )
    out = minimalize(gaps).join(
        gaps.groupBy("doc_id", "lo", "hi").agg(F.min("_gap").alias("_gap")),
        ["doc_id", "lo", "hi"],
    )
    if max_gaps is not None:
        out = out.filter(F.col("_gap") <= max_gaps)
    return out.select("doc_id", "lo", "hi")


def unordered_sets(
    a: DataFrame, b: DataFrame, max_gaps: int | None = None
) -> DataFrame:
    """Intervals.unordered (no-overlaps form) over two interval SETS:
    disjoint pairs in either order -> [min lo, max hi], minimalized;
    maxgaps again counts the between-gap."""
    bb = b.select(
        "doc_id", F.col("lo").alias("_blo"), F.col("hi").alias("_bhi")
    )
    pairs = a.join(bb, "doc_id").filter(
        (F.col("_blo") > F.col("hi")) | (F.col("_bhi") < F.col("lo"))
    )
    cand = pairs.select(
        "doc_id",
        F.least("lo", "_blo").alias("nlo"),
        F.greatest("hi", "_bhi").alias("nhi"),
        F.when(
            F.col("_blo") > F.col("hi"), F.col("_blo") - F.col("hi") - 1
        )
        .otherwise(F.col("lo") - F.col("_bhi") - 1)
        .alias("_gap"),
    ).select(
        "doc_id",
        F.col("nlo").alias("lo"),
        F.col("nhi").alias("hi"),
        "_gap",
    )
    out = minimalize(cand).join(
        cand.groupBy("doc_id", "lo", "hi").agg(F.min("_gap").alias("_gap")),
        ["doc_id", "lo", "hi"],
    )
    if max_gaps is not None:
        out = out.filter(F.col("_gap") <= max_gaps)
    return out.select("doc_id", "lo", "hi")


def containing_sets(outer: DataFrame, inner: DataFrame) -> DataFrame:
    """Intervals.containing over SETS: outer intervals that contain at
    least one inner interval."""
    i = inner.select(
        "doc_id", F.col("lo").alias("_ilo"), F.col("hi").alias("_ihi")
    )
    cond = (F.col("_ilo") >= F.col("lo")) & (F.col("_ihi") <= F.col("hi"))
    return outer.join(
        i, (outer["doc_id"] == i["doc_id"]) & cond, "left_semi"
    )


def not_containing_sets(outer: DataFrame, inner: DataFrame) -> DataFrame:
    """Intervals.notContaining over SETS."""
    i = inner.select(
        "doc_id", F.col("lo").alias("_ilo"), F.col("hi").alias("_ihi")
    )
    cond = (F.col("_ilo") >= F.col("lo")) & (F.col("_ihi") <= F.col("hi"))
    return outer.join(
        i, (outer["doc_id"] == i["doc_id"]) & cond, "left_anti"
    )


def contained_by_sets(inner: DataFrame, outer: DataFrame) -> DataFrame:
    """Intervals.containedBy over SETS: inner intervals lying inside at
    least one outer interval."""
    o = outer.select(
        "doc_id", F.col("lo").alias("_olo"), F.col("hi").alias("_ohi")
    )
    cond = (F.col("lo") >= F.col("_olo")) & (F.col("hi") <= F.col("_ohi"))
    return inner.join(
        o, (inner["doc_id"] == o["doc_id"]) & cond, "left_semi"
    )


def not_contained_by_sets(inner: DataFrame, outer: DataFrame) -> DataFrame:
    """Intervals.notContainedBy over SETS."""
    o = outer.select(
        "doc_id", F.col("lo").alias("_olo"), F.col("hi").alias("_ohi")
    )
    cond = (F.col("lo") >= F.col("_olo")) & (F.col("hi") <= F.col("_ohi"))
    return inner.join(
        o, (inner["doc_id"] == o["doc_id"]) & cond, "left_anti"
    )


def interval_counts(intervals: DataFrame) -> DataFrame:
    """(doc_id, n_intervals) — the per-doc sloppy-freq analog."""
    return intervals.groupBy("doc_id").agg(
        F.count("*").alias("n_intervals")
    )


def containing(intervals: DataFrame, tokens: DataFrame, term: str) -> DataFrame:
    """Intervals.containing: keep intervals that contain an occurrence of
    `term` (position inside [lo, hi])."""
    p = _pos(tokens, term, "pc")
    hit = (
        intervals.join(p, "doc_id")
        .filter((F.col("pc") >= F.col("lo")) & (F.col("pc") <= F.col("hi")))
        .select("doc_id", "lo", "hi")
        .distinct()
    )
    return hit


def not_containing(
    intervals: DataFrame, tokens: DataFrame, term: str
) -> DataFrame:
    """Intervals.notContaining: drop intervals containing `term`."""
    p = _pos(tokens, term, "pc")
    bad = (
        intervals.join(p, "doc_id")
        .filter((F.col("pc") >= F.col("lo")) & (F.col("pc") <= F.col("hi")))
        .select("doc_id", "lo", "hi")
    )
    return intervals.join(bad, ["doc_id", "lo", "hi"], "left_anti")
