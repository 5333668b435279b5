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
