"""Driver-contract entries: Spans positional algebra (operators/spans.py)
and the non-BM25 similarity family (score.py) — each with a DuckDB oracle.

Reference parity: SpanNearQuery/SpanFirstQuery (lucene/core/.../search/
spans/), SloppyPhraseMatcher, LMDirichletSimilarity (mu=2000),
ClassicSimilarity (TFIDFSimilarity) — SURVEY.md §3.3/§3.5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MU = 2000.0


def _tok(spark, sf_dir):
    from .entry_queries import _tok as tok

    return tok(spark, sf_dir)


def q_span_near_ordered(spark, sf_dir):
    """SpanNearQuery(in_order=true, slop=3) on ('big','order')."""
    from .operators.spans import span_near

    return span_near(_tok(spark, sf_dir), "big", "order", 3, True).orderBy(
        "doc_id"
    )


_SQL_POS = """
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)"""

SQL_SPAN_NEAR_ORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order')
SELECT pa.doc_id, count(*) AS n_matches
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pb.p > pa.p AND pb.p - pa.p - 1 <= 3
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_span_near_unordered(spark, sf_dir):
    """SpanNearQuery(in_order=false, slop=2)."""
    from .operators.spans import span_near

    return span_near(_tok(spark, sf_dir), "big", "order", 2, False).orderBy(
        "doc_id"
    )


SQL_SPAN_NEAR_UNORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order')
SELECT pa.doc_id, count(*) AS n_matches
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pa.p <> pb.p AND abs(pb.p - pa.p) - 1 <= 2
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_span_first(spark, sf_dir):
    """SpanFirstQuery: 'order' within the first 10 positions (1-based) —
    ~145 matching docs at sf0.01, so the oracle row is non-vacuous (the
    round-2 'dup'/end=11 pair matched on 0 rows, which proves nothing)."""
    from .operators.spans import span_first

    return span_first(_tok(spark, sf_dir), "order", 11).orderBy("doc_id")


SQL_SPAN_FIRST = f"""
WITH {_SQL_POS}
SELECT DISTINCT doc_id FROM tok
WHERE term = 'order' AND pos < 11 ORDER BY doc_id
"""


def q_sloppy_phrase(spark, sf_dir):
    """Lucene-greedy sloppy phrase freq ("big order"~2): the
    SloppyPhraseScorer.phraseFreq priority-queue walk — each position
    consumed once, one 1/(1+matchLength) emission per overtake. The
    oracle simulates the identical state machine with a recursive CTE."""
    from .operators.spans import sloppy_phrase_freq

    out = sloppy_phrase_freq(_tok(spark, sf_dir), "big", "order", 2)
    return out.select(
        "doc_id", F.round("sloppy_freq", 4).alias("sloppy_freq")
    ).orderBy("doc_id")


# Recursive-CTE simulation of Lucene's greedy matcher for a 2-term phrase:
# state = (index + current adjusted position per slot, which pointer is
# popped, running max `end_`, current matchLength, accumulated freq).
# One recursion step = one advancePP; ties pop slot a (offset order).
SQL_SLOPPY_PHRASE = f"""
WITH RECURSIVE {_SQL_POS},
al AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tok
       WHERE term = 'big' GROUP BY doc_id),
bl AS (SELECT doc_id, list(pos - 1 ORDER BY pos) AS ps FROM tok
       WHERE term = 'order' GROUP BY doc_id),
base AS (SELECT al.doc_id, al.ps AS ap, bl.ps AS bp
         FROM al JOIN bl USING (doc_id)),
sim AS (
  SELECT doc_id, ap, bp, 1 AS ia, 1 AS ib,
         ap[1] AS pa, bp[1] AS pb,
         greatest(ap[1], bp[1]) AS end_,
         CASE WHEN ap[1] <= bp[1] THEN 'a' ELSE 'b' END AS cur,
         greatest(ap[1], bp[1]) - least(ap[1], bp[1]) AS ml,
         CAST(0.0 AS DOUBLE) AS freq, FALSE AS done
  FROM base
  UNION ALL
  SELECT doc_id, ap, bp,
         CASE WHEN NOT exh AND cur = 'a' THEN ia + 1 ELSE ia END,
         CASE WHEN NOT exh AND cur = 'b' THEN ib + 1 ELSE ib END,
         CASE WHEN NOT exh AND cur = 'a' THEN np ELSE pa END,
         CASE WHEN NOT exh AND cur = 'b' THEN np ELSE pb END,
         CASE WHEN exh THEN end_ ELSE nend END,
         CASE WHEN exh THEN cur
              WHEN np > other THEN (CASE cur WHEN 'a' THEN 'b' ELSE 'a' END)
              ELSE cur END,
         CASE WHEN exh THEN ml
              WHEN np > other THEN nend - other
              ELSE least(ml, nend - np) END,
         CASE WHEN (exh OR np > other) AND ml <= 2
              THEN freq + 1.0 / (1.0 + ml) ELSE freq END,
         exh
  FROM (
    SELECT s.*,
           CASE WHEN cur = 'a' THEN ia + 1 > len(ap)
                ELSE ib + 1 > len(bp) END AS exh,
           CASE WHEN cur = 'a' THEN ap[ia + 1] ELSE bp[ib + 1] END AS np,
           greatest(end_, CASE WHEN cur = 'a' THEN ap[ia + 1]
                               ELSE bp[ib + 1] END) AS nend,
           CASE WHEN cur = 'a' THEN pb ELSE pa END AS other
    FROM sim s WHERE NOT done
  )
)
SELECT doc_id, ROUND(freq, 4) AS sloppy_freq
FROM sim WHERE done AND freq > 0 ORDER BY doc_id
"""


def q_lm_dirichlet(spark, sf_dir):
    """LMDirichletSimilarity (mu=2000) top-10 for 'dup' — raw doc lengths
    (the SQL-expressible path; quantized variant covered by oracle.py)."""
    from .entry_queries import _dl
    from .score import lm_dirichlet_score

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    sum_ttf = int(dl.agg(F.sum("dl")).first()[0])
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    ttf = tok.filter(F.col("term") == "dup").count()
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        lm_dirichlet_score(
            F.col("tf"), F.col("dl"), F.lit(float(ttf)), sum_ttf, MU
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_LM_DIRICHLET = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
sums AS (SELECT CAST(sum(dl) AS DOUBLE) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup' GROUP BY doc_id),
ttfv AS (SELECT CAST(count(*) AS DOUBLE) AS ttf FROM tok WHERE term = 'dup'),
s AS (
  SELECT tf.doc_id,
         greatest(
           ln(1 + tf.tf / ({MU} * (ttfv.ttf / sums.sum_ttf)))
             + ln({MU} / (dl.dl + {MU})),
           0.0) AS score
  FROM tf, dl, sums, ttfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_classic_tfidf(spark, sf_dir):
    """ClassicSimilarity (TF-IDF): sqrt(tf)·idf²/sqrt(dl), idf =
    ln((N+1)/(df+1))+1 — raw lengths."""
    from .entry_queries import _cstats, _dl

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, _ = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_val = tf.count()
    idf = F.lit(
        __import__("math").log((n + 1.0) / (df_val + 1.0)) + 1.0
    )
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        (F.sqrt("tf") * idf * idf / F.sqrt("dl")).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_CLASSIC_TFIDF = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup' GROUP BY doc_id),
dfv AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM tf),
s AS (
  SELECT tf.doc_id,
         sqrt(tf.tf) * pow(ln((n.n + 1) / (dfv.df + 1)) + 1, 2) / sqrt(dl.dl)
           AS score
  FROM tf, dl, n, dfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_lm_jm(spark, sf_dir):
    """LMJelinekMercerSimilarity (lambda=0.1) top-10 for 'dup' — raw
    lengths (score.py lm_jelinek_mercer_score)."""
    from .entry_queries import _dl
    from .score import lm_jelinek_mercer_score

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    sum_ttf = int(dl.agg(F.sum("dl")).first()[0])
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    ttf = tok.filter(F.col("term") == "dup").count()
    scored = tf.join(dl, "doc_id").select(
        "doc_id",
        lm_jelinek_mercer_score(
            F.col("tf"), F.col("dl"), F.lit(float(ttf)), sum_ttf, 0.1
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_LM_JM = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
sums AS (SELECT CAST(sum(dl) AS DOUBLE) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup' GROUP BY doc_id),
ttfv AS (SELECT CAST(count(*) AS DOUBLE) AS ttf FROM tok WHERE term = 'dup'),
s AS (
  SELECT tf.doc_id,
         greatest(
           ln(1 + (0.9 * tf.tf / dl.dl) / (0.1 * (ttfv.ttf / sums.sum_ttf))),
           0.0) AS score
  FROM tf, dl, sums, ttfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_boolean_sim(spark, sf_dir):
    """BooleanSimilarity: score == query boost for every matching doc
    (ordered by doc_id; boost 2.5 on 'dup' AND-composed with constant
    semantics — counts prove the match set, score proves the constant)."""
    tok = _tok(spark, sf_dir)
    from .score import boolean_score

    m = tok.filter(F.col("term") == "dup").select("doc_id").distinct()
    return (
        m.withColumn("score", F.round(boolean_score(2.5), 4))
        .orderBy("doc_id")
        .limit(20)
    )


SQL_BOOLEAN_SIM = f"""
WITH {_SQL_POS}
SELECT doc_id, 2.5 AS score FROM (
  SELECT DISTINCT doc_id FROM tok WHERE term = 'dup') t
ORDER BY doc_id LIMIT 20
"""


def q_span_or(spark, sf_dir):
    """SpanOrQuery: union of the 'big'/'small' position streams."""
    from .operators.spans import span_or

    return span_or(_tok(spark, sf_dir), ["big", "small"]).orderBy("doc_id")


SQL_SPAN_OR = f"""
WITH {_SQL_POS}
SELECT doc_id, count(*) AS n_spans FROM (
  SELECT DISTINCT doc_id, pos FROM tok WHERE term IN ('big', 'small')) t
GROUP BY doc_id ORDER BY doc_id
"""


def q_span_not(spark, sf_dir):
    """SpanNotQuery: 'big' spans not adjacent (dist<=1) to any 'order'."""
    from .operators.spans import span_not

    return span_not(_tok(spark, sf_dir), "big", "order", 1).orderBy("doc_id")


SQL_SPAN_NOT = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order')
SELECT pa.doc_id, count(*) AS n_spans
FROM pa
WHERE NOT EXISTS (SELECT 1 FROM pb
                  WHERE pb.doc_id = pa.doc_id AND abs(pb.p - pa.p) <= 1)
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_intervals_ordered(spark, sf_dir):
    """Intervals.maxgaps(5, Intervals.ordered(big, order)) — MINIMAL
    ordered intervals per doc (Clarke & Cormack semantics: first b after
    each a, dropped when an inner a exists)."""
    from .operators.intervals import interval_counts, minimal_ordered

    iv = minimal_ordered(_tok(spark, sf_dir), "big", "order", max_gaps=5)
    return interval_counts(iv).orderBy("doc_id")


SQL_INTERVALS_ORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS lo FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order'),
firstb AS (SELECT pa.doc_id, pa.lo, min(pb.p) AS hi
           FROM pa JOIN pb ON pb.doc_id = pa.doc_id AND pb.p > pa.lo
           GROUP BY pa.doc_id, pa.lo),
m AS (SELECT doc_id, lo, hi,
             lead(lo) OVER (PARTITION BY doc_id ORDER BY lo) AS nxt
      FROM firstb)
SELECT doc_id, count(*) AS n_intervals FROM m
WHERE (nxt IS NULL OR nxt >= hi) AND hi - lo - 1 <= 5
GROUP BY doc_id ORDER BY doc_id
"""


def q_intervals_unordered(spark, sf_dir):
    """Intervals.maxgaps(3, Intervals.unordered(big, small)) — minimal
    unordered windows (strict-containment filter)."""
    from .operators.intervals import interval_counts, minimal_unordered

    iv = minimal_unordered(_tok(spark, sf_dir), "big", "small", max_gaps=3)
    return interval_counts(iv).orderBy("doc_id")


SQL_INTERVALS_UNORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'small'),
cand AS (SELECT DISTINCT pa.doc_id, least(pa.p, pb.p) AS lo,
                greatest(pa.p, pb.p) AS hi
         FROM pa JOIN pb ON pb.doc_id = pa.doc_id AND pa.p != pb.p),
m AS (SELECT c.doc_id, c.lo, c.hi FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM cand i
                        WHERE i.doc_id = c.doc_id
                          AND i.lo >= c.lo AND i.hi <= c.hi
                          AND (i.lo != c.lo OR i.hi != c.hi)))
SELECT doc_id, count(*) AS n_intervals FROM m
WHERE hi - lo - 1 <= 3 GROUP BY doc_id ORDER BY doc_id
"""


def _sim_entry(spark, sf_dir, score_fn, term="dup"):
    """Shared scaffold: tf/dl/df/N/avgdl for one term, scored by a
    similarity-family Column factory (raw lengths, SQL-expressible)."""
    from .entry_queries import _cstats, _dl

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, avgdl = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == term).groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_val = tf.count()
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        score_fn(
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.lit(float(df_val)),
            n,
            avgdl,
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


def q_dfr_inl2(spark, sf_dir):
    """DFRSimilarity I(n)L2 (SURVEY §3.5 DFR family)."""
    from .score import dfr_inl2_score

    return _sim_entry(spark, sf_dir, dfr_inl2_score)


_SQL_SIM_SCAFFOLD = f"""{_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (SELECT (SELECT count(*) FROM documents) AS n,
                  avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM tok
       WHERE term = 'dup' GROUP BY doc_id),
dfv AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM tf)"""

SQL_DFR_INL2 = f"""
WITH {_SQL_SIM_SCAFFOLD},
tfn AS (SELECT tf.doc_id, tf.tf * log2(1.0 + cstats.avgdl / dl.dl) AS v
        FROM tf, dl, cstats WHERE dl.doc_id = tf.doc_id),
s AS (
  SELECT tfn.doc_id,
         (1.0 / (tfn.v + 1.0)) * tfn.v
           * log2((cstats.n + 1.0) / (dfv.df + 0.5)) AS score
  FROM tfn, cstats, dfv
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_ib_ll(spark, sf_dir):
    """IBSimilarity LL/DF/H2 (SURVEY §3.5 IB family)."""
    from .score import ib_ll_score

    return _sim_entry(spark, sf_dir, ib_ll_score)


SQL_IB_LL = f"""
WITH {_SQL_SIM_SCAFFOLD},
s AS (
  SELECT tf.doc_id,
         ln((tf.tf * log2(1.0 + cstats.avgdl / dl.dl)
              + (dfv.df + 1.0) / (cstats.n + 1.0))
            / ((dfv.df + 1.0) / (cstats.n + 1.0))) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_dfi_chi2(spark, sf_dir):
    """DFISimilarity (chi-squared independence measure, SURVEY §3.5)."""
    from .entry_queries import _dl
    from .score import dfi_chi2_score

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    sum_ttf = int(dl.agg(F.sum("dl")).first()[0])
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    ttf = tok.filter(F.col("term") == "dup").count()
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        dfi_chi2_score(
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.lit(float(ttf)),
            sum_ttf,
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_DFI_CHI2 = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
sums AS (SELECT CAST(sum(dl) AS DOUBLE) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM tok
       WHERE term = 'dup' GROUP BY doc_id),
ttfv AS (SELECT CAST(count(*) AS DOUBLE) AS ttf FROM tok WHERE term = 'dup'),
s AS (
  SELECT tf.doc_id,
         CASE WHEN tf.tf > dl.dl * ttfv.ttf / sums.sum_ttf
              THEN log2((tf.tf - dl.dl * ttfv.ttf / sums.sum_ttf)
                        * (tf.tf - dl.dl * ttfv.ttf / sums.sum_ttf)
                        / (dl.dl * ttfv.ttf / sums.sum_ttf) + 1.0)
              ELSE 0.0 END AS score
  FROM tf, dl, sums, ttfv WHERE dl.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_axiomatic_f2exp(spark, sf_dir):
    """AxiomaticF2EXP (SURVEY §3.5 Axiomatic family; Fang & Zhai 2005)."""
    from .score import axiomatic_f2exp_score

    return _sim_entry(spark, sf_dir, axiomatic_f2exp_score)


SQL_AXIOMATIC_F2EXP = f"""
WITH {_SQL_SIM_SCAFFOLD},
s AS (
  SELECT tf.doc_id,
         pow(cstats.n / dfv.df, 0.35) * tf.tf
           / (tf.tf + 0.5 + 0.5 * dl.dl / cstats.avgdl) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_intervals_ordered_n3(spark, sf_dir):
    """N-ary Intervals.ordered(hash, merge, join): 3-slot greedy chain,
    minimal by last-start-per-end; per-doc interval counts."""
    from .operators.intervals import interval_counts, minimal_ordered_n

    iv = minimal_ordered_n(
        _tok(spark, sf_dir), ["hash", "merge", "join"], max_gaps=None
    )
    return interval_counts(iv).orderBy("doc_id")


SQL_INTERVALS_ORDERED_N3 = f"""
WITH {_SQL_POS},
a AS (SELECT doc_id, pos AS lo FROM tok WHERE term = 'hash'),
c2 AS (SELECT a.doc_id, a.lo, min(b.pos) AS p2
       FROM a JOIN tok b ON b.doc_id = a.doc_id AND b.term = 'merge'
                        AND b.pos > a.lo
       GROUP BY a.doc_id, a.lo),
c3 AS (SELECT c2.doc_id, c2.lo, min(c.pos) AS hi
       FROM c2 JOIN tok c ON c.doc_id = c2.doc_id AND c.term = 'join'
                         AND c.pos > c2.p2
       GROUP BY c2.doc_id, c2.lo),
m AS (SELECT doc_id, lo, hi,
             lead(hi) OVER (PARTITION BY doc_id ORDER BY lo) AS nh
      FROM c3)
SELECT doc_id, count(*) AS n_intervals FROM m
WHERE nh IS NULL OR nh > hi
GROUP BY doc_id ORDER BY doc_id
"""


def q_intervals_unordered_n3(spark, sf_dir):
    """N-ary Intervals.unordered({dup, vector, window}) via the
    plane-sweep (running per-term max, lo strictly increasing keeps
    minimal); per-doc counts with maxgaps=20."""
    from .operators.intervals import interval_counts, minimal_unordered_n

    iv = minimal_unordered_n(
        _tok(spark, sf_dir), ["dup", "vector", "window"], max_gaps=20
    )
    return interval_counts(iv).orderBy("doc_id")


SQL_INTERVALS_UNORDERED_N3 = f"""
WITH {_SQL_POS},
src AS (SELECT doc_id, pos, term FROM tok
        WHERE term IN ('dup', 'vector', 'window')),
sweep AS (
  SELECT doc_id, pos AS hi,
         max(CASE WHEN term = 'dup' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l1,
         max(CASE WHEN term = 'vector' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l2,
         max(CASE WHEN term = 'window' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l3
  FROM src),
cand AS (SELECT doc_id, least(l1, l2, l3) AS lo, hi
         FROM sweep
         WHERE l1 IS NOT NULL AND l2 IS NOT NULL AND l3 IS NOT NULL),
m AS (SELECT doc_id, lo, hi,
             lag(lo) OVER (PARTITION BY doc_id ORDER BY hi) AS pl
      FROM cand)
SELECT doc_id, count(*) AS n_intervals FROM m
WHERE (pl IS NULL OR pl < lo) AND hi - lo + 1 - 3 <= 20
GROUP BY doc_id ORDER BY doc_id
"""


def q_intervals_nested(spark, sf_dir):
    """Nested interval expression — Intervals.maxgaps(6, Intervals.ordered(
    term(big), Intervals.unordered(fast, slow))): the set-level algebra
    composing one combinator over another's output (Intervals.java sources
    nest arbitrarily). Counts minimal intervals per doc."""
    from .operators.intervals import (
        interval_counts,
        ordered_sets,
        term_intervals,
        unordered_sets,
    )

    t = _tok(spark, sf_dir)
    u = unordered_sets(term_intervals(t, "fast"), term_intervals(t, "slow"))
    iv = ordered_sets(term_intervals(t, "big"), u, max_gaps=6)
    return interval_counts(iv).orderBy("doc_id")


SQL_INTERVALS_NESTED = f"""
WITH {_SQL_POS},
pf AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'fast'),
ps AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'slow'),
ucand AS (SELECT DISTINCT pf.doc_id, least(pf.p, ps.p) AS lo,
                 greatest(pf.p, ps.p) AS hi
          FROM pf JOIN ps ON ps.doc_id = pf.doc_id AND pf.p != ps.p),
umin AS (SELECT c.doc_id, c.lo, c.hi FROM ucand c
         WHERE NOT EXISTS (SELECT 1 FROM ucand i
                           WHERE i.doc_id = c.doc_id
                             AND i.lo >= c.lo AND i.hi <= c.hi
                             AND (i.lo != c.lo OR i.hi != c.hi))),
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
firstu AS (SELECT pa.doc_id, pa.p AS lo, min(u.hi) AS hi
           FROM pa JOIN umin u ON u.doc_id = pa.doc_id AND u.lo > pa.p
           GROUP BY pa.doc_id, pa.p),
wg AS (SELECT f.doc_id, f.lo, f.hi, u.lo - f.lo - 1 AS gap
       FROM firstu f JOIN umin u ON u.doc_id = f.doc_id AND u.hi = f.hi),
omin AS (SELECT w.doc_id, w.lo, w.hi, w.gap FROM wg w
         WHERE NOT EXISTS (SELECT 1 FROM wg i
                           WHERE i.doc_id = w.doc_id
                             AND i.lo >= w.lo AND i.hi <= w.hi
                             AND (i.lo != w.lo OR i.hi != w.hi)))
SELECT doc_id, count(*) AS n_intervals FROM omin
WHERE gap <= 6 GROUP BY doc_id ORDER BY doc_id
"""


def _sim_entry_full(spark, sf_dir, score_fn, term="dup"):
    """Like _sim_entry, additionally binding the term's collection ttf —
    the DFR/IB matrices take (tf, dl, df, ttf; N, avgdl)."""
    from .entry_queries import _cstats, _dl

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, avgdl = _cstats(spark, sf_dir)
    matches = tok.filter(F.col("term") == term)
    tf = matches.groupBy("doc_id").agg(F.count("*").alias("tf"))
    df_val = tf.count()
    ttf_val = matches.count()
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        score_fn(
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.lit(float(df_val)),
            F.lit(float(ttf_val)),
            n,
            avgdl,
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


def q_dfr_gb1(spark, sf_dir):
    """DFR GB1 = BasicModelG x AfterEffectB x NormalizationH1 (full-matrix
    member; SURVEY §3.5 DFRSimilarity config space)."""
    from .score import dfr_score

    def fn(tf, dl, df, ttf, n, avgdl):
        return dfr_score(tf, dl, df, ttf, n, avgdl,
                         basic="g", after="b", norm="h1")

    return _sim_entry_full(spark, sf_dir, fn)


_SQL_SIM_TTF = f"""{_SQL_SIM_SCAFFOLD},
ttfv AS (SELECT CAST(count(*) AS DOUBLE) AS ttf FROM tok WHERE term = 'dup')"""

SQL_DFR_GB1 = f"""
WITH {_SQL_SIM_TTF},
tfn AS (SELECT tf.doc_id, tf.tf * cstats.avgdl / dl.dl AS v
        FROM tf, dl, cstats WHERE dl.doc_id = tf.doc_id),
s AS (
  SELECT tfn.doc_id,
         greatest(0.0,
           ((ttfv.ttf + 1.0) / (dfv.df * (tfn.v + 1.0)))
           * (log2(1.0 + ttfv.ttf / (cstats.n + ttfv.ttf))
              + tfn.v * log2((1.0 + ttfv.ttf / (cstats.n + ttfv.ttf))
                             / (ttfv.ttf / (cstats.n + ttfv.ttf))))) AS score
  FROM tfn, cstats, dfv, ttfv)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_dfr_pl2(spark, sf_dir):
    """DFR PL2 = BasicModelP x AfterEffectL x NormalizationH2 — the classic
    Terrier default member of the matrix (SURVEY §3.5)."""
    from .score import dfr_score

    def fn(tf, dl, df, ttf, n, avgdl):
        return dfr_score(tf, dl, df, ttf, n, avgdl,
                         basic="p", after="l", norm="h2")

    return _sim_entry_full(spark, sf_dir, fn)


SQL_DFR_PL2 = f"""
WITH {_SQL_SIM_TTF},
tfn AS (SELECT tf.doc_id, tf.tf * log2(1.0 + cstats.avgdl / dl.dl) AS v
        FROM tf, dl, cstats WHERE dl.doc_id = tf.doc_id),
s AS (
  SELECT tfn.doc_id,
         greatest(0.0,
           (1.0 / (tfn.v + 1.0))
           * (tfn.v * log2(tfn.v / (ttfv.ttf / cstats.n))
              + (ttfv.ttf / cstats.n + 1.0 / (12.0 * tfn.v) - tfn.v)
                * 1.4426950408889634
              + 0.5 * log2(2.0 * pi() * tfn.v))) AS score
  FROM tfn, cstats, ttfv)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_dfr_ineb2(spark, sf_dir):
    """DFR I(ne)B2 = BasicModelIne x AfterEffectB x NormalizationH2
    (expected-document-frequency member; SURVEY §3.5)."""
    from .score import dfr_score

    def fn(tf, dl, df, ttf, n, avgdl):
        return dfr_score(tf, dl, df, ttf, n, avgdl,
                         basic="ine", after="b", norm="h2")

    return _sim_entry_full(spark, sf_dir, fn)


SQL_DFR_INEB2 = f"""
WITH {_SQL_SIM_TTF},
tfn AS (SELECT tf.doc_id, tf.tf * log2(1.0 + cstats.avgdl / dl.dl) AS v
        FROM tf, dl, cstats WHERE dl.doc_id = tf.doc_id),
s AS (
  SELECT tfn.doc_id,
         greatest(0.0,
           ((ttfv.ttf + 1.0) / (dfv.df * (tfn.v + 1.0)))
           * tfn.v * log2((cstats.n + 1.0)
               / (cstats.n * (1.0 - pow((cstats.n - 1.0) / cstats.n,
                                        ttfv.ttf)) + 0.5))) AS score
  FROM tfn, cstats, dfv, ttfv)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_ib_spl(spark, sf_dir):
    """IB SPL/TTF/H2 = DistributionSPL x LambdaTTF x NormalizationH2
    (smoothed power law member of the IB matrix; SURVEY §3.5)."""
    from .score import ib_score

    def fn(tf, dl, df, ttf, n, avgdl):
        return ib_score(tf, dl, df, ttf, n, avgdl,
                        distribution="spl", lambda_model="ttf", norm="h2")

    return _sim_entry_full(spark, sf_dir, fn)


SQL_IB_SPL = f"""
WITH {_SQL_SIM_TTF},
tfn AS (SELECT tf.doc_id, tf.tf * log2(1.0 + cstats.avgdl / dl.dl) AS v
        FROM tf, dl, cstats WHERE dl.doc_id = tf.doc_id),
lamv AS (SELECT (ttfv.ttf + 1.0) / (cstats.n + 1.0) AS lam FROM ttfv, cstats),
s AS (
  SELECT tfn.doc_id,
         greatest(0.0,
           -ln((pow(lamv.lam, tfn.v / (tfn.v + 1.0)) - lamv.lam)
               / (1.0 - lamv.lam))) AS score
  FROM tfn, lamv)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_multi_sim(spark, sf_dir):
    """MultiSimilarity: CombSUM of BM25 + ClassicSimilarity for the same
    term match (lucene .../similarities/MultiSimilarity.java — evidence
    combination per Shaw & Fox 1994)."""
    from .score import bm25_score, classic_score, multi_similarity_score

    def fn(tf, dl, df, n, avgdl):
        return multi_similarity_score([
            bm25_score(tf, dl, df, n, avgdl),
            classic_score(tf, dl, df, n),
        ])

    return _sim_entry(spark, sf_dir, fn)


SQL_MULTI_SIM = f"""
WITH {_SQL_SIM_SCAFFOLD},
s AS (
  SELECT tf.doc_id,
         ln(1.0 + (cstats.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))
         + sqrt(tf.tf)
           * (ln((cstats.n + 1.0) / (dfv.df + 1.0)) + 1.0)
           * (ln((cstats.n + 1.0) / (dfv.df + 1.0)) + 1.0)
           / sqrt(dl.dl) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_per_field_sim(spark, sf_dir):
    """PerFieldSimilarityWrapper: text field scored by BM25, source field
    by BooleanSimilarity — a two-field SHOULD query where each clause's
    scorer is resolved per field and clause scores sum (the wrapper only
    changes which SimScorer a field binds)."""
    from .entry_queries import _cstats, _dl
    from .score import PerFieldSimilarity, bm25_score, boolean_score

    pfs = PerFieldSimilarity(
        default=bm25_score, per_field={"source": lambda **_: boolean_score()}
    )
    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, avgdl = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_val = tf.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    text_sim = pfs.get("text")
    source_sim = pfs.get("source")
    j = tf.join(dl, "doc_id").join(docs, "doc_id")
    scored = j.select(
        "doc_id",
        (
            text_sim(
                F.col("tf").cast("double"),
                F.col("dl").cast("double"),
                F.lit(float(df_val)),
                n,
                avgdl,
            )
            + F.when(F.col("source") == "web", source_sim()).otherwise(0.0)
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_PER_FIELD_SIM = f"""
WITH {_SQL_SIM_SCAFFOLD},
s AS (
  SELECT tf.doc_id,
         ln(1.0 + (cstats.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))
         + CASE WHEN d.source = 'web' THEN 1.0 ELSE 0.0 END AS score
  FROM tf, dl, cstats, dfv, documents d
  WHERE dl.doc_id = tf.doc_id AND d.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_SPANS: dict[str, tuple] = {
    "span_near_ordered": (q_span_near_ordered, SQL_SPAN_NEAR_ORDERED),
    "span_near_unordered": (q_span_near_unordered, SQL_SPAN_NEAR_UNORDERED),
    "span_first": (q_span_first, SQL_SPAN_FIRST),
    "span_or": (q_span_or, SQL_SPAN_OR),
    "span_not": (q_span_not, SQL_SPAN_NOT),
    "intervals_ordered": (q_intervals_ordered, SQL_INTERVALS_ORDERED),
    "intervals_ordered_n3": (q_intervals_ordered_n3, SQL_INTERVALS_ORDERED_N3),
    "intervals_unordered_n3": (
        q_intervals_unordered_n3,
        SQL_INTERVALS_UNORDERED_N3,
    ),
    "intervals_unordered": (q_intervals_unordered, SQL_INTERVALS_UNORDERED),
    "sloppy_phrase_freq": (q_sloppy_phrase, SQL_SLOPPY_PHRASE),
    "lm_dirichlet_topk": (q_lm_dirichlet, SQL_LM_DIRICHLET),
    "lm_jm_topk": (q_lm_jm, SQL_LM_JM),
    "boolean_sim": (q_boolean_sim, SQL_BOOLEAN_SIM),
    "classic_tfidf_topk": (q_classic_tfidf, SQL_CLASSIC_TFIDF),
    "dfr_inl2_topk": (q_dfr_inl2, SQL_DFR_INL2),
    "ib_ll_topk": (q_ib_ll, SQL_IB_LL),
    "dfi_chi2_topk": (q_dfi_chi2, SQL_DFI_CHI2),
    "axiomatic_f2exp_topk": (q_axiomatic_f2exp, SQL_AXIOMATIC_F2EXP),
    "intervals_nested": (q_intervals_nested, SQL_INTERVALS_NESTED),
    "dfr_gb1_topk": (q_dfr_gb1, SQL_DFR_GB1),
    "dfr_pl2_topk": (q_dfr_pl2, SQL_DFR_PL2),
    "dfr_ineb2_topk": (q_dfr_ineb2, SQL_DFR_INEB2),
    "ib_spl_topk": (q_ib_spl, SQL_IB_SPL),
    "multi_sim_topk": (q_multi_sim, SQL_MULTI_SIM),
    "per_field_sim_topk": (q_per_field_sim, SQL_PER_FIELD_SIM),
}
