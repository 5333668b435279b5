"""Round-4 breadth entries: span containment algebra, WordBreak
spellchecker, BlendedInfix suggester, CommonGrams, PathHierarchy facets,
and two more TPC-H shapes through the DataFrame API.

Each entry pairs a Spark plan with a DuckDB SQL oracle under the same
hash-match discipline as entry_queries.py (identical column names, floats
rounded after ordering, doc_id tiebreaks).

Rows covered here (SURVEY.md §3 references):
  * SpanContainingQuery / SpanWithinQuery — the two remaining members of
    the spans set algebra (lucene/core/.../search/spans/
    SpanContainingQuery.java, SpanWithinQuery.java): big-encloses-little
    and little-inside-big.
  * WordBreakSpellChecker — suggestWordBreaks: split a run-together term
    into two dictionary words (lucene/suggest/.../spell/
    WordBreakSpellChecker.java).
  * BlendedInfixSuggester — POSITION_LINEAR blending of suggestion weight
    by earliest match position (lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java).
  * CommonGramsFilter — stopword-adjacent bigram emission
    (lucene/analysis/common/.../commongrams/CommonGramsFilter.java); the
    distributed form is a lead() window over the positions view, asserted
    token-stream-identical to analysis.common_grams in tests.
  * PathHierarchyTokenizer + hierarchical facet — ancestor-prefix
    emission (.../path/PathHierarchyTokenizer.java) feeding a drill-down
    facet count per path prefix.
  * TPC-H Q5/Q6 — the SQLHandler analytic tier (SURVEY §3.10): Q6 is the
    pushdown showcase (tight scan filter -> single agg, no shuffle of
    data columns), Q5 the join-order showcase (5-way join, every dim
    broadcast, one shuffle on the fact key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from .entry_queries import _docs, _tok

_SQL_POS = """
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)"""


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# SpanContainingQuery / SpanWithinQuery
# big = ordered near('big','order', slop=6); little = 'value'
# ---------------------------------------------------------------------------
def q_span_containing(spark, sf_dir):
    from .operators.spans import span_containing

    return span_containing(
        _tok(spark, sf_dir), ("big", "order", 6), "value"
    ).orderBy("doc_id")


SQL_SPAN_CONTAINING = f"""
WITH {_SQL_POS},
bigs AS (
  SELECT pa.doc_id, pa.pos AS s, pb.pos AS e
  FROM (SELECT doc_id, pos FROM tok WHERE term = 'big') pa
  JOIN (SELECT doc_id, pos FROM tok WHERE term = 'order') pb
    ON pa.doc_id = pb.doc_id
  WHERE pb.pos > pa.pos AND pb.pos - pa.pos - 1 <= 6
),
lit AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'value')
SELECT b.doc_id, count(*) AS n_spans
FROM bigs b
WHERE EXISTS (
  SELECT 1 FROM lit l
  WHERE l.doc_id = b.doc_id AND l.p >= b.s AND l.p <= b.e)
GROUP BY b.doc_id ORDER BY b.doc_id
"""


def q_span_within(spark, sf_dir):
    from .operators.spans import span_within

    return span_within(
        _tok(spark, sf_dir), ("big", "order", 6), "value"
    ).orderBy("doc_id")


SQL_SPAN_WITHIN = f"""
WITH {_SQL_POS},
bigs AS (
  SELECT pa.doc_id, pa.pos AS s, pb.pos AS e
  FROM (SELECT doc_id, pos FROM tok WHERE term = 'big') pa
  JOIN (SELECT doc_id, pos FROM tok WHERE term = 'order') pb
    ON pa.doc_id = pb.doc_id
  WHERE pb.pos > pa.pos AND pb.pos - pa.pos - 1 <= 6
),
lit AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'value')
SELECT l.doc_id, count(*) AS n_spans
FROM lit l
WHERE EXISTS (
  SELECT 1 FROM bigs b
  WHERE b.doc_id = l.doc_id AND l.p >= b.s AND l.p <= b.e)
GROUP BY l.doc_id ORDER BY l.doc_id
"""


# ---------------------------------------------------------------------------
# WordBreakSpellChecker.suggestWordBreaks on 'fastscan'
# ---------------------------------------------------------------------------
def q_word_break_suggest(spark, sf_dir):
    from .operators.search_features import word_break_suggest

    return word_break_suggest(
        _tok(spark, sf_dir), "fastscan", min_freq=1, min_break_length=2, k=10
    )


SQL_WORD_BREAK = f"""
WITH {_SQL_POS},
dic AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  GROUP BY term HAVING count(DISTINCT doc_id) >= 1
),
splits AS (
  SELECT i AS split_at,
         substring('fastscan', 1, i) AS lft,
         substring('fastscan', i + 1) AS rgt
  FROM generate_series(2, len('fastscan') - 2) AS t(i)
)
SELECT s.split_at, s.lft AS "left", s.rgt AS "right",
       dl.df + dr.df AS combined_df
FROM splits s
JOIN dic dl ON dl.term = s.lft
JOIN dic dr ON dr.term = s.rgt
ORDER BY combined_df DESC, s.split_at LIMIT 10
"""


# ---------------------------------------------------------------------------
# BlendedInfixSuggester POSITION_LINEAR on query token 'vector'
# ---------------------------------------------------------------------------
def q_suggest_blended_infix(spark, sf_dir):
    from .operators.search_features import suggest_blended_infix

    return suggest_blended_infix(_tok(spark, sf_dir), "vector", k=10)


SQL_BLENDED_INFIX = f"""
WITH {_SQL_POS},
per_doc AS (
  SELECT doc_id,
         min(CASE WHEN term = 'vector' THEN pos - 1 END) AS min_pos,
         count(*) AS weight
  FROM tok GROUP BY doc_id
)
SELECT doc_id, weight, CAST(min_pos AS INT) AS min_pos,
       round(weight * greatest(0.1, 1.0 - 0.10 * min_pos), 6) AS blended
FROM per_doc WHERE min_pos IS NOT NULL
ORDER BY blended DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# CommonGrams: distributed emission via lead() over the positions view.
# Common set {'a','the'}; returns per-gram corpus counts (top 20).
# ---------------------------------------------------------------------------
def q_common_grams_index(spark, sf_dir):
    from pyspark.sql import Window

    t = _tok(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("term").over(w)
    grams = (
        t.withColumn("nxt", nxt)
        .filter(
            F.col("nxt").isNotNull()
            & (F.col("term").isin("a", "the") | F.col("nxt").isin("a", "the"))
        )
        .select(F.concat_ws("_", "term", "nxt").alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


SQL_COMMON_GRAMS = f"""
WITH {_SQL_POS},
seq AS (
  SELECT doc_id, term, pos,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok
)
SELECT term || '_' || nxt AS gram, count(*) AS n
FROM seq
WHERE nxt IS NOT NULL AND (term IN ('a','the') OR nxt IN ('a','the'))
GROUP BY gram ORDER BY n DESC, gram LIMIT 20
"""


# ---------------------------------------------------------------------------
# PathHierarchyTokenizer + hierarchical drill-down facet. The path is the
# deterministic '/{lang}/{source}' derivation over documents; the Spark
# side emits ancestor prefixes generically for ANY depth (transform over
# a sequence — stays in codegen, no UDF); the oracle unions the two
# levels this derivation produces.
# ---------------------------------------------------------------------------
def q_path_hierarchy_facet(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("/"), "lang", F.lit("/"), "source").alias("path")
    )
    parts = F.split(F.col("path"), "/")  # leading '' element from the lead /
    prefixes = F.transform(
        F.sequence(F.lit(2), F.size(parts)),
        lambda i: F.concat(
            F.lit("/"), F.array_join(F.slice(parts, 2, i - 1), "/")
        ),
    )
    return (
        d.select(F.explode(prefixes).alias("path_prefix"))
        .groupBy("path_prefix")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("path_prefix"))
        .limit(30)
    )


SQL_PATH_HIERARCHY = """
WITH paths AS (
  SELECT '/' || lang AS p1, '/' || lang || '/' || source AS p2
  FROM documents
),
pref AS (
  SELECT p1 AS path_prefix FROM paths
  UNION ALL
  SELECT p2 FROM paths
)
SELECT path_prefix, count(*) AS n_docs
FROM pref GROUP BY path_prefix
ORDER BY n_docs DESC, path_prefix LIMIT 30
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 — forecast revenue change: the filter-pushdown showcase (scan
# with three pushed predicates -> one global agg; no wide exchange at
# all). Exact-cents discipline as Q1/Q3.
# ---------------------------------------------------------------------------
def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount") * 100
                ).cast("bigint")
            )
            / 100.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q6 = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 — local supplier volume: 5-way join where customer and
# supplier must share a nation. Every dimension side is broadcast
# (region -> nation -> customer/supplier are all small); the only wide
# exchange is lineitem x orders on the fact key — the plan that survives
# a 100x fact-table scale-up.
# ---------------------------------------------------------------------------
def q_tpch_q5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nr = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    j = (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy("n_name").agg(
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            / 100.0
        ).alias("revenue")
    )
    return g.orderBy(F.desc("revenue"), F.asc("n_name"))


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


REGISTRY_R4 = {
    "span_containing": (q_span_containing, SQL_SPAN_CONTAINING),
    "span_within": (q_span_within, SQL_SPAN_WITHIN),
    "word_break_suggest": (q_word_break_suggest, SQL_WORD_BREAK),
    "suggest_blended_infix": (q_suggest_blended_infix, SQL_BLENDED_INFIX),
    "common_grams_index": (q_common_grams_index, SQL_COMMON_GRAMS),
    "path_hierarchy_facet": (q_path_hierarchy_facet, SQL_PATH_HIERARCHY),
    "tpch_q6_forecast_revenue": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q5_local_supplier": (q_tpch_q5, SQL_TPCH_Q5),
}


def _register_tranche2():
    """Tranche-2 rows are defined below this dict in the file; resolve
    them lazily at import end (module bottom calls this)."""
    REGISTRY_R4.update(
        {
            "covering_query": (q_covering_query, SQL_COVERING),
            "quality_ndcg_mrr": (q_quality_metrics, SQL_QUALITY),
            "expression_sort": (q_expression_sort, SQL_EXPRESSION_SORT),
            "stream_euclidean_dist": (q_stream_euclidean,
                                      SQL_STREAM_EUCLIDEAN),
            "stream_manhattan_dist": (q_stream_manhattan,
                                      SQL_STREAM_MANHATTAN),
            "stream_ks_test": (q_stream_ks_test, SQL_STREAM_KS),
        }
    )


# ===========================================================================
# Tranche 2: CoveringQuery, search-quality metrics, expression compiler,
# distance evaluators, two-sample KS test.
# ===========================================================================


# ---------------------------------------------------------------------------
# CoveringQuery (lucene/sandbox/.../search/CoveringQuery.java ≈L40): match
# docs where the NUMBER of matching clauses >= a per-doc long value (a
# LongValuesSource, not a constant — the dynamic minimumNumberShouldMatch).
# Here: clauses are 4 term queries; min_match(doc) = (n_chars % 3) + 1.
# Count + filter in one agg; no per-clause scans (single pass over the
# postings of the clause set).
# ---------------------------------------------------------------------------
_COVERING_TERMS = ["join", "hash", "vector", "merge"]


def q_covering_query(spark, sf_dir):
    t = _tok(spark, sf_dir)
    d = _docs(spark, sf_dir).select(
        "doc_id", ((F.col("n_chars") % 3) + 1).alias("min_match")
    )
    matched = (
        t.filter(F.col("term").isin(_COVERING_TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_clauses"))
    )
    return (
        matched.join(d, "doc_id")
        .filter(F.col("n_clauses") >= F.col("min_match"))
        .select("doc_id", "n_clauses", "min_match")
        .orderBy("doc_id")
    )


SQL_COVERING = f"""
WITH {_SQL_POS},
matched AS (
  SELECT doc_id, count(DISTINCT term) AS n_clauses
  FROM tok WHERE term IN ('join','hash','vector','merge')
  GROUP BY doc_id
)
SELECT m.doc_id, m.n_clauses, (d.n_chars % 3) + 1 AS min_match
FROM matched m JOIN documents d USING (doc_id)
WHERE m.n_clauses >= (d.n_chars % 3) + 1
ORDER BY m.doc_id
"""


# ---------------------------------------------------------------------------
# Search-quality evaluation (lucene/benchmark quality package): P@k, MRR,
# nDCG@10 over deterministic runs + qrels derived from the corpus:
#   results(q) = top-10 docs by tf(q) desc, doc_id asc (rank 1..10)
#   qrels(q)   = docs with tf >= 2 grade 2, tf == 1 grade 1, but only
#                where doc_id % 3 != 0 (unjudged docs exist, as in TREC)
# for q in ('join', 'vector').
# ---------------------------------------------------------------------------
def q_quality_metrics(spark, sf_dir):
    from pyspark.sql import Window

    from .operators.quality import search_quality_metrics

    t = _tok(spark, sf_dir)
    tf = (
        t.filter(F.col("term").isin("join", "vector"))
        .groupBy(F.col("term").alias("query_id"), "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("doc_id"))
    results = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = (
        tf.filter(F.col("doc_id") % 3 != 0)
        .select(
            "query_id",
            "doc_id",
            F.when(F.col("tf") >= 2, 2.0).otherwise(1.0).alias("grade"),
        )
    )
    return search_quality_metrics(results, qrels, k=10).orderBy("query_id")


SQL_QUALITY = f"""
WITH {_SQL_POS},
tf AS (
  SELECT term AS query_id, doc_id, count(*) AS tf
  FROM tok WHERE term IN ('join','vector') GROUP BY term, doc_id
),
results AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tf DESC, doc_id) AS rank
  FROM tf QUALIFY rank <= 10
),
qrels AS (
  SELECT query_id, doc_id,
         CASE WHEN tf >= 2 THEN 2.0 ELSE 1.0 END AS grade
  FROM tf WHERE doc_id % 3 != 0
),
joined AS (
  SELECT r.query_id, r.rank, coalesce(q.grade, 0.0) AS grade
  FROM results r LEFT JOIN qrels q USING (query_id, doc_id)
),
per_q AS (
  SELECT query_id,
         sum(CASE WHEN rank <= 10 AND grade > 0 THEN 1.0 ELSE 0.0 END)
           / 10.0 AS p_at_k,
         coalesce(1.0 / min(CASE WHEN grade > 0 THEN rank END), 0.0)
           AS mrr,
         sum(CASE WHEN rank <= 10
             THEN (pow(2.0, grade) - 1.0) / log2(rank + 1.0)
             ELSE 0.0 END) AS dcg
  FROM joined GROUP BY query_id
),
ideal AS (
  SELECT query_id,
         sum((pow(2.0, grade) - 1.0) / log2(irank + 1.0)) AS idcg
  FROM (
    SELECT query_id, grade,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY grade DESC, doc_id) AS DOUBLE)
             AS irank
    FROM qrels WHERE grade > 0 QUALIFY irank <= 10) t
  GROUP BY query_id
),
scored AS (
  SELECT p.query_id, round(p.p_at_k, 6) AS p_at_k, round(p.mrr, 6) AS mrr,
         round(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg ELSE 0.0 END, 6)
           AS ndcg_at_k
  FROM per_q p LEFT JOIN ideal i USING (query_id)
)
SELECT * FROM (
  SELECT query_id, p_at_k, mrr, ndcg_at_k FROM scored
  UNION ALL
  SELECT '__mean__', round(avg(p_at_k), 6), round(avg(mrr), 6),
         round(avg(ndcg_at_k), 6)
  FROM scored
) ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# Expression compiler (lucene/expressions JavascriptCompiler): sort
# documents by a compiled scoring expression — arithmetic, a ternary,
# and two function calls, all landing in one codegen'd Column.
# ---------------------------------------------------------------------------
_EXPR_SRC = (
    "sqrt(n_chars) + ln(n_chars + 1) * 0.5"
    " + (n_chars % 7 < 3 ? 2 : 0) - abs(doc_id % 5 - 2) * 0.25"
)


def q_expression_sort(spark, sf_dir):
    from .functions.expressions import compile_expression

    d = _docs(spark, sf_dir)
    score = compile_expression(
        _EXPR_SRC,
        {"n_chars": F.col("n_chars").cast("double"),
         "doc_id": F.col("doc_id").cast("double")},
    )
    return (
        d.select("doc_id", F.round(score, 6).alias("expr_score"))
        .orderBy(F.desc("expr_score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_EXPRESSION_SORT = """
SELECT doc_id,
       round(sqrt(n_chars) + ln(n_chars + 1) * 0.5
             + (CASE WHEN n_chars % 7 < 3 THEN 2 ELSE 0 END)
             - abs(doc_id % 5 - 2) * 0.25, 6) AS expr_score
FROM documents
ORDER BY expr_score DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# Distance evaluators (solr streaming math distance()): L2 / L1 top-10
# nearest to the vec_id=0 query vector over the embeddings table.
# ---------------------------------------------------------------------------
def _q_distance(spark, sf_dir, which: str):
    from .entry_pipeline import _emb, _query_vec
    from .operators.matheval import euclidean_dist_col, manhattan_dist_col

    qv, _ = _query_vec(spark, sf_dir, 0)
    lit = F.array(*[F.lit(float(x)) for x in qv])
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    emb = F.col("embedding").cast("array<double>")
    dist = (
        euclidean_dist_col(emb, lit)
        if which == "l2"
        else manhattan_dist_col(emb, lit)
    )
    return (
        e.select("vec_id", F.round(dist, 4).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(10)
    )


def q_stream_euclidean(spark, sf_dir):
    return _q_distance(spark, sf_dir, "l2")


def q_stream_manhattan(spark, sf_dir):
    return _q_distance(spark, sf_dir, "l1")


_SQL_DIST_BASE = """
WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0)
SELECT vec_id, ROUND({expr}, 4) AS dist
FROM v JOIN q USING (i) GROUP BY vec_id
ORDER BY dist, vec_id LIMIT 10
"""

SQL_STREAM_EUCLIDEAN = _SQL_DIST_BASE.format(
    expr="sqrt(sum((v.x - q.x) * (v.x - q.x)))"
)
SQL_STREAM_MANHATTAN = _SQL_DIST_BASE.format(expr="sum(abs(v.x - q.x))")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov D statistic: events.value, click vs
# purchase populations.
# ---------------------------------------------------------------------------
def q_stream_ks_test(spark, sf_dir):
    from .operators.matheval import ks_test_stream

    ev = _t(spark, sf_dir, "events")
    return ks_test_stream(ev, "event_type", "value", "click", "purchase")


SQL_STREAM_KS = """
WITH two AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IN ('click', 'purchase')
),
per_val AS (
  SELECT v,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
  FROM two GROUP BY v
),
cum AS (
  SELECT sum(c1) OVER (ORDER BY v) AS f1,
         sum(c2) OVER (ORDER BY v) AS f2
  FROM per_val
),
tot AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM cum)
SELECT round(max(abs(f1 / n1 - f2 / n2)), 6) AS d,
       CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
FROM cum, tot
"""


_register_tranche2()


# ===========================================================================
# Tranche 3: TPC-H breadth for the SQLHandler tier (SURVEY §3.10).
# The synthetic tables lack l_shipmode / l_commitdate / l_receiptdate /
# partsupp, so Q4 and Q19 are adapted to the available columns with the
# SAME plan shape (EXISTS semi-join; multi-branch OR over a dim join);
# Q7 / Q10 / Q13 / Q14 / Q18 are faithful to the spec's plan shape.
# Money discipline everywhere: sums accumulate exact cents
# (round(x*100) as BIGINT), divide by 100.0 only at the end — bit-stable
# across partitionings, which is what makes the hash-match reproducible
# on a 1000-executor cluster too.
# ===========================================================================


# ---------------------------------------------------------------------------
# Q4 (order-priority checking) — EXISTS semi-join shape. The spec's
# l_commitdate < l_receiptdate predicate isn't in the synthetic schema;
# the adapted inner predicate is "some lineitem shipped >= 90 days after
# the order date" (a late-shipment witness). The plan is identical:
# filtered orders LEFT SEMI JOIN lineitem on the order key plus a
# non-equi condition, then a tiny group-by on priority.
# ---------------------------------------------------------------------------
def q_tpch_q4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 90)),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 (volume shipping): revenue between two nations, by direction and
# ship year. Plan shape: ONE shuffle (lineitem⋈orders on the order key);
# supplier, customer, and both nation sides are broadcast dims; the
# two-direction pair predicate folds into the broadcast join filter.
# ---------------------------------------------------------------------------
def q_tpch_q7(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "n1_key"
    )
    n2 = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "n2_key"
    )
    j = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") <= "1997-12-31")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                )
                / 100.0
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q10 (returned-item reporting): top 20 customers by revenue lost to
# returns in a quarter. Fact⋈fact on the order key, customer + nation
# broadcast, TakeOrderedAndProject for the top-20 (never a global sort).
# ---------------------------------------------------------------------------
def q_tpch_q10(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            / 100.0
        ).alias("revenue")
    )
    return g.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13 (customer order distribution): LEFT OUTER join so zero-order
# customers count, then a second (tiny) agg over the per-customer counts.
# Two exchanges by necessity (custkey, then c_count) — the second input
# is |customers| rows, already map-side combinable.
# ---------------------------------------------------------------------------
def q_tpch_q13(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 (promotion effect): percentage of one month's revenue from PROMO
# parts. part is a broadcast dim; the two conditional sums share one
# scan + one agg (no second pass).
# ---------------------------------------------------------------------------
def q_tpch_q14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    g = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
        .alias("promo_cents"),
        F.sum(cents).alias("total_cents"),
    )
    return g.select(
        F.round(
            100.0 * F.col("promo_cents") / F.col("total_cents"), 6
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END)
           / sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)), 6)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# Q18 (large-volume customers): HAVING on a fact-side agg feeds a
# semi-filtered join back to orders + broadcast customer. The quantity
# agg and the final group share the l_orderkey partitioning (one
# exchange reused); top-100 via TakeOrderedAndProject.
# ---------------------------------------------------------------------------
def q_tpch_q18(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


REGISTRY_R4.update(
    {
        "tpch_q4_order_priority": (q_tpch_q4, SQL_TPCH_Q4),
        "tpch_q7_volume_shipping": (q_tpch_q7, SQL_TPCH_Q7),
        "tpch_q10_returned_items": (q_tpch_q10, SQL_TPCH_Q10),
        "tpch_q13_order_distribution": (q_tpch_q13, SQL_TPCH_Q13),
        "tpch_q14_promo_effect": (q_tpch_q14, SQL_TPCH_Q14),
        "tpch_q18_large_volume": (q_tpch_q18, SQL_TPCH_Q18),
    }
)


# ===========================================================================
# Tranche 4: math-evaluator long tail (SURVEY §3.9, solr/solrj/.../io/eval):
# moments/mode/covariance/movingMedian/expMovingAvg/polyfit/outliers.
# Series inputs are documents(n_chars) ordered by doc_id — deterministic.
# ===========================================================================


def q_stream_moments(spark, sf_dir):
    from .operators.matheval import central_moments_stream

    return central_moments_stream(_docs(spark, sf_dir), "n_chars")


SQL_STREAM_MOMENTS = """
WITH s AS (
  SELECT count(*) AS n, sum(n_chars) AS s1,
         sum(n_chars * n_chars) AS s2,
         sum(n_chars * n_chars * n_chars) AS s3,
         sum(n_chars * n_chars * n_chars * n_chars) AS s4
  FROM documents)
SELECT CAST(n AS BIGINT) AS n,
       round(s1 / CAST(n AS DOUBLE), 6) AS mean,
       round((s3/CAST(n AS DOUBLE) - 3*(s1/CAST(n AS DOUBLE))*(s2/CAST(n AS DOUBLE))
              + 2*pow(s1/CAST(n AS DOUBLE), 3))
             / pow(s2/CAST(n AS DOUBLE) - pow(s1/CAST(n AS DOUBLE), 2), 1.5), 6)
         AS skewness,
       round((s4/CAST(n AS DOUBLE) - 4*(s1/CAST(n AS DOUBLE))*(s3/CAST(n AS DOUBLE))
              + 6*pow(s1/CAST(n AS DOUBLE), 2)*(s2/CAST(n AS DOUBLE))
              - 3*pow(s1/CAST(n AS DOUBLE), 4))
             / pow(s2/CAST(n AS DOUBLE) - pow(s1/CAST(n AS DOUBLE), 2), 2) - 3.0, 6)
         AS kurtosis
FROM s
"""


def q_stream_means(spark, sf_dir):
    from .operators.matheval import means_stream

    return means_stream(_docs(spark, sf_dir), "n_chars")


SQL_STREAM_MEANS = """
SELECT round(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 6) AS geometric_mean,
       round(count(*) / sum(1.0 / n_chars), 6) AS harmonic_mean
FROM documents WHERE n_chars > 0
"""


def q_stream_mode(spark, sf_dir):
    from .operators.matheval import mode_stream

    return mode_stream(_docs(spark, sf_dir), "n_chars")


SQL_STREAM_MODE = """
SELECT n_chars, count(*) AS freq
FROM documents GROUP BY n_chars
ORDER BY freq DESC, n_chars LIMIT 1
"""


def q_stream_cov(spark, sf_dir):
    from .operators.matheval import covariance_exact_stream

    return covariance_exact_stream(_docs(spark, sf_dir), "doc_id", "n_chars")


SQL_STREAM_COV = """
WITH s AS (
  SELECT count(*) AS n, sum(doc_id) AS sx, sum(n_chars) AS sy,
         sum(doc_id * n_chars) AS sxy
  FROM documents)
SELECT round(sxy / CAST(n AS DOUBLE)
             - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)), 6)
         AS cov_pop
FROM s
"""


def q_stream_moving_median(spark, sf_dir):
    from .operators.matheval import moving_median_stream

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 120)
    return moving_median_stream(d, "doc_id", "n_chars", 7)


SQL_STREAM_MOVING_MEDIAN = """
WITH s AS (
  SELECT doc_id,
         median(n_chars) OVER (ORDER BY doc_id
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS moving_median,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id < 120)
SELECT doc_id, moving_median FROM s WHERE rn >= 7 ORDER BY doc_id
"""


def q_stream_ema(spark, sf_dir):
    from .operators.matheval import exp_moving_avg_stream

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return exp_moving_avg_stream(d, "doc_id", "n_chars", 0.3)


SQL_STREAM_EMA = """
WITH t AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS x,
         row_number() OVER (ORDER BY doc_id) AS i
  FROM documents WHERE doc_id < 200),
terms AS (
  SELECT doc_id, i,
         CASE WHEN i = 1 THEN x / 0.7 ELSE x * 0.3 / pow(0.7, i) END AS term
  FROM t)
SELECT doc_id,
       round(sum(term) OVER (ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * pow(0.7, i), 6) AS ema
FROM terms ORDER BY doc_id
"""


def q_stream_polyfit2(spark, sf_dir):
    from .operators.matheval import polyfit2_stream

    return polyfit2_stream(_docs(spark, sf_dir), "doc_id", "n_chars")


SQL_STREAM_POLYFIT2 = """
WITH t AS (
  SELECT row_number() OVER (ORDER BY doc_id) AS x,
         CAST(n_chars AS BIGINT) AS y
  FROM documents),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS s0, CAST(sum(x) AS DOUBLE) AS s1,
         CAST(sum(x*x) AS DOUBLE) AS s2, CAST(sum(x*x*x) AS DOUBLE) AS s3,
         CAST(sum(x*x*x*x) AS DOUBLE) AS s4,
         CAST(sum(y) AS DOUBLE) AS t0, CAST(sum(x*y) AS DOUBLE) AS t1,
         CAST(sum(x*x*y) AS DOUBLE) AS t2
  FROM t),
d AS (
  SELECT *, s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s2*s3) + s2*(s1*s3 - s2*s2)
              AS det
  FROM s)
SELECT
  round((t0*(s2*s4 - s3*s3) - s1*(t1*s4 - t2*s3) + s2*(t1*s3 - t2*s2)) / det, 6)
    AS c0,
  round((s0*(t1*s4 - t2*s3) - t0*(s1*s4 - s2*s3) + s2*(s1*t2 - s2*t1)) / det, 6)
    AS c1,
  round((s0*(s2*t2 - s3*t1) - s1*(s1*t2 - s2*t1) + t0*(s1*s3 - s2*s2)) / det, 6)
    AS c2
FROM d
"""


def q_stream_outliers(spark, sf_dir):
    # events.value is the long-tailed column (documents.n_chars is
    # near-uniform — zero Tukey outliers, a vacuous witness)
    from .operators.matheval import iqr_outliers_stream

    ev = _t(spark, sf_dir, "events")
    return iqr_outliers_stream(ev, "event_id", "value")


SQL_STREAM_OUTLIERS = """
WITH q AS (
  SELECT quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events),
f AS (SELECT q1 - 1.5*(q3 - q1) AS lo, q3 + 1.5*(q3 - q1) AS hi FROM q)
SELECT event_id, value
FROM events, f
WHERE value < lo OR value > hi
ORDER BY event_id
"""


REGISTRY_R4.update(
    {
        "stream_central_moments": (q_stream_moments, SQL_STREAM_MOMENTS),
        "stream_means_geo_harmonic": (q_stream_means, SQL_STREAM_MEANS),
        "stream_mode": (q_stream_mode, SQL_STREAM_MODE),
        "stream_cov_exact": (q_stream_cov, SQL_STREAM_COV),
        "stream_moving_median": (q_stream_moving_median,
                                 SQL_STREAM_MOVING_MEDIAN),
        "stream_exp_moving_avg": (q_stream_ema, SQL_STREAM_EMA),
        "stream_polyfit2": (q_stream_polyfit2, SQL_STREAM_POLYFIT2),
        "stream_outliers_iqr": (q_stream_outliers, SQL_STREAM_OUTLIERS),
    }
)


# ===========================================================================
# Tranche 5: FeatureField static-feature scoring, SpanMultiTermQueryWrapper,
# TermsComponent regex, PhraseWildcard (engine entry lives in
# entry_engine.py).
# ===========================================================================


def q_feature_field_saturation(spark, sf_dir):
    """FeatureField (lucene/core/.../document/FeatureField.java ≈L80)
    SaturationFunction as a SHOULD clause: score = BM25('dup') +
    1.5 * sat(n_chars, pivot=280). The feature read is a docmeta column
    scan joined AFTER the postings scorer — no postings-side work."""
    from .entry_queries import _bm25_expr, _cstats, _dl, _docs, _tok, _topk
    from .functions.valuesources import feature_saturation

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, avgdl = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_ = tf.count()
    base = tf.join(dl, "doc_id").select(
        "doc_id",
        _bm25_expr(F.col("tf"), F.col("dl"), F.lit(float(df_)), n, avgdl)
        .alias("_text"),
    )
    feat = _docs(spark, sf_dir).select(
        "doc_id", feature_saturation(F.col("n_chars"), 280.0, 1.5).alias("_f")
    )
    # feat is one row per doc — doc-keyed equi-join, not a broadcast
    out = base.join(feat, "doc_id").select(
        "doc_id", (F.col("_text") + F.col("_f")).alias("score")
    )
    return _topk(out)


SQL_FEATURE_SATURATION = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup'
       GROUP BY doc_id),
d1 AS (SELECT count(*) AS df FROM tf),
sc AS (
  SELECT tf.doc_id,
         ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))
         + 1.5 * docs.n_chars / (docs.n_chars + 280.0) AS score
  FROM tf, dl, cstats, d1, documents docs
  WHERE dl.doc_id = tf.doc_id AND docs.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_span_multiterm_near(spark, sf_dir):
    """SpanMultiTermQueryWrapper(prefix s*) as the second clause of an
    ordered near(slop=2) with 'merge'. The prefix expansion is capped at
    BooleanQuery#maxClauseCount exactly like the engine's _expand_terms
    path (search.py) — the collect is driver-bounded by construction."""
    from .operators.spans import span_multiterm_near
    from .search import MAX_CLAUSE_COUNT, TooManyClauses

    tok = _tok(spark, sf_dir)
    rows = (
        tok.filter(F.col("term").startswith("s"))
        .select("term")
        .distinct()
        .limit(MAX_CLAUSE_COUNT + 1)
        .collect()
    )
    if len(rows) > MAX_CLAUSE_COUNT:
        raise TooManyClauses(
            f"span multiterm expansion exceeds {MAX_CLAUSE_COUNT}"
        )
    s_terms = [r["term"] for r in rows]
    return span_multiterm_near(
        tok, "merge", s_terms, slop=2, in_order=True
    ).orderBy("doc_id")


SQL_SPAN_MULTITERM_NEAR = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'merge'),
pb AS (SELECT DISTINCT doc_id, pos AS pb FROM tok WHERE term LIKE 's%')
SELECT pa.doc_id, count(*) AS n_matches
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pb.pb > pa.pa AND pb.pb - pa.pa - 1 <= 2
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_terms_regex(spark, sf_dir):
    """TermsComponent terms.regex + terms.mincount + terms.limit
    (solr/core/.../handler/component/TermsComponent.java ≈L120): terms
    matching a regex, df >= mincount, by df desc then term, capped."""
    t = _tok(spark, sf_dir)
    dfs = (
        t.filter(F.col("term").rlike("^s.*"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 350)
    )
    return dfs.orderBy(F.desc("df"), F.asc("term")).limit(10)


SQL_TERMS_REGEX = f"""
WITH {_SQL_POS}
SELECT term, count(DISTINCT doc_id) AS df
FROM tok WHERE regexp_matches(term, '^s.*')
GROUP BY term HAVING count(DISTINCT doc_id) >= 350
ORDER BY df DESC, term LIMIT 10
"""


REGISTRY_R4.update(
    {
        "feature_field_saturation": (
            q_feature_field_saturation,
            SQL_FEATURE_SATURATION,
        ),
        "span_multiterm_near": (q_span_multiterm_near,
                                SQL_SPAN_MULTITERM_NEAR),
        "terms_regex": (q_terms_regex, SQL_TERMS_REGEX),
    }
)


# ===========================================================================
# Tranche 6: ReversedWildcardFilter leading-wildcard path; template-ngram
# boilerplate detection (web-pipeline cleanup).
# ===========================================================================


def q_leading_wildcard_reversed(spark, sf_dir):
    """Leading wildcard *ow through the REAL reversed-dictionary path
    (Searcher.leading_wildcard_terms — reversed-prefix seek, never a
    regex scan)."""
    from .entry_engine import _engine

    eng = _engine(spark, sf_dir)
    return (
        eng["searcher"]
        .leading_wildcard_terms("*ow")
        .orderBy("term")
        .select("term", F.col("df").cast("long").alias("df"))
    )


SQL_LEADING_WILDCARD = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
SELECT term, count(DISTINCT doc_id) AS df
FROM tok WHERE term LIKE '%ow'
GROUP BY term ORDER BY term
"""


def q_boilerplate_ngrams(spark, sf_dir):
    """Template-phrase (boilerplate) detection: bigrams present in
    >= 16%% of a source's documents."""
    from .pipeline.webprep import detect_template_ngrams

    return detect_template_ngrams(
        _docs(spark, sf_dir), n=2, min_frac=0.16, group_col="source"
    )


SQL_BOILERPLATE_NGRAMS = """
WITH toks AS (
  SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT source, doc_id, t, generate_subscripts(t, 1) AS i FROM toks),
sh AS (
  SELECT DISTINCT source, doc_id, t[i] || ' ' || t[i + 1] AS shingle
  FROM pos WHERE i < len(t)),
gs AS (SELECT source, count(*) AS n_docs_grp FROM documents GROUP BY source),
c AS (
  SELECT sh.source, sh.shingle, count(*) AS n_docs
  FROM sh GROUP BY sh.source, sh.shingle)
SELECT c.source, c.shingle, c.n_docs,
       round(c.n_docs / CAST(gs.n_docs_grp AS DOUBLE), 6) AS doc_frac
FROM c JOIN gs ON c.source = gs.source
WHERE c.n_docs / CAST(gs.n_docs_grp AS DOUBLE) >= 0.16
ORDER BY c.source, c.shingle
"""


REGISTRY_R4.update(
    {
        "leading_wildcard_reversed": (
            q_leading_wildcard_reversed,
            SQL_LEADING_WILDCARD,
        ),
        "boilerplate_template_ngrams": (
            q_boilerplate_ngrams,
            SQL_BOILERPLATE_NGRAMS,
        ),
    }
)


# ===========================================================================
# Tranche 7: hybrid RRF fusion (BM25 + vector cosine), temperature-based
# data mixing.
# ===========================================================================


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25('vector') top-50 fused with cosine top-50
    (query = embedding of vec_id 0) by Reciprocal Rank Fusion, k0=60.
    vec_id aligns with doc_id (same synthetic key space)."""
    from pyspark.sql import Window

    from .entry_queries import _term_scores
    from .operators.search_features import rrf_fuse
    from .pipeline.similarity import cosine_topk

    # top-50 FIRST via orderBy().limit() (TakeOrderedAndProject — per-
    # partition heaps, never a global sort), THEN rank the 50 survivors
    # with a window: at 10^12 docs the unpartitioned window only ever
    # sees k rows, not the full score table.
    lex = _term_scores(spark, sf_dir, "vector")
    wl = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex_r = (
        lex.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
        .withColumn("rank", F.row_number().over(wl))
        .select("doc_id", "rank")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    vec = cosine_topk(emb.filter(F.col("vec_id") != 0), qv, k=50)
    wv = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    vec_r = (
        vec.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(50)
        .withColumn("rank", F.row_number().over(wv))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex_r, vec_r], k0=60, k=10)


SQL_HYBRID_RRF = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'vector'
       GROUP BY doc_id),
d1 AS (SELECT count(*) AS df FROM tf),
lex AS (
  SELECT tf.doc_id,
         ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
  FROM tf, dl, cstats, d1 WHERE dl.doc_id = tf.doc_id),
lex_r AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM lex QUALIFY rank <= 50),
q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0),
dots AS (SELECT v.vec_id, sum(v.x * q.x) AS dot,
                sum(v.x * v.x) AS n2, sum(q.x * q.x) AS q2
         FROM v JOIN q USING (i) GROUP BY v.vec_id),
vec_r AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id) AS rank
  FROM dots QUALIFY rank <= 50),
u AS (SELECT * FROM lex_r UNION ALL SELECT * FROM vec_r),
fused AS (
  SELECT doc_id, sum(1.0 / (60.0 + rank)) AS rrf FROM u GROUP BY doc_id)
SELECT doc_id, round(rrf, 6) AS rrf
FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10) t
"""


def q_data_mix_temperature(spark, sf_dir):
    """Temperature-based (alpha=0.5) language mixing at target 250 rows:
    observed lang counts -> tempered keep rates -> deterministic
    hash-Bernoulli realization; reports per-lang rate + kept count."""
    from .pipeline.sampling import sample_mix, temperature_mix_rates

    d = _docs(spark, sf_dir)
    counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rates = temperature_mix_rates(counts, alpha=0.5, target_total=250)
    kept = sample_mix(d, rates, source_col="lang", default_rate=0.0)
    rate_col = F.lit(0.0)
    for lang, r in sorted(rates.items()):
        rate_col = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate_col)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .withColumn("rate", F.round(rate_col, 6))
        .orderBy("lang")
    )


SQL_DATA_MIX_TEMPERATURE = """
WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n, pow(n, 0.5) AS wt FROM cnt),
tot AS (SELECT sum(wt) AS sw FROM w),
rates AS (
  SELECT lang, n, least(1.0, (wt / sw) * 250.0 / n) AS rate FROM w, tot),
u AS (
  SELECT d.lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS unit
  FROM documents d)
SELECT u.lang, count(*) AS n_kept, round(max(rates.rate), 6) AS rate
FROM u JOIN rates ON u.lang = rates.lang
WHERE u.unit < rates.rate
GROUP BY u.lang ORDER BY u.lang
"""


REGISTRY_R4.update(
    {
        "hybrid_rrf_fusion": (q_hybrid_rrf, SQL_HYBRID_RRF),
        "data_mix_temperature": (
            q_data_mix_temperature,
            SQL_DATA_MIX_TEMPERATURE,
        ),
    }
)


# ===========================================================================
# Tranche 8: stream-stream interval join (last-touch click attribution).
# ===========================================================================


def q_click_attribution(spark, sf_dir):
    """Last-touch click attribution over events: clicks join the SAME
    user's views within the preceding 30 minutes; winner = latest view
    (imp_id tiebreak). The identical function runs as a watermarked
    stream-stream join (streaming/incremental.click_attribution;
    batch == streaming asserted in tests)."""
    from .streaming.incremental import click_attribution, last_touch

    ev = _t(spark, sf_dir, "events")
    imps = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    pairs = click_attribution(imps, clicks, "30 minutes")
    return last_touch(pairs).orderBy("click_id")


SQL_CLICK_ATTRIBUTION = """
WITH imps AS (
  SELECT user_id, event_id AS imp_id, ts AS imp_ts
  FROM events WHERE event_type = 'view'),
clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT c.click_id, i.imp_id, i.imp_ts
  FROM clicks c JOIN imps i
    ON c.user_id = i.user_id
   AND i.imp_ts <= c.click_ts
   AND i.imp_ts >= c.click_ts - INTERVAL 30 MINUTE),
win AS (
  SELECT click_id, imp_id, imp_ts,
         row_number() OVER (PARTITION BY click_id
                            ORDER BY imp_ts DESC, imp_id DESC) AS rk
  FROM pairs)
SELECT click_id, imp_id, imp_ts FROM win WHERE rk = 1 ORDER BY click_id
"""


REGISTRY_R4.update(
    {
        "stream_click_attribution": (
            q_click_attribution,
            SQL_CLICK_ATTRIBUTION,
        ),
    }
)


# ===========================================================================
# Tranche 9: zero-bucket timeseries gap fill; linear interpolation.
# ===========================================================================


def q_timeseries_gapfill(spark, sf_dir):
    """Hourly purchase counts for one day with EVERY bucket present
    (zero-filled gaps — facet.range / TimeSeriesStream semantics)."""
    from .operators.matheval import timeseries_gapfill

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return timeseries_gapfill(
        ev, "ts", "2024-01-05 00:00:00", "2024-01-06 00:00:00", "hour"
    )


SQL_TIMESERIES_GAPFILL = """
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                TIMESTAMP '2024-01-05 23:00:00',
                                INTERVAL 1 HOUR)) AS bucket_ts),
agg AS (
  SELECT date_trunc('hour', ts) AS bucket_ts, count(*) AS n
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
  GROUP BY 1)
SELECT CAST(epoch(spine.bucket_ts) AS BIGINT) AS bucket_epoch,
       coalesce(agg.n, 0) AS n
FROM spine LEFT JOIN agg ON spine.bucket_ts = agg.bucket_ts
ORDER BY bucket_epoch
"""


def q_stream_lerp(spark, sf_dir):
    """lerp over the daily purchase-count series, evaluated at three
    mid-day epochs (LerpEvaluator)."""
    from .operators.matheval import lerp_stream, timeseries_gapfill

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    series = timeseries_gapfill(
        ev, "ts", "2024-01-02 00:00:00", "2024-01-09 00:00:00", "day"
    )
    qs = spark.createDataFrame(
        [(1704326400.0,), (1704456000.0,), (1704585600.0,)], ["qx"]
    )
    return lerp_stream(series, qs, x="bucket_epoch", y="n")


SQL_STREAM_LERP = """
WITH agg AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS DOUBLE) AS x,
         CAST(count(*) AS DOUBLE) AS y
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-09'
  GROUP BY 1),
qs AS (SELECT unnest([1704326400.0, 1704456000.0, 1704585600.0]) AS qx),
br AS (
  SELECT qx,
         (SELECT max(x) FROM agg WHERE x <= qx) AS px,
         (SELECT min(x) FROM agg WHERE x >= qx) AS nx
  FROM qs)
SELECT br.qx,
       round(CASE WHEN nx = px THEN py.y
                  ELSE py.y + (ny.y - py.y) * (qx - px) / (nx - px) END, 6)
         AS lerp
FROM br
JOIN agg py ON py.x = br.px
JOIN agg ny ON ny.x = br.nx
ORDER BY qx
"""


REGISTRY_R4.update(
    {
        "timeseries_gapfill": (q_timeseries_gapfill, SQL_TIMESERIES_GAPFILL),
        "stream_lerp": (q_stream_lerp, SQL_STREAM_LERP),
    }
)


# ===========================================================================
# Tranche 10: JSON-facet per-bucket stat aggs + allBuckets slot.
# ===========================================================================


def q_json_facet_allbuckets(spark, sf_dir):
    """Per-event_type buckets with CountVals/Missing/Sum/Sumsq/Stddev
    slots and the allBuckets grand-total row; the metric treats
    value < 5 as missing (nullif-derived nullable metric)."""
    from .operators.facets import json_facet_stats_buckets

    ev = _t(spark, sf_dir, "events")
    metric = F.when(F.col("value") < 5, None).otherwise(F.col("value"))
    return json_facet_stats_buckets(ev, "event_type", metric)


SQL_JSON_FACET_ALLBUCKETS = """
WITH src AS (
  SELECT event_type,
         CASE WHEN value < 5 THEN NULL ELSE value END AS m
  FROM events),
b AS (
  SELECT event_type AS bucket,
         count(*) AS count,
         count(m) AS countvals,
         sum(CASE WHEN m IS NULL THEN 1 ELSE 0 END) AS missing,
         round(sum(m), 4) AS sum,
         round(sum(m * m), 4) AS sumsq,
         round(stddev_pop(m), 6) AS stddev
  FROM src GROUP BY event_type),
t AS (
  SELECT '__all__' AS bucket,
         count(*) AS count,
         count(m) AS countvals,
         sum(CASE WHEN m IS NULL THEN 1 ELSE 0 END) AS missing,
         round(sum(m), 4) AS sum,
         round(sum(m * m), 4) AS sumsq,
         round(stddev_pop(m), 6) AS stddev
  FROM src)
SELECT * FROM (SELECT * FROM b UNION ALL SELECT * FROM t)
ORDER BY (bucket = '__all__'), bucket
"""


REGISTRY_R4.update(
    {
        "json_facet_allbuckets": (
            q_json_facet_allbuckets,
            SQL_JSON_FACET_ALLBUCKETS,
        ),
    }
)


# ===========================================================================
# Tranche 11: features() — information-gain term selection.
# ===========================================================================


def q_stream_features_ig(spark, sf_dir):
    """Top-10 terms by information gain against the binary class
    lang == 'en' (FeaturesSelectionStream semantics)."""
    from .operators.classification import features_ig

    d = _docs(spark, sf_dir)
    classes = d.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("label")
    )
    return features_ig(_tok(spark, sf_dir), classes, k=10)


SQL_STREAM_FEATURES_IG = """
WITH cls AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(label) AS DOUBLE) AS n1 FROM cls),
tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
pt AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df,
         CAST(sum(label) AS DOUBLE) AS df1
  FROM tok JOIN cls USING (doc_id) GROUP BY term),
ig AS (
  SELECT term,
    (
      -- H(C)
      -(CASE WHEN n1/n > 0 THEN (n1/n)*ln(n1/n) ELSE 0 END
        + CASE WHEN n1/n < 1 THEN (1-n1/n)*ln(1-n1/n) ELSE 0 END)
      -- − P(t)·H(C|t)
      - (df/n) * (
        -(CASE WHEN df1/df > 0 THEN (df1/df)*ln(df1/df) ELSE 0 END
          + CASE WHEN df1/df < 1 THEN (1-df1/df)*ln(1-df1/df) ELSE 0 END))
      -- − P(¬t)·H(C|¬t)
      - CASE WHEN df < n THEN
          (1 - df/n) * (
            -(CASE WHEN (n1-df1)/(n-df) > 0
                THEN ((n1-df1)/(n-df))*ln((n1-df1)/(n-df)) ELSE 0 END
              + CASE WHEN (n1-df1)/(n-df) < 1
                THEN (1-(n1-df1)/(n-df))*ln(1-(n1-df1)/(n-df)) ELSE 0 END))
        ELSE 0 END
    ) AS ig_raw
  FROM pt, tot)
SELECT term, round(ig_raw, 6) AS ig
FROM ig ORDER BY ig_raw DESC, term LIMIT 10
"""


REGISTRY_R4.update(
    {
        "stream_features_ig": (q_stream_features_ig, SQL_STREAM_FEATURES_IG),
    }
)


# ===========================================================================
# Tranche 12: SweetSpotSimilarity.
# ===========================================================================


def q_sweetspot_topk(spark, sf_dir):
    """SweetSpotSimilarity top-10 for 'vector': length plateau [30, 45]
    (docs in the sweet spot take no length penalty), steepness 0.5,
    baselineTf defaults."""
    from .entry_queries import _cstats, _dl, _tok, _topk
    from .score import sweetspot_score

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, _ = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == "vector").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_ = float(tf.count())
    j = tf.join(dl, "doc_id")
    return _topk(
        j.select(
            "doc_id",
            sweetspot_score(
                F.col("tf"), F.col("dl"), F.lit(df_), n,
                ln_min=30, ln_max=45, steepness=0.5,
            ).alias("score"),
        )
    )


SQL_SWEETSPOT = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (SELECT (SELECT count(*) FROM documents) AS n FROM (SELECT 1)),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'vector'
       GROUP BY doc_id),
d1 AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM tf),
sc AS (
  SELECT tf.doc_id,
         CASE WHEN tf.tf <= 0.0 THEN 0.0
              ELSE sqrt(tf.tf + 0.0 - 0.0) END
         * pow(ln((cstats.n + 1.0) / (d1.df + 1.0)) + 1.0, 2)
         * (1.0 / sqrt(0.5 * (abs(dl.dl - 30.0) + abs(dl.dl - 45.0)
                              - 15.0) + 1.0)) AS score
  FROM tf, dl, cstats, d1 WHERE dl.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_R4.update(
    {
        "sweetspot_sim_topk": (q_sweetspot_topk, SQL_SWEETSPOT),
    }
)


# ===========================================================================
# Tranche 13: boilerplate REMOVAL (apply the detected templates).
# ===========================================================================


def q_boilerplate_removal(spark, sf_dir):
    """detect_template_ngrams -> remove_template_ngrams: strip every
    token position covered by a flagged per-source bigram, re-assemble
    the text. (Docs left with zero tokens would drop out; none do at
    this min_frac.)"""
    from .pipeline.webprep import (
        detect_template_ngrams,
        remove_template_ngrams,
    )

    d = _docs(spark, sf_dir)
    tmpl = detect_template_ngrams(d, n=2, min_frac=0.16, group_col="source")
    return remove_template_ngrams(d, tmpl, n=2, group_col="source")


SQL_BOILERPLATE_REMOVAL = """
WITH base AS (
  SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
toks0 AS (
  SELECT source, doc_id, t, generate_subscripts(t, 1) AS pos,
         len(t) AS n_orig
  FROM base),
toks AS (
  SELECT source, doc_id, t[pos] AS tok, pos, n_orig FROM toks0),
sh AS (
  SELECT source, doc_id, pos,
         tok || ' ' || lead(tok) OVER w AS shingle,
         lead(tok) OVER w IS NOT NULL AS full_sh
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
dsh AS (SELECT DISTINCT source, doc_id, shingle FROM sh WHERE full_sh),
gs AS (SELECT source, count(*) AS n_docs_grp FROM documents GROUP BY source),
flagged AS (
  SELECT d.source, d.shingle
  FROM (SELECT source, shingle, count(*) AS n_docs
        FROM dsh GROUP BY source, shingle) d
  JOIN gs ON d.source = gs.source
  WHERE d.n_docs / CAST(gs.n_docs_grp AS DOUBLE) >= 0.16),
hits AS (
  SELECT sh.doc_id, sh.pos FROM sh
  JOIN flagged ON sh.source = flagged.source
              AND sh.shingle = flagged.shingle
  WHERE sh.full_sh),
covered AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, pos FROM hits
    UNION ALL SELECT doc_id, pos + 1 FROM hits)),
kept AS (
  SELECT t.doc_id, t.tok, t.pos, t.n_orig
  FROM toks t LEFT JOIN covered c
    ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY pos) AS cleaned_text,
       CAST(max(n_orig) - count(*) AS BIGINT) AS n_removed
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


REGISTRY_R4.update(
    {
        "boilerplate_removal": (
            q_boilerplate_removal,
            SQL_BOILERPLATE_REMOVAL,
        ),
    }
)


# ===========================================================================
# Tranche 14: math-evaluator long tail III — freqTable, rank transform,
# normalizeSum, empiricalDistribution CDF.
# ===========================================================================


def q_stream_freq_table(spark, sf_dir):
    """FrequencyTableEvaluator over lineitem.l_linenumber (7 distinct
    values): count / pct / cumFreq / cumPct per value."""
    from .operators.matheval import freq_table_stream

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return freq_table_stream(li, "l_linenumber")


SQL_STREAM_FREQ_TABLE = """
WITH c AS (
  SELECT CAST(l_linenumber AS BIGINT) AS value, count(*) AS cnt
  FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c)
SELECT value, cnt,
       ROUND(cnt / tot, 6) AS pct,
       CAST(sum(cnt) OVER (ORDER BY value) AS BIGINT) AS cum_freq,
       ROUND(sum(cnt) OVER (ORDER BY value) / tot, 6) AS cum_pct
FROM c, t ORDER BY value
"""


def q_stream_rank_transform(spark, sf_dir):
    """RankEvaluator (NaturalRanking, ties averaged) over the per-doc
    token counts: every doc gets the fractional rank of its length."""
    from .entry_queries import _dl
    from .operators.matheval import rank_transform_stream

    return rank_transform_stream(_dl(spark, sf_dir), "doc_id", "dl")


SQL_STREAM_RANK_TRANSFORM = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
r AS (
  SELECT doc_id,
         RANK() OVER (ORDER BY dl)
           + (COUNT(*) OVER (PARTITION BY dl) - 1) / 2.0 AS avg_rank
  FROM dl)
SELECT doc_id, ROUND(avg_rank, 2) AS rank FROM r ORDER BY doc_id
"""


def q_stream_normalize_sum(spark, sf_dir):
    """normalizeSum(): per-language document counts scaled to a
    probability vector (sums to 1)."""
    from .operators.matheval import normalize_sum_stream

    counts = (
        _docs(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("cnt"))
    )
    return normalize_sum_stream(counts, "lang", "cnt")


SQL_STREAM_NORMALIZE_SUM = """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c)
SELECT lang, ROUND(cnt / tot, 6) AS p FROM c, t ORDER BY lang
"""


def q_stream_empirical_cdf(spark, sf_dir):
    """empiricalDistribution() + cumulativeProbability() at four probe
    points over the doc-length distribution — single-pass conditional
    means, no data-column shuffle."""
    from .entry_queries import _dl
    from .operators.matheval import empirical_cdf_stream

    return empirical_cdf_stream(
        _dl(spark, sf_dir), "dl", [40.0, 60.0, 80.0, 120.0]
    )


SQL_STREAM_EMPIRICAL_CDF = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
p AS (SELECT CAST(unnest([40.0, 60.0, 80.0, 120.0]) AS DOUBLE) AS probe)
SELECT probe,
       ROUND(CAST((SELECT avg(CASE WHEN dl <= probe THEN 1.0 ELSE 0.0 END)
                   FROM dl) AS DOUBLE), 6) AS cdf
FROM p ORDER BY probe
"""


REGISTRY_R4.update(
    {
        "stream_freq_table": (q_stream_freq_table, SQL_STREAM_FREQ_TABLE),
        "stream_rank_transform": (
            q_stream_rank_transform,
            SQL_STREAM_RANK_TRANSFORM,
        ),
        "stream_normalize_sum": (
            q_stream_normalize_sum,
            SQL_STREAM_NORMALIZE_SUM,
        ),
        "stream_empirical_cdf": (
            q_stream_empirical_cdf,
            SQL_STREAM_EMPIRICAL_CDF,
        ),
    }
)


# ===========================================================================
# Tranche 15: SimpleQueryParser end-to-end through the real engine.
# ===========================================================================


def q_engine_simple_qp(spark, sf_dir):
    """SimpleQueryParser syntax end-to-end (lucene/queryparser/.../simple/
    SimpleQueryParser.java): `dup window* | vector -"merge join"` with
    AND default operator -> ((dup AND window*) OR (vector AND NOT
    "merge join")) -> the real engine. Branch 1 scores bm25(dup) + 1.0
    (prefix under CONSTANT_SCORE_REWRITE); branch 2 scores bm25(vector)
    on docs without the adjacent phrase; SHOULD branches sum."""
    from .entry_engine import _engine, _to_orig
    from .query_parser import parse_simple

    eng = _engine(spark, sf_dir)
    q = parse_simple(
        'dup window* | vector -"merge join"',
        profile="simple",
        default_op="AND",
    )
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


def _sql_simple_qp() -> str:
    from .entry_engine import _sql_scores

    return f"""
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
tok AS (SELECT doc_id, term FROM tokp),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
pw AS (SELECT DISTINCT doc_id FROM tok WHERE term LIKE 'window%'),
b1 AS (SELECT s1.doc_id, s1.score + 1.0 AS score
       FROM s1 JOIN pw ON s1.doc_id = pw.doc_id),
ph AS (SELECT DISTINCT a.doc_id
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'merge' AND b.term = 'join'),
b2 AS (SELECT doc_id, score FROM s2
       WHERE doc_id NOT IN (SELECT doc_id FROM ph)),
u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_R4.update(
    {
        "engine_simple_qp_sql": (q_engine_simple_qp, _sql_simple_qp()),
    }
)


# ===========================================================================
# Tranche 16: olsRegress (two-predictor OLS, closed-form normal equations).
# ===========================================================================


def q_stream_ols_multi(spark, sf_dir):
    """olsRegress(y=l_extendedprice ~ l_quantity + l_discount): one
    distributed 9-sum agg, 2x2 normal-equation solve on the scalar row."""
    from .operators.matheval import ols2_stream

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return ols2_stream(li, "l_extendedprice", "l_quantity", "l_discount")


SQL_STREAM_OLS_MULTI = """
WITH g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(l_quantity AS DOUBLE)) AS s1,
         sum(CAST(l_discount AS DOUBLE)) AS s2,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS s11r,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS s22r,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS s12r,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS s1yr,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS s2yr,
         sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS syyr
  FROM lineitem),
c AS (
  SELECT n, s1, s2, sy,
         s11r - s1*s1/n AS s11, s22r - s2*s2/n AS s22,
         s12r - s1*s2/n AS s12, s1yr - s1*sy/n AS s1y,
         s2yr - s2*sy/n AS s2y, syyr - sy*sy/n AS syy
  FROM g),
b AS (
  SELECT n, s1, s2, sy, s1y, s2y, syy,
         (s22*s1y - s12*s2y) / (s11*s22 - s12*s12) AS b1,
         (s11*s2y - s12*s1y) / (s11*s22 - s12*s12) AS b2
  FROM c)
SELECT ROUND((sy - b1*s1 - b2*s2) / n, 6) AS b0,
       ROUND(b1, 6) AS b1,
       ROUND(b2, 6) AS b2,
       ROUND((b1*s1y + b2*s2y) / syy, 6) AS r2
FROM b
"""


REGISTRY_R4.update(
    {
        "stream_ols_multi": (q_stream_ols_multi, SQL_STREAM_OLS_MULTI),
    }
)


# ===========================================================================
# Tranche 17: Metaphone phonetic encoder (PhoneticFilterFactory's third
# commons-codec encoder, after Soundex / RefinedSoundex).
# ===========================================================================


def q_phonetic_metaphone(spark, sf_dir):
    """Vocabulary terms Metaphone-equal to 'vector' (rows-only — the
    rule-table encoder is not ANSI-SQL-expressible; spec vectors in
    tests/test_phonetic.py carry the correctness claim)."""
    from .operators.search_features import phonetic_terms

    return phonetic_terms(_tok(spark, sf_dir), "vector", 10, encoder="metaphone")


REGISTRY_R4.update(
    {
        "phonetic_metaphone": (q_phonetic_metaphone, None),
    }
)


# ===========================================================================
# Tranche 18: statsComponent cardinality (HLL sketch distinct).
# ===========================================================================


def q_stats_cardinality(spark, sf_dir):
    """cardinality=true on orders.o_custkey (rows-only: HLL++ estimates
    are implementation-defined; the 3*rsd accuracy bound vs the exact
    count is asserted in tests/test_round4b_tail.py)."""
    from .operators.facets import stats_cardinality

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return stats_cardinality(o, "o_custkey", rsd=0.02)


REGISTRY_R4.update(
    {
        "stats_cardinality": (q_stats_cardinality, None),
    }
)


def q_stats_percentiles_approx(spark, sf_dir):
    """statsComponent percentiles via the mergeable sketch path
    (rows-only: sketch estimates are implementation-defined; the
    error-vs-exact bound is asserted in tests/test_round4b_tail.py)."""
    from .operators.facets import percentiles_approx

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return percentiles_approx(li, "l_extendedprice", [0.25, 0.5, 0.9])


REGISTRY_R4.update(
    {
        "stats_percentiles_approx": (q_stats_percentiles_approx, None),
    }
)


# ===========================================================================
# Tranche 19: Solr group.query result grouping (query-defined groups).
# ===========================================================================


def q_group_query(spark, sf_dir):
    """group.query with three price-band queries over orders: per band,
    match count + top-3 orders by o_totalprice desc (o_orderkey asc
    tiebreak). Bands deliberately overlap at the boundary semantics
    Solr would produce for the same fq strings."""
    from .operators.collapse import group_by_queries

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = group_by_queries(
        o,
        [
            ("lt100k", F.col("o_totalprice") < 100000),
            ("100k_200k",
             (F.col("o_totalprice") >= 100000)
             & (F.col("o_totalprice") < 200000)),
            ("ge200k", F.col("o_totalprice") >= 200000),
        ],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )
    return out.select(
        "group_q",
        F.col("matches").cast("bigint").alias("matches"),
        "rank",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    ).orderBy("group_q", "rank")


SQL_GROUP_QUERY = """
WITH tagged AS (
  SELECT 'lt100k' AS group_q, o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice < 100000
  UNION ALL
  SELECT '100k_200k', o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice >= 100000 AND o_totalprice < 200000
  UNION ALL
  SELECT 'ge200k', o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice >= 200000),
r AS (
  SELECT group_q,
         CAST(count(*) OVER (PARTITION BY group_q) AS BIGINT) AS matches,
         CAST(row_number() OVER (
           PARTITION BY group_q
           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank,
         o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
  FROM tagged)
SELECT group_q, matches, rank, o_orderkey, o_totalprice
FROM r WHERE rank <= 3 ORDER BY group_q, rank
"""


REGISTRY_R4.update(
    {
        "group_query": (q_group_query, SQL_GROUP_QUERY),
    }
)


def q_group_func(spark, sf_dir):
    """Solr group.func: group by a FUNCTION value — floor(o_totalprice /
    100000) price bands — through the same two-pass collector as
    group.field (Grouping.java treats the function source exactly like a
    field source). Top-3 bands by max price, top-2 orders per band."""
    from .operators.collapse import grouping_two_pass

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "band", F.floor(F.col("o_totalprice") / 100000).cast("bigint")
    )
    out = grouping_two_pass(
        o, "band", [F.max("o_totalprice")],
        [F.desc("o_totalprice"), F.asc("o_orderkey")], 3, 2,
    )
    return out.select(
        "band", "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"), "rank",
    ).orderBy("band", "rank")


SQL_GROUP_FUNC = """
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         CAST(floor(o_totalprice / 100000) AS BIGINT) AS band
  FROM orders),
heads AS (
  SELECT band FROM o GROUP BY band
  ORDER BY max(o_totalprice) DESC, band LIMIT 3)
SELECT band, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(rn AS INT) AS rank
FROM (
  SELECT band, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY band ORDER BY o_totalprice DESC, o_orderkey) rn
  FROM o WHERE band IN (SELECT band FROM heads)) t
WHERE rn <= 2 ORDER BY band, rn
"""


REGISTRY_R4.update(
    {
        "group_func": (q_group_func, SQL_GROUP_FUNC),
    }
)


# ===========================================================================
# Tranche 20: searchAfter score-cursor paging + calendar-gap range facet.
# ===========================================================================


def q_search_after_score(spark, sf_dir):
    """IndexSearcher.searchAfter (TopScoreDocCollector's after param):
    page 2 of the 'dup' BM25 ranking via the strictly-after predicate
    (score < s) OR (score = s AND doc_id > d) — NEVER an OFFSET scan;
    at 10^12 docs the cursor predicate prunes with the index order while
    OFFSET re-collects every prior page. The page-1 boundary row is a
    1-row broadcast, not a driver collect. Cursor compares 4-dp rounded
    scores on both sides (the contract's determinism discipline;
    documented deviation from Lucene's exact-float cursor)."""
    from .entry_queries import _term_scores

    s = _term_scores(spark, sf_dir, "dup").select(
        "doc_id", F.round("score", 4).alias("score")
    )
    bound = (
        s.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .orderBy(F.asc("score"), F.desc("doc_id"))
        .limit(1)
        .select(
            F.col("score").alias("bs"), F.col("doc_id").alias("bd")
        )
    )
    page2 = (
        s.crossJoin(F.broadcast(bound))
        .filter(
            (F.col("score") < F.col("bs"))
            | ((F.col("score") == F.col("bs")) & (F.col("doc_id") > F.col("bd")))
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "score")
    )
    return page2


SQL_SEARCH_AFTER_SCORE = f"""
WITH {{tok}},
{{scores}}
, s AS (SELECT doc_id, ROUND(score, 4) AS score FROM scored)
, b AS (
  SELECT score AS bs, doc_id AS bd
  FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) p1
  ORDER BY score ASC, doc_id DESC LIMIT 1)
SELECT doc_id, score FROM s, b
WHERE score < bs OR (score = bs AND doc_id > bd)
ORDER BY score DESC, doc_id LIMIT 10
"""


def _sql_search_after() -> str:
    from .entry_queries import _SQL_TOK, _sql_term_scores

    return SQL_SEARCH_AFTER_SCORE.format(
        tok=_SQL_TOK, scores=_sql_term_scores("dup")
    )


def q_facet_range_week(spark, sf_dir):
    """facet.range with a CALENDAR gap (+7DAYS/1WEEK DateMathParser gap
    aligned to ISO week starts — calendar buckets, so this is
    date_trunc, not a numeric histogram; the sibling +1DAY tier is
    timeseries_day). Bucket surfaced as epoch-ms of the week start
    (UTC), count per bucket."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.unix_millis(
                F.date_trunc("week", F.col("ts").cast("timestamp"))
            ).alias("bucket_ms")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket_ms")
    )


SQL_FACET_RANGE_WEEK = """
SELECT epoch_ms(date_trunc('week', ts)) AS bucket_ms,
       count(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1
"""


REGISTRY_R4.update(
    {
        "search_after_score": (q_search_after_score, _sql_search_after()),
        "facet_range_week": (q_facet_range_week, SQL_FACET_RANGE_WEEK),
    }
)


# ===========================================================================
# Tranche 21: LTR feature normalizers (MinMax + Standard).
# ===========================================================================


def q_ltr_normalized_rescore(spark, sf_dir):
    """LTR with feature-store normalizers: tf('dup') MinMax-normalized,
    dl Standard-normalized over the candidate set, then the LinearModel
    rescore 2*tf_n - 0.5*dl_n (solr/contrib/ltr norm/MinMaxNormalizer +
    StandardNormalizer applied before LinearModel.score)."""
    from .operators.search_features import (
        ltr_linear_rescore,
        ltr_normalize_features,
    )

    tok = _tok(spark, sf_dir)
    tf = (
        tok.filter(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(F.count("*").cast("double").alias("tf_dup"))
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    cand = tf.join(dl, "doc_id")
    norm = ltr_normalize_features(
        cand, features={}, normalizers={"tf_dup": "minmax", "dl": "standard"}
    )
    out = ltr_linear_rescore(
        norm, features={}, weights={"tf_dup": 2.0, "dl": -0.5}, k=10
    )
    return out.select(
        "doc_id", F.round("ltr_score", 4).alias("ltr_score")
    )


def _sql_ltr_normalized() -> str:
    from .entry_queries import _SQL_TOK

    return f"""
WITH {_SQL_TOK},
tf AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf_dup
       FROM tok WHERE term = 'dup' GROUP BY doc_id),
dl2 AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
cand AS (SELECT tf.doc_id, tf.tf_dup, dl2.dl
         FROM tf JOIN dl2 ON tf.doc_id = dl2.doc_id),
st AS (SELECT min(tf_dup) AS lo, max(tf_dup) AS hi,
              avg(dl) AS mu, stddev_samp(dl) AS sd
       FROM cand),
n AS (SELECT doc_id,
             CASE WHEN hi > lo THEN (tf_dup - lo) / (hi - lo) ELSE 0.0 END AS tfn,
             CASE WHEN sd > 0 THEN (dl - mu) / sd ELSE 0.0 END AS dln
      FROM cand, st),
s AS (SELECT doc_id, 2.0 * tfn - 0.5 * dln AS ltr_score FROM n)
SELECT doc_id, ROUND(ltr_score, 4) AS ltr_score
FROM (SELECT * FROM s ORDER BY ltr_score DESC, doc_id LIMIT 10) t
"""


REGISTRY_R4.update(
    {
        "ltr_normalized_rescore": (
            q_ltr_normalized_rescore,
            _sql_ltr_normalized(),
        ),
    }
)


# ===========================================================================
# Tranche 22: FieldAnalysisRequestHandler (analysis-debug surface).
# ===========================================================================


def q_analysis_debug(spark, sf_dir):
    """Per-stage token streams of the EnglishAnalyzer chain for docs 0-2
    (FieldAnalysisRequestHandler parity): (doc_id, stage, pos, token)
    rows, one Arrow-batched UDF over the 3 requested docs — the debug
    surface runs on requested field values, never the corpus. Rows-only
    (Porter stage); stage-composition invariants are pytest-asserted."""
    @F.pandas_udf("array<struct<stage:string,pos:int,token:string>>")
    def _stages(s: pd.Series) -> pd.Series:
        from .analysis import analyze_stages

        return s.fillna("").map(
            lambda t: [
                {"stage": st, "pos": p, "token": tok}
                for (st, p, tok) in analyze_stages(t)
            ]
        )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 3)
    return (
        d.select("doc_id", F.explode(_stages("text")).alias("r"))
        .select("doc_id", "r.stage", "r.pos", "r.token")
        .orderBy("doc_id", "stage", "pos")
    )


REGISTRY_R4.update(
    {
        "analysis_debug": (q_analysis_debug, None),
    }
)


# ===========================================================================
# Tranche 23: fuzzyKmeans soft clustering (iterative custom operator).
# ===========================================================================


def q_ml_fuzzy_kmeans(spark, sf_dir):
    """fuzzyKmeans over the embeddings table: k=3, fuzzifier m=2, 8 fixed
    rounds, deterministic lowest-id init. Rows-only (iterative algorithm;
    membership math is differential-tested against a numpy reference in
    tests/test_round4b_tail.py)."""
    from .operators.ml import fuzzy_kmeans_embeddings

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return fuzzy_kmeans_embeddings(e, "vec_id", "embedding", k=3, iters=8)


REGISTRY_R4.update(
    {
        "ml_fuzzy_kmeans": (q_ml_fuzzy_kmeans, None),
    }
)


def q_ml_multi_kmeans(spark, sf_dir):
    """multiKmeans: best of 3 seeded kmeans fits by training cost over
    the embeddings table (rows-only: spark.ml model internals)."""
    from .operators.ml import multi_kmeans_embeddings

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return multi_kmeans_embeddings(e, "embedding", k=4, trials=3).select(
        "vec_id", "cluster", "training_cost"
    ).orderBy("vec_id")


REGISTRY_R4.update(
    {
        "ml_multi_kmeans": (q_ml_multi_kmeans, None),
    }
)
