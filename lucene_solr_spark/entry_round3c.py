"""Round-3c breadth entries: remaining Lucene/Solr surface rows.

Each entry pairs a Spark plan with a DuckDB SQL oracle under the same
hash-match discipline as entry_queries.py (identical column names, floats
rounded to 4 after ordering, doc_id tiebreaks).

Rows covered here (SURVEY.md §3 references):
  * WildcardQuery / RegexpQuery — MultiTermQuery rewrites over the terms
    dictionary (lucene/core/.../WildcardQuery.java, RegexpQuery.java);
    PrefixQuery was witnessed in rounds 1-2, these are the two remaining
    members of the automaton-rewrite family.
  * facet.range `other=all` — the before/after/between buckets Solr emits
    next to the histogram (RangeFacetProcessor.java `FacetRangeOther`).
  * ToParentBlockJoinQuery ScoreMode.Avg — the total-mode row was
    witnessed; avg exercises the remaining aggregation branch.
  * sortMissingLast — TopFieldCollector missing-value ordering
    (SchemaField sortMissingLast=true; Lucene SortField.setMissingValue).
  * group.facet — Solr grouped faceting: per facet value, the number of
    DISTINCT groups containing it (Grouping.java groupFacet path).
  * termfreq()/docfreq()/idf() function queries — Solr's index-stat value
    sources (TermFreqValueSource.java family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .entry_queries import _docs, _tok
from .operators import joins as J


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# WildcardQuery: pattern `s?a*` compiled to an anchored regex over the
# terms dict, then a semi-join back to postings (constant-score rewrite).
# ---------------------------------------------------------------------------
def q_wildcard_query(spark, sf_dir):
    tok = _tok(spark, sf_dir)
    m = (
        tok.filter(F.col("term").rlike("^s.a.*$"))
        .select("doc_id")
        .distinct()
    )
    return m.select("doc_id", F.lit(1.0).alias("score")).orderBy("doc_id")


SQL_WILDCARD_QUERY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE regexp_matches(term, '^s.a.*$') ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# RegexpQuery: user-supplied regex, anchored per Lucene semantics
# (RegexpQuery matches the WHOLE term). Pattern kept in the common
# RE2/Java-regex subset so both engines agree.
# ---------------------------------------------------------------------------
def q_regexp_query(spark, sf_dir):
    tok = _tok(spark, sf_dir)
    m = (
        tok.filter(F.col("term").rlike("^(jo|so)[a-z]+$"))
        .select("doc_id")
        .distinct()
    )
    return m.agg(F.count("*").alias("n_docs"))


SQL_REGEXP_QUERY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(*) AS n_docs FROM (
  SELECT DISTINCT doc_id FROM tok WHERE regexp_matches(term, '^(jo|so)[a-z]+$')
) t
"""


# ---------------------------------------------------------------------------
# facet.range other=all over documents.n_chars: histogram buckets labeled
# by start plus before/after/between rows, one sorted frame.
# ---------------------------------------------------------------------------
def q_facet_range_other(spark, sf_dir):
    d = _docs(spark, sf_dir)
    start, end, gap = 100.0, 200.0, 25.0
    col = F.col("n_chars").cast("double")
    bucket = F.when(col < start, F.lit("before")).when(
        col >= end, F.lit("after")
    ).otherwise(
        F.format_string(
            "b_%04d",
            (F.floor((col - F.lit(start)) / F.lit(gap)) * F.lit(gap)
             + F.lit(start)).cast("int"),
        )
    )
    hist = d.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("count"))
    between = d.filter((col >= start) & (col < end)).agg(
        F.lit("between").alias("bucket"), F.count("*").alias("count")
    )
    return hist.unionByName(between).orderBy("bucket")


SQL_FACET_RANGE_OTHER = """
WITH base AS (
  SELECT CASE
    WHEN n_chars < 100 THEN 'before'
    WHEN n_chars >= 200 THEN 'after'
    ELSE printf('b_%04d', CAST(floor((n_chars - 100) / 25.0) * 25 + 100 AS INT))
  END AS bucket
  FROM documents
),
hist AS (SELECT bucket, count(*) AS count FROM base GROUP BY bucket),
btw AS (
  SELECT 'between' AS bucket, count(*) AS count FROM documents
  WHERE n_chars >= 100 AND n_chars < 200
)
SELECT bucket, count FROM hist
UNION ALL SELECT bucket, count FROM btw
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# ToParentBlockJoinQuery ScoreMode.Avg
# ---------------------------------------------------------------------------
def q_block_join_score_avg(spark, sf_dir):
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    parents = J.block_join_parent(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        o,
        "o_orderkey",
        F.col("l_quantity") >= 49,
        F.col("l_quantity"),
        "avg",
    )
    return (
        parents.orderBy(F.desc("score"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.round(F.col("score").cast("double"), 4).alias("score"),
            "n_children",
        )
    )


SQL_BLOCK_JOIN_SCORE_AVG = """
SELECT o_orderkey, ROUND(CAST(score AS DOUBLE), 4) AS score, n_children FROM (
  SELECT l_orderkey AS o_orderkey, avg(l_quantity) AS score,
         count(*) AS n_children
  FROM lineitem WHERE l_quantity >= 49 GROUP BY 1) t
WHERE o_orderkey IN (SELECT o_orderkey FROM orders)
ORDER BY score DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# sortMissingLast: sort by a nullable key, nulls forced last, doc_id tiebreak
# (missing lang='en' docs modeled via NULLIF so the fixture has real nulls).
# ---------------------------------------------------------------------------
def q_sort_missing_last(spark, sf_dir):
    d = _docs(spark, sf_dir)
    key = F.expr("nullif(lang, 'en')")
    return (
        d.select("doc_id", key.alias("sort_key"))
        .orderBy(F.col("sort_key").asc_nulls_last(), F.col("doc_id").asc())
        .limit(10)
    )


SQL_SORT_MISSING_LAST = """
SELECT doc_id, nullif(lang, 'en') AS sort_key FROM documents
ORDER BY sort_key ASC NULLS LAST, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# group.facet: per facet value (source), count of DISTINCT groups (lang)
# containing at least one doc with that value.
# ---------------------------------------------------------------------------
def q_group_facet(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.col("source").alias("facet_value"))
        .agg(F.countDistinct("lang").alias("ngroups"))
        .orderBy(F.desc("ngroups"), F.asc("facet_value"))
        .limit(20)
    )


SQL_GROUP_FACET = """
SELECT source AS facet_value, count(DISTINCT lang) AS ngroups
FROM documents GROUP BY source
ORDER BY ngroups DESC, facet_value ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# termfreq()/docfreq()/idf() function queries: index-stat value sources
# surfaced as sortable columns (classic idf = 1 + ln(N/(df+1))).
# ---------------------------------------------------------------------------
def q_function_termfreq(spark, sf_dir):
    tok = _tok(spark, sf_dir)
    n_docs = tok.select("doc_id").distinct().count()
    df_ = tok.filter(F.col("term") == "merge").select("doc_id").distinct().count()
    idf = 1.0 + __import__("math").log(n_docs / (df_ + 1.0))
    tf = (
        tok.filter(F.col("term") == "merge")
        .groupBy("doc_id")
        .agg(F.count("*").alias("termfreq"))
    )
    return (
        tf.select(
            "doc_id",
            "termfreq",
            F.lit(df_).cast("bigint").alias("docfreq"),
            F.round(F.lit(idf), 4).alias("idf"),
        )
        .orderBy(F.desc("termfreq"), F.asc("doc_id"))
        .limit(10)
    )


SQL_FUNCTION_TERMFREQ = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
d AS (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = 'merge'),
tf AS (SELECT doc_id, count(*) AS termfreq FROM tok
       WHERE term = 'merge' GROUP BY doc_id)
SELECT tf.doc_id, tf.termfreq, CAST(d.df AS BIGINT) AS docfreq,
       ROUND(1.0 + ln(n.n_docs / (d.df + 1.0)), 4) AS idf
FROM tf, n, d
ORDER BY termfreq DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# copyField: Solr schema copyField source=title dest=catchall — the dest
# field indexes the UNION of its sources' token streams and carries its
# OWN length norms and collection stats (solr/core/.../schema/CopyField.java;
# IndexSchema#registerCopyField). title := first 5 tokens (the same field
# synthesis as entry_multifield), catchall := title ⊕ body; the claim is
# that catchall scoring uses CATCHALL df/avgdl, not either source's.
# ---------------------------------------------------------------------------
def q_copy_field(spark, sf_dir):
    from .entry_queries import _bm25_expr

    d = _docs(spark, sf_dir)
    arr = F.split("text", " ")
    cat = d.select(
        "doc_id", F.explode(F.concat(F.slice(arr, 1, 5), arr)).alias("term")
    )
    dl = cat.groupBy("doc_id").agg(F.count("*").alias("dl"))
    row = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).first()
    n, avgdl = int(row["n"]), float(row["a"])
    tf = cat.filter(F.col("term") == "vector").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_val = float(tf.count())
    scored = tf.join(dl, "doc_id").select(
        "doc_id",
        _bm25_expr(F.col("tf"), F.col("dl"), F.lit(df_val), n, avgdl).alias(
            "score"
        ),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_COPY_FIELD = """
WITH cat AS (
  SELECT doc_id, unnest(
    list_concat(string_split(text, ' ')[1:5], string_split(text, ' '))
  ) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM cat GROUP BY doc_id),
cstats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM cat WHERE term = 'vector'
       GROUP BY doc_id),
dfv AS (SELECT count(*) AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (cstats.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10) t
"""


# ---------------------------------------------------------------------------
# Luke handler: per-field index statistics — distinct terms, total term
# occurrences, docs carrying the field, mean field length
# (solr/core/.../handler/admin/LukeRequestHandler.java getIndexedFieldsInfo).
# Fields are the entry-tier title/body synthesis shared with
# entry_multifield.
# ---------------------------------------------------------------------------
def q_luke_field_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    arr = F.split("text", " ")
    title = d.select(
        F.lit("title").alias("field"),
        "doc_id",
        F.explode(F.slice(arr, 1, 5)).alias("term"),
    )
    body = d.select(
        F.lit("body").alias("field"), "doc_id", F.explode(arr).alias("term")
    )
    tok = title.unionByName(body)
    return (
        tok.groupBy("field")
        .agg(
            F.countDistinct("term").alias("distinct_terms"),
            F.count("*").alias("total_terms"),
            F.countDistinct("doc_id").alias("docs"),
            F.round(
                F.count("*") / F.countDistinct("doc_id"), 4
            ).alias("avg_field_len"),
        )
        .orderBy("field")
    )


SQL_LUKE_FIELD_STATS = """
WITH tok AS (
  SELECT 'title' AS field, doc_id,
         unnest(string_split(text, ' ')[1:5]) AS term FROM documents
  UNION ALL
  SELECT 'body' AS field, doc_id,
         unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT field,
       count(DISTINCT term) AS distinct_terms,
       CAST(count(*) AS BIGINT) AS total_terms,
       count(DISTINCT doc_id) AS docs,
       ROUND(count(*) * 1.0 / count(DISTINCT doc_id), 4) AS avg_field_len
FROM tok GROUP BY field ORDER BY field
"""


# ---------------------------------------------------------------------------
# Distributed search: per-shard top-k + TopDocs.merge == global top-k
# (lucene/core/.../TopDocs.java merge; Solr distributed search with global
# IDF — scores use COLLECTION stats, shards only partition the postings).
# The oracle is the plain GLOBAL top-10: the claim is that the sharded
# plan reproduces it exactly.
# ---------------------------------------------------------------------------
def q_sharded_topk_merge(spark, sf_dir):
    from pyspark.sql import Window

    from .entry_queries import _term_scores

    scored = _term_scores(spark, sf_dir, "dup").withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(4))
    )
    w = Window.partitionBy("shard").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    per_shard = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 10
    )
    return (
        per_shard.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


def _sql_sharded_topk_merge() -> str:
    from .entry_queries import _SQL_TOK, _sql_term_scores

    return f"""
WITH {_SQL_TOK},
{_sql_term_scores("dup")}
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10) t
"""


# ---------------------------------------------------------------------------
# SpanPositionRangeQuery: spans of a term with position in [start, end) —
# SpanFirstQuery is the start=0 special case, already witnessed; this row
# exercises the general range branch.
# ---------------------------------------------------------------------------
def q_span_position_range(spark, sf_dir):
    from .operators.spans import span_position_range

    return span_position_range(_tok(spark, sf_dir), "order", 5, 15).orderBy(
        "doc_id"
    )


SQL_SPAN_POSITION_RANGE = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id, count(*) AS n_spans FROM tok
WHERE term = 'order' AND pos >= 5 AND pos < 15
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Parallel-SQL tier breadth: TPC-H Q1/Q3 shapes through the DataFrame API
# (the reference's SQLHandler surface is analytic SQL over the engine's
# tables; Q1 = scan+agg with map-side partial aggregation, Q3 = 3-way
# join + agg + top-k). Money columns use the repo's exact-cents
# discipline (per-row round to cents -> BIGINT sum) so both engines sum
# integers; averages derive from those exact sums.
# ---------------------------------------------------------------------------
def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100).cast("bigint")  # noqa: E731
    f = li.filter(F.col("l_shipdate") <= "1998-09-02")
    g = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum(cents(F.col("l_extendedprice"))).alias("_bp"),
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("_dp"),
        F.sum(
            cents(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
        ).alias("_ch"),
        F.sum(cents(F.col("l_discount"))).alias("_dc"),
        F.count("*").alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        (F.col("_bp") / 100.0).alias("sum_base_price"),
        (F.col("_dp") / 100.0).alias("sum_disc_price"),
        (F.col("_ch") / 100.0).alias("sum_charge"),
        F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("_bp") / 100.0 / F.col("count_order"), 4).alias(
            "avg_price"
        ),
        F.round(F.col("_dc") / 100.0 / F.col("count_order"), 4).alias(
            "avg_disc"
        ),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_charge,
       ROUND(sum(CAST(l_quantity AS BIGINT)) * 1.0 / count(*), 4) AS avg_qty,
       ROUND(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4)
         AS avg_price,
       ROUND(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.filter(F.col("l_shipdate") > "1996-06-30")
        .join(
            o.filter(F.col("o_orderdate") < "1996-06-30"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    g = j.groupBy(
        "l_orderkey",
        F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
        "o_orderpriority",
    ).agg(
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            / 100.0
        ).alias("revenue")
    )
    return g.orderBy(
        F.desc("revenue"), F.asc("o_orderdate_epoch"), F.asc("l_orderkey")
    ).limit(10)


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate_epoch, o_orderpriority
ORDER BY revenue DESC, o_orderdate_epoch, l_orderkey LIMIT 10
"""


REGISTRY_R3C = {
    "wildcard_query": (q_wildcard_query, SQL_WILDCARD_QUERY),
    "regexp_query": (q_regexp_query, SQL_REGEXP_QUERY),
    "facet_range_other": (q_facet_range_other, SQL_FACET_RANGE_OTHER),
    "block_join_score_avg": (q_block_join_score_avg, SQL_BLOCK_JOIN_SCORE_AVG),
    "sort_missing_last": (q_sort_missing_last, SQL_SORT_MISSING_LAST),
    "group_facet": (q_group_facet, SQL_GROUP_FACET),
    "function_termfreq": (q_function_termfreq, SQL_FUNCTION_TERMFREQ),
    "sharded_topk_merge": (q_sharded_topk_merge, _sql_sharded_topk_merge()),
    "copy_field": (q_copy_field, SQL_COPY_FIELD),
    "luke_field_stats": (q_luke_field_stats, SQL_LUKE_FIELD_STATS),
    "tpch_q1_pricing_summary": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3_shipping_priority": (q_tpch_q3, SQL_TPCH_Q3),
    "span_position_range": (q_span_position_range, SQL_SPAN_POSITION_RANGE),
}
