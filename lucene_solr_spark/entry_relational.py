"""Driver-facing entries: facets/stats/aggregations (§3.7), streaming
expressions (§3.9), joins (§3.8), collectors/grouping (§3.6), parallel SQL
(§3.10) and scalar functions (§3.11) — each Spark recipe next to its DuckDB
oracle, identical column names + deterministic numerics (exact-cents sums).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import collapse as C
from .operators import facets as FA
from .operators import joins as J
from .operators import mlt as M
from .operators import streams as S

_money = FA.exact_money


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# facets & stats
# --------------------------------------------------------------------------

def q_facet_field(spark, sf_dir):
    return FA.facet_field(_t(spark, sf_dir, "documents"), "lang", limit=5)


SQL_FACET_FIELD = """
SELECT lang AS facet_value, count(*) AS count FROM documents
GROUP BY lang ORDER BY count DESC, facet_value LIMIT 5
"""


def q_facet_field_params(spark, sf_dir):
    """facet.field with the full SimpleFacets param set, two variants
    unioned: (a) prefix='M' in index order, (b) offset=1 paging in count
    order — over customer.c_mktsegment."""
    return FA.facet_field(
        _t(spark, sf_dir, "customer"),
        "c_mktsegment",
        limit=2,
        sort="index",
        prefix="M",
        offset=0,
    ).unionByName(
        FA.facet_field(
            _t(spark, sf_dir, "customer"),
            "c_mktsegment",
            limit=2,
            sort="count",
            offset=1,
        )
    )


SQL_FACET_FIELD_PARAMS = """
SELECT * FROM (
  SELECT c_mktsegment AS facet_value, CAST(count(*) AS BIGINT) AS count
  FROM customer WHERE c_mktsegment LIKE 'M%'
  GROUP BY 1 ORDER BY facet_value LIMIT 2)
UNION ALL
SELECT facet_value, count FROM (
  SELECT c_mktsegment AS facet_value, CAST(count(*) AS BIGINT) AS count,
         row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) AS rk
  FROM customer GROUP BY c_mktsegment) t
WHERE rk > 1 AND rk <= 3 ORDER BY count DESC, facet_value
"""


def q_facet_field_index(spark, sf_dir):
    return FA.facet_field(
        _t(spark, sf_dir, "documents"), "source", limit=10, sort="index"
    )


SQL_FACET_FIELD_INDEX = """
SELECT source AS facet_value, count(*) AS count FROM documents
GROUP BY source ORDER BY facet_value LIMIT 10
"""


def q_facet_range(spark, sf_dir):
    return FA.facet_range(_t(spark, sf_dir, "documents"), "n_chars", 0, 600, 50)


SQL_FACET_RANGE = """
SELECT CAST(floor(n_chars / 50) * 50 AS DOUBLE) AS bucket_start,
       count(*) AS count
FROM documents WHERE n_chars >= 0 AND n_chars < 600
GROUP BY 1 ORDER BY bucket_start
"""


def q_facet_query(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return FA.facet_query(
        d,
        {
            "long_docs": F.col("n_chars") > 300,
            "english": F.col("lang") == "en",
        },
    )


SQL_FACET_QUERY = """
SELECT 'long_docs' AS facet_name,
       CAST(count(*) FILTER (WHERE n_chars > 300) AS BIGINT) AS count FROM documents
UNION ALL
SELECT 'english', CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) FROM documents
"""


def q_facet_pivot(spark, sf_dir):
    return FA.facet_pivot(_t(spark, sf_dir, "documents"), ["lang", "source"], 20)


SQL_FACET_PIVOT = """
SELECT lang, source, count(*) AS count FROM documents
GROUP BY lang, source ORDER BY count DESC, lang, source LIMIT 20
"""


def q_facet_rollup(spark, sf_dir):
    return FA.facet_rollup(_t(spark, sf_dir, "documents"), ["lang", "source"])


SQL_FACET_ROLLUP = """
SELECT lang, source, count(*) AS count FROM documents
GROUP BY ROLLUP (lang, source)
ORDER BY lang NULLS FIRST, source NULLS FIRST
"""


def q_facet_interval(spark, sf_dir):
    return FA.facet_interval(
        _t(spark, sf_dir, "documents"),
        "n_chars",
        [("small", 0, 150), ("medium", 150, 300), ("large", 300, None)],
    )


SQL_FACET_INTERVAL = """
SELECT interval, count(*) AS count FROM (
  SELECT CASE WHEN n_chars >= 0 AND n_chars < 150 THEN 'small'
              WHEN n_chars >= 150 AND n_chars < 300 THEN 'medium'
              WHEN n_chars >= 300 THEN 'large' END AS interval
  FROM documents) t
WHERE interval IS NOT NULL GROUP BY interval ORDER BY interval
"""


def q_stats_component(spark, sf_dir):
    return FA.stats_component(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


SQL_STATS_COMPONENT = """
SELECT CAST(count(l_extendedprice) AS BIGINT) AS count,
       CAST(count(*) FILTER (WHERE l_extendedprice IS NULL) AS BIGINT) AS missing,
       min(l_extendedprice) AS min, max(l_extendedprice) AS max,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         / count(l_extendedprice) AS mean,
       ROUND(stddev_samp(l_extendedprice), 4) AS stddev
FROM lineitem
"""


def q_percentiles(spark, sf_dir):
    return FA.percentiles(
        _t(spark, sf_dir, "lineitem"), "l_quantity", [0.25, 0.5, 0.9]
    )


SQL_PERCENTILES = """
SELECT ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS p25,
       ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90
FROM lineitem
"""


def q_unique_agg(spark, sf_dir):
    return FA.unique_agg(_t(spark, sf_dir, "lineitem"), "l_returnflag", "l_suppkey")


SQL_UNIQUE_AGG = """
SELECT l_returnflag AS facet_value, count(DISTINCT l_suppkey) AS unique
FROM lineitem GROUP BY l_returnflag ORDER BY facet_value
"""


def q_json_facet_nested(spark, sf_dir):
    return FA.json_facet_nested(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_linestatus",
        "l_extendedprice", top_inner=2,
    )


SQL_JSON_FACET_NESTED = """
WITH sub AS (
  SELECT l_returnflag AS outer_value, l_linestatus AS inner_value,
         count(*) AS count,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS metric_sum,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_linestatus) AS rank
  FROM lineitem GROUP BY 1, 2)
SELECT outer_value, inner_value, count, metric_sum, CAST(rank AS INT) AS rank
FROM sub WHERE rank <= 2 ORDER BY outer_value, rank
"""


def q_timeseries(spark, sf_dir):
    return FA.timeseries(_t(spark, sf_dir, "events"), "ts", "value", "day")


SQL_TIMESERIES = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_ts,
       count(*) AS count,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY 1 ORDER BY bucket_ts
"""


# --------------------------------------------------------------------------
# streaming expressions
# --------------------------------------------------------------------------

def q_search_export(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return S.search_stream(
        li,
        F.col("l_returnflag") == "R",
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        limit=20,
    )


SQL_SEARCH_EXPORT = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
WHERE l_returnflag = 'R'
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20
"""


def q_rollup_stream(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return S.rollup_stream(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count("*").alias("count"),
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_money("l_extendedprice")) / 100.0).alias("sum_price"),
            F.round(F.sum(_money("l_discount")) / 100.0 / F.count("*"), 4).alias(
                "avg_disc"
            ),
        ],
    )


SQL_ROLLUP_STREAM = """
SELECT l_returnflag, l_linestatus, count(*) AS count,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
       ROUND(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
             / count(*), 4) AS avg_disc
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_having_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return S.having_stream(
        o,
        ["o_custkey"],
        [F.count("*").alias("n_orders")],
        F.col("n_orders") >= 18,
    )


SQL_HAVING_STREAM = """
SELECT o_custkey, count(*) AS n_orders FROM orders
GROUP BY o_custkey HAVING count(*) >= 18 ORDER BY o_custkey
"""


def q_top_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return S.top_stream(
        o.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        15,
    )


SQL_TOP_STREAM = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
"""


def q_unique_stream(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    u = S.unique_stream(
        li.select(
            "l_orderkey",
            "l_linenumber",
            # explicit double: the oracle side may register l_quantity as
            # DECIMAL (canonical TPC-H typing), which value-hashes
            # differently than float — pin both sides to DOUBLE
            F.col("l_quantity").cast("double").alias("l_quantity"),
        ),
        ["l_orderkey"],
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
        # — rank-1 by linenumber alone is a genuine tie (hash_match=false in
        # round 1); l_quantity completes a deterministic total order
        [F.asc("l_linenumber"), F.asc("l_quantity")],
    )
    return u.orderBy("l_orderkey", "l_linenumber").limit(20)


SQL_UNIQUE_STREAM = """
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity) rn
  FROM lineitem) t
WHERE rn = 1 ORDER BY l_orderkey, l_linenumber LIMIT 20
"""


def q_sessionize(spark, sf_dir):
    """Gap-timeout sessionization (30 min) over the events stream — the
    batch twin of the applyInPandasWithState stateful operator
    (streaming/sessions.py; stream == batch asserted in
    tests/test_streaming_sessions.py)."""
    from .streaming.sessions import sessionize_batch

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    s = sessionize_batch(ev, gap_minutes=30)
    return s.select(
        "user_id",
        F.unix_timestamp("session_start").alias("start_epoch"),
        F.unix_timestamp("session_end").alias("end_epoch"),
        "n_events",
    ).orderBy("user_id", "start_epoch")


SQL_SESSIONIZE = """
WITH e AS (SELECT user_id, ts FROM events WHERE user_id < 10),
l AS (SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts)) >= 1800
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM l)
SELECT user_id,
       CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS start_epoch,
       CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS end_epoch,
       count(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, start_epoch
"""


def q_random_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return S.random_stream(
        o.select("o_orderkey", "o_custkey"), "o_orderkey", 15, seed=42
    )


SQL_RANDOM_STREAM = """
SELECT o_orderkey, o_custkey FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR) || '#42') LIMIT 15
"""


def q_reduce_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return S.reduce_stream(
        o.filter(F.col("o_custkey") < 15).select("o_custkey", "o_orderkey"),
        ["o_custkey"],
        "o_orderkey",
    )


SQL_REDUCE_STREAM = """
SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS "group",
       count(*) AS n
FROM orders WHERE o_custkey < 15 GROUP BY o_custkey ORDER BY o_custkey
"""


def q_select_eval(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = S.select_eval(
        li,
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "revenue": F.col("l_extendedprice") * (1 - F.col("l_discount")),
        },
    )
    return (
        out.orderBy(F.desc("revenue"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round("revenue", 4).alias("revenue"))
    )


SQL_SELECT_EVAL = """
SELECT l_orderkey, l_linenumber, ROUND(revenue, 4) AS revenue FROM (
  SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS revenue
  FROM lineitem
  ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 20) t
"""


def q_merge_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    m = S.merge_stream([a, b], [F.asc("o_orderkey")])
    return m.groupBy("o_orderpriority").agg(F.count("*").alias("count")).orderBy(
        "o_orderpriority"
    )


SQL_MERGE_STREAM = """
SELECT o_orderpriority, count(*) AS count FROM (
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O') t
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_cartesian_product(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    ex = S.cartesian_product_stream(d.select("doc_id", "toks"), "toks", "term")
    return ex.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("term").alias("n_terms"),
    )


SQL_CARTESIAN_PRODUCT = """
SELECT count(*) AS n_rows, count(DISTINCT term) AS n_terms FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
"""


def q_fetch_stream(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    top = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10)
    return S.fetch_stream(
        top.select("o_orderkey", "o_custkey", "o_totalprice"),
        c.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        ["c_name"],
    ).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))


SQL_FETCH_STREAM = """
SELECT t.o_orderkey, t.o_custkey, t.o_totalprice, c.c_name FROM (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) t
LEFT JOIN customer c ON c.c_custkey = t.o_custkey
ORDER BY t.o_totalprice DESC, t.o_orderkey
"""


def q_significant_terms(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    fg = d.filter(F.col("lang") == "de").select("doc_id")
    return S.significant_terms(tok, fg, min_doc_freq=2, limit=10)


SQL_SIGNIFICANT_TERMS = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
fg_docs AS (SELECT doc_id FROM documents WHERE lang = 'de'),
bg AS (SELECT term, count(DISTINCT doc_id) AS bg_df FROM tok GROUP BY term),
fg AS (SELECT term, count(DISTINCT doc_id) AS fg_df FROM tok
       WHERE doc_id IN (SELECT doc_id FROM fg_docs) GROUP BY term),
sizes AS (SELECT (SELECT count(DISTINCT doc_id) FROM tok) AS bg_size,
                 (SELECT count(*) FROM fg_docs) AS fg_size)
SELECT term, fg_df, bg_df,
       ROUND((fg_df / CAST(fg_size AS DOUBLE)) / (bg_df / CAST(bg_size AS DOUBLE)), 4) AS score
FROM fg JOIN bg USING (term), sizes
WHERE fg_df >= 2 ORDER BY score DESC, term LIMIT 10
"""


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

def q_hash_join(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    j = J.hash_join(o, c, o["o_custkey"] == c["c_custkey"])
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_money("o_totalprice")) / 100.0).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


SQL_HASH_JOIN = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_outer_join(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    j = J.outer_hash_join(
        c.select("c_custkey"),
        o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count("*").alias("n")
        ),
        "c_custkey",
    )
    return j.agg(
        F.count("*").alias("n_customers"),
        F.sum(F.when(F.col("n").isNull(), 1).otherwise(0)).alias("no_orders"),
    )


SQL_OUTER_JOIN = """
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) FILTER (WHERE n IS NULL) AS BIGINT) AS no_orders
FROM customer LEFT JOIN (
  SELECT o_custkey AS c_custkey, count(*) AS n FROM orders GROUP BY 1) t
USING (c_custkey)
"""


def q_semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    x = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return J.semi_join(f, x, "o_custkey").agg(F.count("*").alias("n_both"))


SQL_SEMI_JOIN = """
SELECT count(*) AS n_both FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') f
WHERE o_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
"""


def q_anti_join(spark, sf_dir):
    p, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    unordered = J.anti_join(
        p.select("p_partkey"),
        li.select(F.col("l_partkey").alias("p_partkey")),
        "p_partkey",
    )
    return unordered.agg(F.count("*").alias("n_unordered_parts"))


SQL_ANTI_JOIN = """
SELECT count(*) AS n_unordered_parts FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
"""


def q_join_score_mode(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    scored = J.join_with_score_mode(
        li, "l_orderkey", "o_orderkey", "l_extendedprice", "max"
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("score", 4).alias("score"))
    )


SQL_JOIN_SCORE_MODE = """
SELECT o_orderkey, ROUND(score, 4) AS score FROM (
  SELECT l_orderkey AS o_orderkey, max(l_extendedprice) AS score
  FROM lineitem GROUP BY 1 ORDER BY score DESC, o_orderkey LIMIT 10) t
"""


def q_block_join_parent(spark, sf_dir):
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    parents = J.block_join_parent(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        o,
        "o_orderkey",
        F.col("l_quantity") >= 49,
        F.col("l_quantity"),
        "total",
    )
    return (
        parents.orderBy(F.desc("score"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("score").cast("double").alias("score"), "n_children")
    )


SQL_BLOCK_JOIN_PARENT = """
SELECT o_orderkey, CAST(score AS DOUBLE) AS score, n_children FROM (
  SELECT l_orderkey AS o_orderkey, sum(l_quantity) AS score,
         count(*) AS n_children
  FROM lineitem WHERE l_quantity >= 49 GROUP BY 1) t
WHERE o_orderkey IN (SELECT o_orderkey FROM orders)
ORDER BY score DESC, o_orderkey LIMIT 10
"""


def q_block_join_children(spark, sf_dir):
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    kids = J.block_join_children(
        o,
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        F.col("o_totalprice") > 400000,
    )
    return kids.agg(F.count("*").alias("n_children"))


SQL_BLOCK_JOIN_CHILDREN = """
SELECT count(*) AS n_children FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
"""


def q_json_facet_block_domain(spark, sf_dir):
    """JSON facet with domain blockChildren: parents = high-value open
    orders, domain switched to their lineitem children, faceted by
    l_returnflag."""
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    out = FA.block_children_domain_facet(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        li,
        "l_orderkey",
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000),
        "l_returnflag",
    )
    return out


SQL_JSON_FACET_BLOCK_DOMAIN = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderstatus = 'O' AND o_totalprice > 200000)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_graph_2hop(spark, sf_dir):
    """gatherNodes 2-hop: nation -> customers -> orders."""
    from .operators.graph import gather_nodes

    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    start = c.filter(F.col("c_nationkey") == 1).select(
        F.col("c_custkey").alias("from")
    )
    hop = gather_nodes(
        o.select(F.col("o_custkey").alias("from"), F.col("o_orderkey").alias("to")),
        "from",
        "to",
        start,
        hops=1,
    )
    return hop.agg(F.count("*").alias("n_orders"))


SQL_GRAPH_2HOP = """
SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
"""


# --------------------------------------------------------------------------
# collectors / grouping / collapse / rerank
# --------------------------------------------------------------------------

def q_collapse(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = C.collapse(d, "lang", [F.desc("n_chars"), F.asc("doc_id")])
    return out.select("doc_id", "lang", "n_chars").orderBy("lang")


SQL_COLLAPSE = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) rn
  FROM documents) t
WHERE rn = 1 ORDER BY lang
"""


def q_expand(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = C.expand(d, "lang", [F.desc("n_chars"), F.asc("doc_id")], 2)
    return out.select("doc_id", "lang", "n_chars", "rank").orderBy("lang", "rank")


SQL_EXPAND = """
SELECT doc_id, lang, n_chars, CAST(rn AS INT) AS rank FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) rn
  FROM documents) t
WHERE rn <= 2 ORDER BY lang, rn
"""


def q_grouping_two_pass(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = C.grouping_two_pass(
        d, "source", [F.max("n_chars")], [F.desc("n_chars"), F.asc("doc_id")], 3, 2
    )
    return out.select("source", "doc_id", "n_chars", "rank").orderBy(
        "source", "rank"
    )


SQL_GROUPING_TWO_PASS = """
WITH heads AS (
  SELECT source FROM documents GROUP BY source
  ORDER BY max(n_chars) DESC, source LIMIT 3)
SELECT source, doc_id, n_chars, CAST(rn AS INT) AS rank FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) rn
  FROM documents WHERE source IN (SELECT source FROM heads)) t
WHERE rn <= 2 ORDER BY source, rn
"""


def q_rerank(spark, sf_dir):
    """ReRank: first pass by n_chars desc (top 20), rescore by tf('dup')*100."""
    d = _t(spark, sf_dir, "documents")
    tf_dup = F.size(F.filter(F.split("text", " "), lambda t: t == F.lit("dup")))
    out = C.rerank(
        d.select("doc_id", "n_chars", "text"),
        [F.desc("n_chars"), F.asc("doc_id")],
        tf_dup.cast("double") * 100.0,
        top_n=20,
        weight=1.0,
        k=10,
        first_score=F.col("n_chars").cast("double"),
    )
    return out.select("doc_id", F.round("score", 4).alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


SQL_RERANK = """
SELECT doc_id, ROUND(score, 4) AS score FROM (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE)
           + 100.0 * len(list_filter(string_split(text,' '), t -> t = 'dup')) AS score
  FROM (SELECT * FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20) f
  ORDER BY score DESC, doc_id LIMIT 10) t
ORDER BY score DESC, doc_id
"""


def q_diversified_topk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = C.diversified_topk(
        d, "lang", [F.desc("n_chars"), F.asc("doc_id")], max_per_key=2, k=10
    )
    return out.select("doc_id", "lang", "n_chars")


SQL_DIVERSIFIED_TOPK = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) rn
  FROM documents) t
WHERE rn <= 2 ORDER BY n_chars DESC, doc_id LIMIT 10
"""


def q_mlt(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n = d.count()
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    return M.more_like_this(tok, dl, doc_id=0, n_docs=n, avgdl=avgdl, max_terms=3)


SQL_MLT = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
src AS (SELECT term, count(*) AS tf FROM tok WHERE doc_id = 0 GROUP BY term),
mlt AS (
  SELECT src.term, ROUND(src.tf * ln(cstats.n / CAST(dfs.df AS DOUBLE)), 4) AS s
  FROM src JOIN dfs USING (term), cstats
  ORDER BY s DESC, term LIMIT 3),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM mlt) GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))) AS score
  FROM tf JOIN dfs USING (term) JOIN dl ON dl.doc_id = tf.doc_id, cstats
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM (
  SELECT * FROM scored WHERE doc_id != 0
  ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_mlt_interesting_terms(spark, sf_dir):
    """mlt.interestingTerms=details (MoreLikeThisComponent): the selected
    top tf-idf terms of the source doc with their MLT weights."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return M.top_tfidf_terms(tok, doc_id=0, n_docs=d.count(), max_terms=5)


SQL_MLT_INTERESTING_TERMS = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
src AS (SELECT term, count(*) AS tf FROM tok WHERE doc_id = 0 GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT term,
       ROUND(src.tf * ln(n.n / CAST(dfs.df AS DOUBLE)), 4) AS mlt_score
FROM src JOIN dfs USING (term), n
ORDER BY mlt_score DESC, term LIMIT 5
"""


# --------------------------------------------------------------------------
# parallel SQL (§3.10) + scalar functions (§3.11)
# --------------------------------------------------------------------------

def q_sql_handler(spark, sf_dir):
    """Parallel SQL layer: the supported reference SQL surface is literally
    spark.sql (SQLHandler.java -> Calcite -> streaming expr; here Catalyst)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_price
        FROM lineitem_v WHERE l_quantity > 10
        GROUP BY l_returnflag HAVING count(*) > 100
        ORDER BY l_returnflag LIMIT 10
        """
    )


SQL_SQL_HANDLER = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM lineitem WHERE l_quantity > 10
GROUP BY l_returnflag HAVING count(*) > 100
ORDER BY l_returnflag LIMIT 10
"""


def q_function_recip(spark, sf_dir):
    """recip(ms(NOW,ts),m,a,b) freshness boost, NOW pinned (DateMathParser)."""
    from .functions.valuesources import recip

    e = _t(spark, sf_dir, "events")
    now_ms = 1706745600000  # 2024-02-01T00:00:00Z, fixed per request
    # ts is TIMESTAMP_NTZ in the parquet; session tz is UTC so the cast is identity
    age_days = (
        F.lit(now_ms) - F.unix_millis(F.col("ts").cast("timestamp"))
    ) / 86400000.0
    boost = recip(age_days, 1.0, 1.0, 1.0)
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(boost), 6).alias("avg_boost"))
        .orderBy("event_type")
    )


SQL_FUNCTION_RECIP = """
SELECT event_type,
       ROUND(avg(1.0 / ((1706745600000 - epoch_ms(ts)) / 86400000.0 + 1.0)), 6)
         AS avg_boost
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_scale_function(spark, sf_dir):
    from .functions.valuesources import scale

    o = _t(spark, sf_dir, "orders")
    scaled = scale(o, "o_totalprice", 0.0, 1.0)
    return (
        o.select("o_orderkey", F.round(scaled, 6).alias("scaled"))
        .orderBy(F.desc("scaled"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_SCALE_FUNCTION = """
SELECT o_orderkey,
       ROUND((o_totalprice - (SELECT min(o_totalprice) FROM orders))
             / ((SELECT max(o_totalprice) FROM orders)
                - (SELECT min(o_totalprice) FROM orders)), 6) AS scaled
FROM orders ORDER BY scaled DESC, o_orderkey LIMIT 10
"""


def q_strdist(spark, sf_dir):
    from .functions.valuesources import strdist_levenshtein_sim

    c = _t(spark, sf_dir, "customer")
    sim = strdist_levenshtein_sim(F.col("c_name"), F.lit("Customer#000000100"))
    return (
        c.select("c_custkey", F.round(sim, 4).alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc("c_custkey"))
        .limit(10)
    )


SQL_STRDIST = """
SELECT c_custkey,
       ROUND(CASE WHEN greatest(length(c_name), 18) = 0 THEN 1.0
             ELSE 1.0 - levenshtein(c_name, 'Customer#000000100')
                  / CAST(greatest(length(c_name), 18) AS DOUBLE) END, 4) AS similarity
FROM customer ORDER BY similarity DESC, c_custkey LIMIT 10
"""


def q_date_math(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    month = F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
    return (
        o.groupBy(month.alias("month_ts"))
        .agg(F.count("*").alias("n"))
        .orderBy("month_ts")
        .limit(12)
    )


SQL_DATE_MATH = """
SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_ts,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY month_ts LIMIT 12
"""


# synthetic per-customer coordinates (deterministic key arithmetic, same
# trick as q_geodist) — the corpus carries no lat/lon columns. Lazy: Column
# construction needs an active SparkContext, which module import must not.
def _lat():
    return (F.col("c_custkey") * 7 % 120 - 60).cast("double")


def _lon():
    return (F.col("c_custkey") * 13 % 340 - 170).cast("double")
_SQL_COORDS = """
coords AS (SELECT c_custkey,
                  CAST(c_custkey * 7 % 120 - 60 AS DOUBLE) AS lat,
                  CAST(c_custkey * 13 % 340 - 170 AS DOUBLE) AS lon
           FROM customer)"""


def q_geo_box(spark, sf_dir):
    """LatLonPoint.newBoxQuery: bounding-box containment (range predicates
    -> parquet min-max pruning at the scan, the BKD analog)."""
    from .functions.valuesources import geo_box

    c = _t(spark, sf_dir, "customer")
    inside = geo_box(_lat(), _lon(), -30.0, 30.0, -60.0, 60.0)
    return (
        c.filter(inside)
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(20)
    )


SQL_GEO_BOX = f"""
WITH {_SQL_COORDS}
SELECT c_custkey FROM coords
WHERE lat BETWEEN -30 AND 30 AND lon BETWEEN -60 AND 60
ORDER BY c_custkey LIMIT 20
"""


_POLY = [(-40.0, -100.0), (50.0, 0.0), (-40.0, 100.0)]


def q_geo_polygon(spark, sf_dir):
    """LatLonPoint.newPolygonQuery: ray-casting point-in-polygon for a
    literal triangle, unrolled to Column arithmetic (no UDF)."""
    from .functions.valuesources import point_in_polygon

    c = _t(spark, sf_dir, "customer")
    inside = point_in_polygon(_lat(), _lon(), _POLY)
    return c.filter(inside).agg(F.count("*").alias("n_inside"))


def _sql_polygon() -> str:
    n = len(_POLY)
    arms = []
    for i in range(n):
        y1, x1 = _POLY[i]
        y2, x2 = _POLY[(i + 1) % n]
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        arms.append(
            f"(CASE WHEN (({y1} > lat) != ({y2} > lat)) AND "
            f"lon < {x1} + (lat - {y1}) * {slope!r} THEN 1 ELSE 0 END)"
        )
    return f"""
WITH {_SQL_COORDS}
SELECT count(*) AS n_inside FROM coords
WHERE ({' + '.join(arms)}) % 2 = 1
"""


SQL_GEO_POLYGON = _sql_polygon()


def q_facet_heatmap(spark, sf_dir):
    """facet.heatmap: fixed-resolution geo grid-cell counts."""
    from .operators.facets import heatmap_facet

    c = _t(spark, sf_dir, "customer")
    return heatmap_facet(c, _lat(), _lon(), 20.0)


SQL_FACET_HEATMAP = f"""
WITH {_SQL_COORDS}
SELECT CAST(floor(lat / 20.0) AS INT) AS cell_lat,
       CAST(floor(lon / 20.0) AS INT) AS cell_lon,
       count(*) AS count
FROM coords GROUP BY 1, 2 ORDER BY cell_lat, cell_lon
"""


def q_facet_sampled(spark, sf_dir):
    """Sampling facet collector: counts over a deterministic 1/7 hash
    sample, scaled back up."""
    from .operators.facets import sampled_facet_counts

    c = _t(spark, sf_dir, "customer")
    return sampled_facet_counts(c, "c_mktsegment", "c_custkey", 7, seed=42)


SQL_FACET_SAMPLED = """
SELECT c_mktsegment,
       count(*) AS sample_count,
       count(*) * 7 AS estimated_count
FROM customer
WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#42'), 1, 8))::BIGINT % 7 = 0
GROUP BY 1 ORDER BY c_mktsegment
"""


def q_unique_block(spark, sf_dir):
    """uniqueBlock(_root_): distinct parent blocks per child bucket."""
    from .operators.facets import unique_block

    li = _t(spark, sf_dir, "lineitem")
    return unique_block(li, "l_returnflag", "l_orderkey")


SQL_UNIQUE_BLOCK = """
SELECT l_returnflag, count(DISTINCT l_orderkey) AS unique_blocks
FROM lineitem GROUP BY 1 ORDER BY l_returnflag
"""


def q_relatedness(spark, sf_dir):
    """relatedness(fg, bg) semantic-knowledge-graph agg: which order
    priorities relate to high-value orders (fg = totalprice > 300k,
    bg = all orders)."""
    from .operators.facets import relatedness_agg

    o = _t(spark, sf_dir, "orders")
    return relatedness_agg(
        o,
        "o_orderpriority",
        F.col("o_totalprice") > 300000.0,
        F.lit(True),
    )


SQL_RELATEDNESS = """
WITH tot AS (
  SELECT greatest(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END), 1) AS fg,
         greatest(count(*), 1) AS bg
  FROM orders),
g AS (SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS fg_count,
             count(*) AS bg_count
      FROM orders GROUP BY 1),
r AS (SELECT o_orderpriority, fg_count, bg_count,
             fg_count / CAST(tot.fg AS DOUBLE) AS fg_pop,
             bg_count / CAST(tot.bg AS DOUBLE) AS bg_pop
      FROM g, tot)
SELECT o_orderpriority, fg_count, bg_count,
       ROUND(CASE WHEN greatest(fg_pop, bg_pop) > 0
                  THEN (fg_pop - bg_pop) / greatest(fg_pop, bg_pop)
                  ELSE 0.0 END, 4) AS relatedness
FROM r ORDER BY relatedness DESC, o_orderpriority
"""


def q_score_nodes(spark, sf_dir):
    """scoreNodes(gatherNodes(...)): tf-idf node ranking — parts reached
    from orders of customers 0-4, arrival count x log(N/df)."""
    from .operators.graph import score_nodes

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    start_orders = (
        o.filter(F.col("o_custkey") < 5)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    edges = li.select("l_orderkey", "l_partkey")
    out = score_nodes(edges, "l_orderkey", "l_partkey", start_orders, hops=1)
    return out.limit(15)


SQL_SCORE_NODES = """
WITH start AS (SELECT o_orderkey FROM orders WHERE o_custkey < 5),
reached AS (SELECT l_partkey AS node, count(*) AS count
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM start)
            GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_edges FROM lineitem),
dfs AS (SELECT l_partkey AS node, count(*) AS df FROM lineitem GROUP BY 1)
SELECT reached.node, reached.count,
       ROUND(reached.count * ln(n.n_edges / dfs.df), 4) AS score
FROM reached, n, dfs
WHERE dfs.node = reached.node
ORDER BY score DESC, reached.node LIMIT 15
"""


def q_date_math_fn(spark, sf_dir):
    """DateMathParser (SURVEY §3.11 date row; DateMathParser.java ≈L150):
    resolve Solr date-math expressions — NOW+1DAY, NOW/HOUR-7DAYS, chained
    truncation/offset — against a pinned NOW (per-request NOW semantics),
    then count events at or after each boundary. Differential: Spark
    resolves via the parser; the oracle re-derives every boundary with
    independent SQL datetime algebra."""
    import datetime as dt

    from .functions.valuesources import date_math

    now = dt.datetime(2024, 1, 31, 12, 34, 56)
    exprs = [
        "NOW", "NOW/DAY", "NOW/HOUR", "NOW+1DAY", "NOW-3HOURS",
        "NOW/DAY-7DAYS", "NOW/MONTH", "NOW/MONTH+1MONTH", "NOW-90MINUTES/MINUTE",
    ]
    bounds = spark.createDataFrame(
        [(e, date_math(now, e)) for e in exprs], "expr string, b timestamp"
    )
    ev = _t(spark, sf_dir, "events")
    joined = F.broadcast(bounds).join(ev, ev["ts"] >= bounds["b"], "left")
    return (
        joined.groupBy("expr", "b")
        .agg(F.count("ts").alias("n_after"))
        .select(
            "expr",
            F.unix_timestamp("b").alias("ts_epoch"),
            "n_after",
        )
        .orderBy("expr")
    )


SQL_DATE_MATH_FN = """
WITH bounds(expr, b) AS (
  SELECT 'NOW', TIMESTAMP '2024-01-31 12:34:56' UNION ALL
  SELECT 'NOW/DAY', date_trunc('day', TIMESTAMP '2024-01-31 12:34:56') UNION ALL
  SELECT 'NOW/HOUR', date_trunc('hour', TIMESTAMP '2024-01-31 12:34:56') UNION ALL
  SELECT 'NOW+1DAY', TIMESTAMP '2024-01-31 12:34:56' + INTERVAL 1 DAY UNION ALL
  SELECT 'NOW-3HOURS', TIMESTAMP '2024-01-31 12:34:56' - INTERVAL 3 HOUR UNION ALL
  SELECT 'NOW/DAY-7DAYS',
         date_trunc('day', TIMESTAMP '2024-01-31 12:34:56') - INTERVAL 7 DAY UNION ALL
  SELECT 'NOW/MONTH', date_trunc('month', TIMESTAMP '2024-01-31 12:34:56') UNION ALL
  SELECT 'NOW/MONTH+1MONTH',
         date_trunc('month', TIMESTAMP '2024-01-31 12:34:56') + INTERVAL 1 MONTH UNION ALL
  SELECT 'NOW-90MINUTES/MINUTE',
         date_trunc('minute', TIMESTAMP '2024-01-31 12:34:56' - INTERVAL 90 MINUTE))
SELECT expr, CAST(epoch(b) AS BIGINT) AS ts_epoch,
       (SELECT count(*) FROM events e WHERE e.ts >= bounds.b) AS n_after
FROM bounds ORDER BY expr
"""


def q_ord_rank(spark, sf_dir):
    """ord(f): 1-based rank in the sorted distinct value space
    (OrdFieldSource)."""
    from .functions.valuesources import ord_rank

    c = _t(spark, sf_dir, "customer")
    return ord_rank(c, "c_mktsegment").orderBy("ord")


SQL_ORD_RANK = """
SELECT c_mktsegment, CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS INT) AS ord
FROM (SELECT DISTINCT c_mktsegment FROM customer) t ORDER BY ord
"""


def q_geodist(spark, sf_dir):
    """geodist() haversine over synthetic nation coordinates (deterministic
    arithmetic on n_nationkey, reproduced in the oracle)."""
    from .functions.valuesources import geodist_km

    n = _t(spark, sf_dir, "nation")
    lat = (F.col("n_nationkey") * 7 % 120 - 60).cast("double")
    lon = (F.col("n_nationkey") * 13 % 340 - 170).cast("double")
    d = geodist_km(lat, lon, F.lit(48.8566), F.lit(2.3522))
    return (
        n.select("n_nationkey", F.round(d, 2).alias("dist_km"))
        .orderBy("dist_km", "n_nationkey")
        .limit(10)
    )


SQL_GEODIST = """
SELECT n_nationkey, ROUND(dist_km, 2) AS dist_km FROM (
  SELECT n_nationkey,
         2 * 6371.0087714 * asin(sqrt(
           pow(sin(radians(48.8566 - CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE)) / 2), 2)
           + cos(radians(CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE))) * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - CAST(n_nationkey * 13 % 340 - 170 AS DOUBLE)) / 2), 2)
         )) AS dist_km
  FROM nation) t
ORDER BY dist_km, n_nationkey LIMIT 10
"""


# --------------------------------------------------------------------------
# math evaluators (io/eval family — operators/matheval.py)
# --------------------------------------------------------------------------

def q_stream_regress(spark, sf_dir):
    """regress(): simple OLS of l_extendedprice on l_quantity, one agg."""
    from .operators import matheval as ME

    out = ME.regress_stream(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )
    return out.select(
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 8).alias("r2"),
    )


SQL_STREAM_REGRESS = """
SELECT ROUND(covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity), 4) AS slope,
       ROUND(avg(l_extendedprice)
             - covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity)
               * avg(l_quantity), 4) AS intercept,
       ROUND(corr(l_quantity, l_extendedprice)
             * corr(l_quantity, l_extendedprice), 8) AS r2
FROM lineitem
"""


def q_stream_corr(spark, sf_dir):
    """corr()/cov() evaluators in one agg."""
    from .operators import matheval as ME

    out = ME.corr_stream(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )
    return out.select(
        F.round("corr", 8).alias("corr"), F.round("cov", 4).alias("cov")
    )


SQL_STREAM_CORR = """
SELECT ROUND(corr(l_quantity, l_extendedprice), 8) AS corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov
FROM lineitem
"""


def q_stream_describe(spark, sf_dir):
    """describe(): one-row summary with exact interpolated quartiles."""
    from .operators import matheval as ME

    out = ME.describe_stream(_t(spark, sf_dir, "events"), "value")
    return out.select(
        "n",
        F.round("mean", 4).alias("mean"),
        F.round("stddev", 4).alias("stddev"),
        F.round("min", 4).alias("min"),
        F.round("p25", 4).alias("p25"),
        F.round("p50", 4).alias("p50"),
        F.round("p75", 4).alias("p75"),
        F.round("max", 4).alias("max"),
    )


SQL_STREAM_DESCRIBE = """
SELECT count(value) AS n,
       ROUND(avg(value), 4) AS mean,
       ROUND(stddev_samp(value), 4) AS stddev,
       ROUND(min(value), 4) AS min,
       ROUND(quantile_cont(value, 0.25), 4) AS p25,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.75), 4) AS p75,
       ROUND(max(value), 4) AS max
FROM events
"""


def q_stream_hist(spark, sf_dir):
    """hist(): 10 equal-width bins over [0, 500) with edge clamping."""
    from .operators import matheval as ME

    return ME.hist_stream(
        _t(spark, sf_dir, "events"), "value", 0.0, 500.0, 10
    )


SQL_STREAM_HIST = """
SELECT CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9) AS INT) AS bin,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY bin
"""


def q_stream_conv(spark, sf_dir):
    """conv(): [0.25, 0.5, 0.25] smoothing of the daily event-count
    series (zero-padded same-length convolution, one window)."""
    from .operators import matheval as ME

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    out = ME.conv_stream(daily, "day", "n", [0.25, 0.5, 0.25])
    return out.select(
        F.unix_timestamp("day").alias("day_ts"),
        F.col("n").cast("long").alias("n"),
        F.round("conv", 4).alias("conv"),
    ).orderBy("day_ts")


SQL_STREAM_CONV = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1)
SELECT day_ts, CAST(n AS BIGINT) AS n,
       ROUND(0.25 * coalesce(lag(n) OVER w, 0)
             + 0.5 * n
             + 0.25 * coalesce(lead(n) OVER w, 0), 4) AS conv
FROM daily WINDOW w AS (ORDER BY day_ts) ORDER BY day_ts
"""


def q_stream_ttest(spark, sf_dir):
    """ttest(): Welch two-sample on value between click and error events.
    Rows-only (the p-value needs the regularized incomplete beta, outside
    ANSI SQL; betainc itself is closed-form tested in test_matheval.py)."""
    from .operators import matheval as ME

    r = ME.ttest_ind(
        _t(spark, sf_dir, "events"), "event_type", "value", "click", "error"
    )
    return spark.createDataFrame(
        [(round(r["t"], 6), round(r["df"], 2), round(r["p"], 6))],
        "t double, df double, p double",
    )


def q_stream_anova(spark, sf_dir):
    """anova(): one-way F across all event types. Rows-only (p-value)."""
    from .operators import matheval as ME

    r = ME.anova_oneway(_t(spark, sf_dir, "events"), "event_type", "value")
    return spark.createDataFrame(
        [(round(r["F"], 6), r["df1"], r["df2"], round(r["p"], 6))],
        "F double, df1 double, df2 double, p double",
    )


def q_stream_norm_cdf(spark, sf_dir):
    """normalDistribution().cumulativeProbability(): Column-level normal
    CDF via the A&S 7.1.26 erf approximation — the identical arithmetic is
    mirrored in the oracle SQL, so values match to the rounding digit."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return ev.select(
        "event_id",
        F.round(
            ME.norm_cdf_col(F.col("value"), mu=50.0, sigma=20.0), 6
        ).alias("cdf"),
    ).orderBy("event_id")


SQL_STREAM_NORM_CDF = """
WITH z AS (
  SELECT event_id, (value - 50.0) / (20.0 * sqrt(2.0)) AS x
  FROM events WHERE event_id < 20),
e AS (
  SELECT event_id, x, abs(x) AS ax,
         1.0 / (1.0 + 0.3275911 * abs(x)) AS t
  FROM z),
erf AS (
  SELECT event_id, x,
         1.0 - (0.254829592 * t - 0.284496736 * t * t
                + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
                + 1.061405429 * t * t * t * t * t) * exp(-ax * ax) AS y
  FROM e)
SELECT event_id,
       ROUND(0.5 * (1.0 + CASE WHEN x < 0 THEN -y ELSE y END), 6) AS cdf
FROM erf ORDER BY event_id
"""


def q_stream_moving_avg(spark, sf_dir):
    """movingAvg(series, 7): trailing 7-day mean of the daily event-count
    series; null until the first full window (Solr emits full windows
    only — SURVEY.md §3.9 math evaluators, MovingAverageEvaluator)."""
    from .operators import matheval as ME

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    out = ME.moving_avg_stream(daily, "day", "n", 7)
    return out.select(
        F.unix_timestamp("day").alias("day_ts"),
        F.col("n").cast("long").alias("n"),
        F.round("moving_avg", 6).alias("moving_avg"),
    ).orderBy("day_ts")


SQL_STREAM_MOVING_AVG = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1)
SELECT day_ts, CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN row_number() OVER w >= 7
             THEN avg(n) OVER (ORDER BY day_ts
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             END, 6) AS moving_avg
FROM daily WINDOW w AS (ORDER BY day_ts) ORDER BY day_ts
"""


def q_stream_diff(spark, sf_dir):
    """diff(series, 1): lag-1 differencing of the daily event-count
    series (DiffEvaluator); the first row has no predecessor -> null."""
    from .operators import matheval as ME

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    out = ME.diff_stream(daily, "day", "n", 1)
    return out.select(
        F.unix_timestamp("day").alias("day_ts"),
        F.col("n").cast("long").alias("n"),
        F.col("diff").cast("long").alias("diff"),
    ).orderBy("day_ts")


SQL_STREAM_DIFF = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1)
SELECT day_ts, CAST(n AS BIGINT) AS n,
       CAST(n - lag(n) OVER (ORDER BY day_ts) AS BIGINT) AS diff
FROM daily ORDER BY day_ts
"""


REGISTRY_RELATIONAL: dict[str, tuple] = {
    "stream_regress": (q_stream_regress, SQL_STREAM_REGRESS),
    "stream_moving_avg": (q_stream_moving_avg, SQL_STREAM_MOVING_AVG),
    "stream_diff": (q_stream_diff, SQL_STREAM_DIFF),
    "stream_corr": (q_stream_corr, SQL_STREAM_CORR),
    "stream_describe": (q_stream_describe, SQL_STREAM_DESCRIBE),
    "stream_hist": (q_stream_hist, SQL_STREAM_HIST),
    "stream_conv": (q_stream_conv, SQL_STREAM_CONV),
    "stream_ttest": (q_stream_ttest, None),
    "stream_anova": (q_stream_anova, None),
    "stream_norm_cdf": (q_stream_norm_cdf, SQL_STREAM_NORM_CDF),
    "facet_field_counts": (q_facet_field, SQL_FACET_FIELD),
    "facet_field_params": (q_facet_field_params, SQL_FACET_FIELD_PARAMS),
    "facet_field_index_sort": (q_facet_field_index, SQL_FACET_FIELD_INDEX),
    "facet_range_histogram": (q_facet_range, SQL_FACET_RANGE),
    "facet_query_counts": (q_facet_query, SQL_FACET_QUERY),
    "facet_pivot": (q_facet_pivot, SQL_FACET_PIVOT),
    "facet_rollup_totals": (q_facet_rollup, SQL_FACET_ROLLUP),
    "facet_interval": (q_facet_interval, SQL_FACET_INTERVAL),
    "stats_component": (q_stats_component, SQL_STATS_COMPONENT),
    "stats_percentiles": (q_percentiles, SQL_PERCENTILES),
    "unique_agg": (q_unique_agg, SQL_UNIQUE_AGG),
    "json_facet_nested": (q_json_facet_nested, SQL_JSON_FACET_NESTED),
    "json_facet_block_domain": (
        q_json_facet_block_domain,
        SQL_JSON_FACET_BLOCK_DOMAIN,
    ),
    "timeseries_day": (q_timeseries, SQL_TIMESERIES),
    "search_export": (q_search_export, SQL_SEARCH_EXPORT),
    "rollup_stream": (q_rollup_stream, SQL_ROLLUP_STREAM),
    "having_stream": (q_having_stream, SQL_HAVING_STREAM),
    "top_stream": (q_top_stream, SQL_TOP_STREAM),
    "unique_stream": (q_unique_stream, SQL_UNIQUE_STREAM),
    "random_stream": (q_random_stream, SQL_RANDOM_STREAM),
    "reduce_stream": (q_reduce_stream, SQL_REDUCE_STREAM),
    "sessionize_events": (q_sessionize, SQL_SESSIONIZE),
    "select_eval": (q_select_eval, SQL_SELECT_EVAL),
    "merge_stream": (q_merge_stream, SQL_MERGE_STREAM),
    "cartesian_product": (q_cartesian_product, SQL_CARTESIAN_PRODUCT),
    "fetch_stream": (q_fetch_stream, SQL_FETCH_STREAM),
    "significant_terms": (q_significant_terms, SQL_SIGNIFICANT_TERMS),
    "hash_join": (q_hash_join, SQL_HASH_JOIN),
    "outer_hash_join": (q_outer_join, SQL_OUTER_JOIN),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "join_score_mode": (q_join_score_mode, SQL_JOIN_SCORE_MODE),
    "block_join_parent": (q_block_join_parent, SQL_BLOCK_JOIN_PARENT),
    "block_join_children": (q_block_join_children, SQL_BLOCK_JOIN_CHILDREN),
    "graph_gather_nodes": (q_graph_2hop, SQL_GRAPH_2HOP),
    "collapse_field": (q_collapse, SQL_COLLAPSE),
    "expand_groups": (q_expand, SQL_EXPAND),
    "grouping_two_pass": (q_grouping_two_pass, SQL_GROUPING_TWO_PASS),
    "rerank_topn": (q_rerank, SQL_RERANK),
    "diversified_topk": (q_diversified_topk, SQL_DIVERSIFIED_TOPK),
    "more_like_this": (q_mlt, SQL_MLT),
    "mlt_interesting_terms": (q_mlt_interesting_terms, SQL_MLT_INTERESTING_TERMS),
    "sql_handler": (q_sql_handler, SQL_SQL_HANDLER),
    "function_recip_freshness": (q_function_recip, SQL_FUNCTION_RECIP),
    "function_scale": (q_scale_function, SQL_SCALE_FUNCTION),
    "function_strdist": (q_strdist, SQL_STRDIST),
    "function_date_trunc": (q_date_math, SQL_DATE_MATH),
    "function_date_math": (q_date_math_fn, SQL_DATE_MATH_FN),
    "function_ord_rank": (q_ord_rank, SQL_ORD_RANK),
    "function_geodist": (q_geodist, SQL_GEODIST),
    "geo_box_query": (q_geo_box, SQL_GEO_BOX),
    "geo_polygon_query": (q_geo_polygon, SQL_GEO_POLYGON),
    "facet_heatmap": (q_facet_heatmap, SQL_FACET_HEATMAP),
    "facet_sampled": (q_facet_sampled, SQL_FACET_SAMPLED),
    "unique_block_agg": (q_unique_block, SQL_UNIQUE_BLOCK),
    "relatedness_agg": (q_relatedness, SQL_RELATEDNESS),
    "score_nodes": (q_score_nodes, SQL_SCORE_NODES),
}


# ---------------------------------------------------------------------------
# PageRank (power iteration) — the graph-analytics companion to
# gatherNodes/scoreNodes; 3 unrolled iterations so the oracle can restate
# the exact arithmetic
# ---------------------------------------------------------------------------

def q_pagerank(spark, sf_dir):
    """PageRank over a 3-tier supplier -> nation -> region graph (node ids
    prefixed 's'/'n'/'r' so integer keys from different tables never
    collide). d=0.85, 3 iterations, dangling mass dropped — the oracle
    unrolls the identical recurrence."""
    from .operators.graph import pagerank

    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 60)
    na = _t(spark, sf_dir, "nation")
    e1 = s.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    e2 = na.select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    out = pagerank(edges, "src", "dst", iters=3, damping=0.85)
    return out.orderBy(F.desc("pagerank"), F.asc("node")).limit(30)


def _sql_pagerank() -> str:
    head = """
WITH e AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS src,
         'n' || CAST(s_nationkey AS VARCHAR) AS dst
  FROM supplier WHERE s_suppkey < 60
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR),
         'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
p0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    iters = []
    for i in range(1, 4):
        iters.append(f""",
c{i} AS (SELECT e.dst AS node, sum(p.pr / od.outdeg) AS c
        FROM e JOIN p{i-1} p ON p.node = e.src JOIN od ON od.src = e.src
        GROUP BY e.dst),
p{i} AS (SELECT nodes.node,
              FLOOR(((1 - 0.85) / nn.n + 0.85 * COALESCE(c{i}.c, 0))
                    * 1e12 + 0.5) / 1e12 AS pr
        FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node, nn)""")
    # the per-iteration 1e-12 lattice + the floor-form final rounding make
    # the value IEEE-deterministic across engines (see operators/graph.py
    # pagerank docstring — plain ROUND splits on boundary values)
    tail = """
SELECT node, FLOOR(pr * 1e6 + 0.5) / 1e6 AS pagerank FROM p3
ORDER BY pagerank DESC, node LIMIT 30
"""
    return head + "".join(iters) + tail


SQL_PAGERANK = _sql_pagerank()

REGISTRY_RELATIONAL["graph_pagerank"] = (q_pagerank, SQL_PAGERANK)


def q_bfs_levels(spark, sf_dir):
    """shortestPath() generalized to a full BFS level table (graph.py
    bfs_levels; ShortestPathStream.java ≈L60): min hop count from the
    customer seeds over the customer->order->part edge graph."""
    from .operators.graph import bfs_levels

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    e1 = o.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    sources = c.filter(F.col("c_custkey") < 3).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    out = bfs_levels(edges, "src", "dst", sources, max_depth=2)
    return out.orderBy("depth", "node")


SQL_BFS_LEVELS = """
WITH RECURSIVE e AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         'o' || CAST(o_orderkey AS VARCHAR) AS dst FROM orders
  UNION ALL
  SELECT 'o' || CAST(l_orderkey AS VARCHAR),
         'p' || CAST(l_partkey AS VARCHAR) FROM lineitem),
walk(node, depth) AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR), 0 FROM customer WHERE c_custkey < 3
  UNION
  SELECT e.dst, w.depth + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.depth < 2)
SELECT node, MIN(depth) AS depth FROM walk GROUP BY node
ORDER BY depth, node
"""


def q_drill_sideways(spark, sf_dir):
    """DrillSideways.java ≈L60: per-dimension facet counts with the OTHER
    dimensions' drill-downs applied but the dimension's own excluded."""
    from .operators.facets import drill_sideways

    p = _t(spark, sf_dir, "part")
    return drill_sideways(
        p, {"p_brand": "Brand#4", "p_type": "MEDIUM"}, limit=5
    )


SQL_DRILL_SIDEWAYS = """
WITH b AS (
  SELECT 'p_brand' AS dim, p_brand AS facet_value, count(*) AS count,
         row_number() OVER (ORDER BY count(*) DESC, p_brand ASC) AS rk
  FROM part WHERE p_type = 'MEDIUM' AND p_brand IS NOT NULL GROUP BY p_brand),
t AS (
  SELECT 'p_type' AS dim, p_type AS facet_value, count(*) AS count,
         row_number() OVER (ORDER BY count(*) DESC, p_type ASC) AS rk
  FROM part WHERE p_brand = 'Brand#4' AND p_type IS NOT NULL GROUP BY p_type)
SELECT dim, facet_value, count FROM (
  SELECT * FROM b WHERE rk <= 5 UNION ALL SELECT * FROM t WHERE rk <= 5)
ORDER BY dim, count DESC, facet_value ASC
"""


REGISTRY_RELATIONAL["graph_shortest_path"] = (q_bfs_levels, SQL_BFS_LEVELS)
REGISTRY_RELATIONAL["drill_sideways"] = (q_drill_sideways, SQL_DRILL_SIDEWAYS)


# --------------------------------------------------------------------------
# round-4 math-evaluator long tail (operators/matheval.py additions)
# --------------------------------------------------------------------------

def q_stream_transpose(spark, sf_dir):
    """matrix()/transpose() evaluators: transpose the first 4 embedding
    rows, emitted exploded as (i, j, x) scalars (output[i][j] == input
    row j's component i) so the value hash covers every cell."""
    from .operators import matheval as ME

    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    t = ME.transpose_matrix(emb, "embedding", "vec_id")
    return (
        t.select("i", F.posexplode("row").alias("j", "x"))
        .select("i", "j", F.round("x", 4).alias("x"))
        .orderBy("i", "j")
    )


SQL_STREAM_TRANSPOSE = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings WHERE vec_id < 4),
r AS (SELECT vec_id, i, x,
             row_number() OVER (PARTITION BY i ORDER BY vec_id) - 1 AS j
      FROM e)
SELECT i, j, ROUND(x, 4) AS x FROM r ORDER BY i, j
"""


def q_stream_unitize(spark, sf_dir):
    """unit()/unitize() evaluator: L2-normalize each embedding, exploded
    to (vec_id, i, u) scalars."""
    from .operators import matheval as ME

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 6)
    return (
        emb.select(
            "vec_id",
            F.posexplode(
                ME.unitize_col(F.col("embedding").cast("array<double>"))
            ).alias("i", "u"),
        )
        .select("vec_id", "i", F.round("u", 6).alias("u"))
        .orderBy("vec_id", "i")
    )


SQL_STREAM_UNITIZE = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings WHERE vec_id < 6),
n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY vec_id)
SELECT e.vec_id, e.i, ROUND(e.x / n.nrm, 6) AS u
FROM e JOIN n USING (vec_id) ORDER BY e.vec_id, e.i
"""


def q_stream_predict(spark, sf_dir):
    """predict() on a stored regression model: fit OLS of
    l_extendedprice ~ l_quantity (regress_stream), bind the two scalar
    coefficients (model state, the documented scalar collect), then
    apply predict_col over the stream."""
    from .operators import matheval as ME

    li = _t(spark, sf_dir, "lineitem")
    m = ME.regress_stream(li, "l_quantity", "l_extendedprice").first()
    pred = ME.predict_col(
        F.col("l_quantity").cast("double"), m["slope"], m["intercept"]
    )
    return (
        li.filter((F.col("l_orderkey") <= 160) & (F.col("l_linenumber") == 1))
        .select(
            "l_orderkey",
            F.round(pred, 4).alias("predicted"),
        )
        .orderBy("l_orderkey")
    )


SQL_STREAM_PREDICT = """
WITH m AS (
  SELECT covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity) AS slope,
         avg(l_extendedprice)
           - covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity)
             * avg(l_quantity) AS intercept
  FROM lineitem)
SELECT l_orderkey,
       ROUND(m.slope * l_quantity + m.intercept, 4) AS predicted
FROM lineitem, m
WHERE l_orderkey <= 160 AND l_linenumber = 1
ORDER BY l_orderkey
"""


def q_stream_expon_cdf(spark, sf_dir):
    """exponentialDistribution(rate=0.02).cumulativeProbability(value):
    closed-form Column, identical arithmetic in the oracle."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return ev.select(
        "event_id",
        F.round(
            ME.expon_cdf_col(F.col("value").cast("double"), 0.02), 8
        ).alias("cdf"),
    ).orderBy("event_id")


SQL_STREAM_EXPON_CDF = """
SELECT event_id, ROUND(1.0 - exp(-0.02 * value), 8) AS cdf
FROM events WHERE event_id < 20 ORDER BY event_id
"""


def q_stream_poisson_pmf(spark, sf_dir):
    """poissonDistribution(3.0).probability(k), k = event_id % 8 —
    exact factorial in a long on both sides."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return ev.select(
        "event_id",
        F.round(
            ME.poisson_pmf_col((F.col("event_id") % 8).cast("int"), 3.0), 8
        ).alias("pmf"),
    ).orderBy("event_id")


SQL_STREAM_POISSON_PMF = """
SELECT event_id,
       ROUND(exp(-3.0) * pow(3.0, CAST(event_id % 8 AS DOUBLE))
             / CAST(factorial(CAST(event_id % 8 AS INT)) AS DOUBLE), 8) AS pmf
FROM events WHERE event_id < 20 ORDER BY event_id
"""

def q_stream_zscores(spark, sf_dir):
    """zscores() evaluator: standardize events.value (ZScoresEvaluator
    .java) — one scalar agg broadcast over a codegen map."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    z = ME.zscores_stream(ev.select("event_id", "value"), "value")
    return z.select(
        "event_id", F.round("zscore", 6).alias("zscore")
    ).orderBy("event_id")


SQL_STREAM_ZSCORES = """
WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sd
           FROM events WHERE event_id < 200)
SELECT event_id, ROUND((value - s.mu) / s.sd, 6) AS zscore
FROM events, s WHERE event_id < 200 ORDER BY event_id
"""


def q_stream_minmax_scale(spark, sf_dir):
    """minMaxScale() evaluator over l_extendedprice -> [0, 1]."""
    from .operators import matheval as ME

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    m = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        li.crossJoin(F.broadcast(m))
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            F.round(
                ME.minmax_scale_col(
                    F.col("l_extendedprice"), F.col("lo"), F.col("hi")
                ),
                6,
            ).alias("scaled"),
        )
        .orderBy("l_orderkey")
    )


SQL_STREAM_MINMAX = """
WITH m AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
           FROM lineitem WHERE l_orderkey <= 400)
SELECT l_orderkey,
       ROUND((l_extendedprice - m.lo) / (m.hi - m.lo), 6) AS scaled
FROM lineitem, m
WHERE l_orderkey <= 400 AND l_linenumber = 1 ORDER BY l_orderkey
"""


def q_stream_ebe_ops(spark, sf_dir):
    """ebeAdd()/ebeMultiply(): element-wise algebra of each embedding
    with its successor vector (self-join on vec_id + 1), exploded to
    scalars so the hash covers every component."""
    from .operators import matheval as ME

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 9)
    a = e.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("a"))
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("b"),
    )
    j = a.join(b, "vec_id")
    return (
        j.select(
            "vec_id",
            F.posexplode(
                F.zip_with(
                    ME.ebe_add_col(F.col("a"), F.col("b")),
                    ME.ebe_multiply_col(F.col("a"), F.col("b")),
                    lambda s, p: F.struct(s.alias("s"), p.alias("p")),
                )
            ).alias("i", "sp"),
        )
        .select(
            "vec_id", "i",
            F.round(F.col("sp.s"), 6).alias("ebe_sum"),
            F.round(F.col("sp.p"), 6).alias("ebe_prod"),
        )
        .orderBy("vec_id", "i")
    )


SQL_STREAM_EBE = """
WITH a AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id < 9),
b AS (
  SELECT vec_id - 1 AS vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS y
  FROM embeddings WHERE vec_id < 9)
SELECT a.vec_id, a.i, ROUND(a.x + b.y, 6) AS ebe_sum,
       ROUND(a.x * b.y, 6) AS ebe_prod
FROM a JOIN b ON a.vec_id = b.vec_id AND a.i = b.i
ORDER BY a.vec_id, a.i
"""


def q_stream_dot_product(spark, sf_dir):
    """dotProduct() of consecutive embedding pairs."""
    from .operators import matheval as ME

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 17)
    a = e.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("a"))
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("b"),
    )
    return (
        a.join(b, "vec_id")
        .select(
            "vec_id",
            F.round(ME.dot_product_col(F.col("a"), F.col("b")), 6).alias("dot"),
        )
        .orderBy("vec_id")
    )


SQL_STREAM_DOT = """
WITH a AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id < 17),
b AS (
  SELECT vec_id - 1 AS vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS y
  FROM embeddings WHERE vec_id < 17)
SELECT a.vec_id, ROUND(sum(a.x * b.y), 6) AS dot
FROM a JOIN b ON a.vec_id = b.vec_id AND a.i = b.i
GROUP BY a.vec_id ORDER BY a.vec_id
"""


def q_stream_binomial_pmf(spark, sf_dir):
    """binomialDistribution(12, 0.3).probability(k), k = event_id % 13."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 40)
    return ev.select(
        "event_id",
        F.round(
            ME.binomial_pmf_col((F.col("event_id") % 13).cast("int"), 12, 0.3), 8
        ).alias("pmf"),
    ).orderBy("event_id")


SQL_STREAM_BINOMIAL = """
SELECT event_id,
       ROUND(CAST(factorial(12) AS DOUBLE)
             / (CAST(factorial(CAST(event_id % 13 AS INT)) AS DOUBLE)
                * CAST(factorial(12 - CAST(event_id % 13 AS INT)) AS DOUBLE))
             * pow(0.3, CAST(event_id % 13 AS DOUBLE))
             * pow(0.7, CAST(12 - event_id % 13 AS DOUBLE)), 8) AS pmf
FROM events WHERE event_id < 40 ORDER BY event_id
"""


def q_stream_uniform_cdf(spark, sf_dir):
    """uniformDistribution(0, 500).cumulativeProbability(value)."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 30)
    return ev.select(
        "event_id",
        F.round(
            ME.uniform_cdf_col(F.col("value").cast("double"), 0.0, 500.0), 8
        ).alias("cdf"),
    ).orderBy("event_id")


SQL_STREAM_UNIFORM = """
SELECT event_id,
       ROUND(LEAST(1.0, GREATEST(0.0, value / 500.0)), 8) AS cdf
FROM events WHERE event_id < 30 ORDER BY event_id
"""


def q_stream_geometric_pmf(spark, sf_dir):
    """geometricDistribution(0.35).probability(k), k = event_id % 10."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 30)
    return ev.select(
        "event_id",
        F.round(
            ME.geometric_pmf_col((F.col("event_id") % 10).cast("int"), 0.35), 8
        ).alias("pmf"),
    ).orderBy("event_id")


SQL_STREAM_GEOMETRIC = """
SELECT event_id,
       ROUND(pow(0.65, CAST(event_id % 10 AS DOUBLE)) * 0.35, 8) AS pmf
FROM events WHERE event_id < 30 ORDER BY event_id
"""


def q_stream_spearman(spark, sf_dir):
    """spearmansCorr(l_quantity, l_extendedprice): Pearson corr of the
    two average-tie rank vectors (commons-math NaturalRanking default)."""
    from .operators import matheval as ME

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    out = ME.spearman_corr_stream(li, "l_quantity", "l_extendedprice")
    return out.select(F.round("spearman", 8).alias("spearman"))


SQL_STREAM_SPEARMAN = """
WITH s AS (SELECT l_quantity AS x, l_extendedprice AS y
           FROM lineitem WHERE l_orderkey <= 300),
rn AS (SELECT x, y,
         row_number() OVER (ORDER BY x, y) AS nx,
         row_number() OVER (ORDER BY y, x) AS ny
       FROM s),
r AS (SELECT avg(nx) OVER (PARTITION BY x) AS rx,
             avg(ny) OVER (PARTITION BY y) AS ry
      FROM rn)
SELECT ROUND(corr(rx, ry), 8) AS spearman FROM r
"""


def q_stream_mann_whitney(spark, sf_dir):
    """mannWhitney(): U statistic of l_extendedprice between return
    flags 'R' and 'N' (pooled average-tie ranking, U = min(U1, U2))."""
    from .operators import matheval as ME

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    out = ME.mann_whitney_u_stream(li, "l_returnflag", "l_extendedprice", "R", "N")
    return out.select(F.round("u", 4).alias("u"))


SQL_STREAM_MANNWHITNEY = """
WITH two AS (
  SELECT l_returnflag AS g, l_extendedprice AS v
  FROM lineitem WHERE l_orderkey <= 200 AND l_returnflag IN ('R', 'N')),
rn AS (SELECT g, v, row_number() OVER (ORDER BY v) AS nv FROM two),
ranked AS (
  SELECT g, avg(nv) OVER (PARTITION BY v) AS r
  FROM rn),
agg AS (SELECT g, sum(r) AS rsum, count(*) AS n FROM ranked GROUP BY g)
SELECT ROUND(LEAST(
  (SELECT rsum - n * (n + 1) / 2.0 FROM agg WHERE g = 'R'),
  (SELECT rsum - n * (n + 1) / 2.0 FROM agg WHERE g = 'N')), 4) AS u
"""


def q_stream_chisq_dataset(spark, sf_dir):
    """chiSquareDataSet(): observed p_brand counts vs a uniform
    expectation over the brands present (equal totals by construction)."""
    from .operators import matheval as ME

    p = _t(spark, sf_dir, "part")
    obs = p.groupBy("p_brand").agg(F.count("*").cast("double").alias("obs"))
    tot = obs.agg(
        F.sum("obs").alias("t"), F.count("*").cast("double").alias("k")
    )
    oe = obs.crossJoin(F.broadcast(tot)).withColumn(
        "exp", F.col("t") / F.col("k")
    )
    out = ME.chisquare_dataset_stream(oe, "obs", "exp")
    return out.select(F.round("chisq", 6).alias("chisq"))


SQL_STREAM_CHISQ = """
WITH obs AS (SELECT p_brand, CAST(count(*) AS DOUBLE) AS o
             FROM part GROUP BY p_brand),
tot AS (SELECT sum(o) AS t, CAST(count(*) AS DOUBLE) AS k FROM obs)
SELECT ROUND(sum((o - t / k) * (o - t / k) / (t / k)), 6) AS chisq
FROM obs, tot
"""


def q_stream_corr_matrix(spark, sf_dir):
    """corr(matrix): pairwise Pearson matrix over three lineitem
    measures as (i, j, corr) rows — one map-side agg, |cols|^2 output."""
    from .operators import matheval as ME

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    out = ME.corr_matrix_stream(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    return out.select(
        "i", "j", F.round("corr", 8).alias("corr")
    ).orderBy("i", "j")


SQL_STREAM_CORRMATRIX = """
WITH s AS (SELECT l_quantity AS c0, l_extendedprice AS c1, l_discount AS c2
           FROM lineitem WHERE l_orderkey <= 500)
SELECT i, j, ROUND(CASE
    WHEN i = 0 AND j = 0 THEN corr(c0, c0) WHEN i = 0 AND j = 1 THEN corr(c0, c1)
    WHEN i = 0 AND j = 2 THEN corr(c0, c2) WHEN i = 1 AND j = 0 THEN corr(c1, c0)
    WHEN i = 1 AND j = 1 THEN corr(c1, c1) WHEN i = 1 AND j = 2 THEN corr(c1, c2)
    WHEN i = 2 AND j = 0 THEN corr(c2, c0) WHEN i = 2 AND j = 1 THEN corr(c2, c1)
    ELSE corr(c2, c2) END, 8) AS corr
FROM s CROSS JOIN (SELECT unnest([0,1,2]) AS i) CROSS JOIN (SELECT unnest([0,1,2]) AS j)
GROUP BY i, j ORDER BY i, j
"""


REGISTRY_RELATIONAL.update(
    {
        "stream_zscores": (q_stream_zscores, SQL_STREAM_ZSCORES),
        "stream_minmax_scale": (q_stream_minmax_scale, SQL_STREAM_MINMAX),
        "stream_ebe_ops": (q_stream_ebe_ops, SQL_STREAM_EBE),
        "stream_dot_product": (q_stream_dot_product, SQL_STREAM_DOT),
        "stream_binomial_pmf": (q_stream_binomial_pmf, SQL_STREAM_BINOMIAL),
        "stream_uniform_cdf": (q_stream_uniform_cdf, SQL_STREAM_UNIFORM),
        "stream_geometric_pmf": (q_stream_geometric_pmf, SQL_STREAM_GEOMETRIC),
        "stream_spearman": (q_stream_spearman, SQL_STREAM_SPEARMAN),
        "stream_mann_whitney": (q_stream_mann_whitney, SQL_STREAM_MANNWHITNEY),
        "stream_chisq_dataset": (q_stream_chisq_dataset, SQL_STREAM_CHISQ),
        "stream_corr_matrix": (q_stream_corr_matrix, SQL_STREAM_CORRMATRIX),
    }
)


REGISTRY_RELATIONAL.update(
    {
        "stream_matrix_transpose": (q_stream_transpose, SQL_STREAM_TRANSPOSE),
        "stream_unitize": (q_stream_unitize, SQL_STREAM_UNITIZE),
        "stream_predict": (q_stream_predict, SQL_STREAM_PREDICT),
        "stream_expon_cdf": (q_stream_expon_cdf, SQL_STREAM_EXPON_CDF),
        "stream_poisson_pmf": (q_stream_poisson_pmf, SQL_STREAM_POISSON_PMF),
    }
)
