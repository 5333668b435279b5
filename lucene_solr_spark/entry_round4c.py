"""Round-4 continuation entries, tranche C.

TPC-H completion for the SQLHandler tier (SURVEY.md §3.10 — the
reference's Parallel SQL layer; de-facto spec TestSQLHandler.java
~2500 LoC). Rounds 3-4 landed Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q13/Q14/Q18; this
tranche adds every remaining query expressible over the synthetic
schema: Q8, Q12, Q15, Q17, Q19, Q21, Q22. Q2/Q9/Q11/Q16/Q20 need the
partsupp table, which the driver's synthetic schema does not generate —
documented as out-of-schema, not skipped silently.

Adaptations (same plan SHAPE, available columns):
  * Q12 — no l_shipmode/l_commitdate/l_receiptdate: the mode column is
    l_returnflag, "late" is l_shipdate > o_orderdate + 60 days.
  * Q17 — no p_container: the part predicate is p_brand + p_type.
  * Q19 — no l_shipmode/l_shipinstruct: the three OR branches keep the
    (brand, size-range, quantity-range) structure.
  * Q21 — no l_commitdate/l_receiptdate: "kept waiting" is
    l_shipdate > o_orderdate + 90 days; the EXISTS/NOT-EXISTS
    multi-supplier structure is faithful.
  * Q22 — no c_phone: country code is c_nationkey; the
    above-positive-average + NOT EXISTS(orders) structure is faithful.

Money discipline as the rest of the family: accumulate exact cents
(round(x*100) AS BIGINT), divide by 100.0 once at the end — bit-stable
under any partitioning, which is what makes the value-hash reproducible
on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .entry_round4 import _t


def _cents(col):
    return F.round(col * 100).cast("bigint")


_REV_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q8 — national market share: NATION_1's share of AMERICA-market revenue
# for ECONOMY parts, by order year. Plan: the only wide exchange is
# lineitem x orders on the order key; part / customer / supplier / both
# nation maps / region are all broadcast dims; the share is a
# conditional-sum ratio inside ONE agg (no second pass).
# ---------------------------------------------------------------------------
def q_tpch_q8(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nat = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    g = (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0))).alias("nat_cents"),
            F.sum(vol).alias("all_cents"),
        )
    )
    return g.select(
        "o_year",
        F.round(F.col("nat_cents") / F.col("all_cents"), 6).alias("mkt_share"),
    ).orderBy("o_year")


SQL_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_CENTS} ELSE 0 END)
             * 1.0 / sum({_REV_CENTS}), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-mode / priority matrix (adapted): per l_returnflag,
# count late lineitems (shipped > 60 days after order) in high-priority
# orders vs the rest. ONE fact-fact join on the order key, conditional
# counts in one agg.
# ---------------------------------------------------------------------------
def q_tpch_q12(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue. The spec's scalar
# subquery (= max(total_revenue)) is a 1-row broadcast cross-join onto
# the per-supplier agg — never a global sort; ties all surface.
# ---------------------------------------------------------------------------
def q_tpch_q15(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx")).drop("mx")
    return (
        top.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_CENTS}) AS DOUBLE) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (adapted part predicate): average
# yearly revenue lost if sub-20%-of-average-quantity orders were not
# taken. Per-part averages are a REUSED aggregation over the same
# broadcast-pruned scan; the fact side joins the tiny per-part avg table
# broadcast (at 10^12 rows the avg table is |parts-in-brand| rows).
# ---------------------------------------------------------------------------
def q_tpch_q17(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    lp = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avgq = lp.groupBy("p_partkey").agg((0.2 * F.avg("l_quantity")).alias("q_thresh"))
    small = lp.join(
        F.broadcast(avgq.withColumnRenamed("p_partkey", "a_key")),
        (F.col("p_partkey") == F.col("a_key")) & (F.col("l_quantity") < F.col("q_thresh")),
    )
    return small.agg(
        F.round(F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0, 6).alias("avg_yearly")
    )


SQL_TPCH_Q17 = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 6)
         AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue over three (brand, size, quantity) OR
# branches (adapted: no shipmode/shipinstruct legs). The disjunction
# folds into the broadcast-join filter — one scan, one agg, no
# union-of-three-scans.
# ---------------------------------------------------------------------------
def q_tpch_q19(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q19 = f"""
SELECT CAST(sum({_REV_CENTS}) AS DOUBLE) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted lateness): for
# finished orders, count per supplier the lineitems that shipped > 90
# days after the order date, where ANOTHER supplier contributed to the
# same order (EXISTS) but no OTHER supplier was also late (NOT EXISTS).
# Plan: the (orderkey, suppkey) pair sets are distinct-reduced BEFORE
# the semi/anti joins, all three joins share the l_orderkey hash
# partitioning, top-100 via TakeOrderedAndProject.
# ---------------------------------------------------------------------------
def q_tpch_q21(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late_pairs = late.distinct()
    other = pairs.withColumnRenamed("l_suppkey", "o_supp")
    other_late = late_pairs.withColumnRenamed("l_suppkey", "ol_supp").withColumnRenamed(
        "l_orderkey", "ol_order"
    )
    cand = late.join(
        other,
        (late["l_orderkey"] == other["l_orderkey"]) & (F.col("o_supp") != late["l_suppkey"]),
        "left_semi",
    )
    cand = cand.join(
        other_late,
        (cand["l_orderkey"] == F.col("ol_order")) & (F.col("ol_supp") != cand["l_suppkey"]),
        "left_anti",
    )
    g = cand.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))
    return (
        g.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


SQL_TPCH_Q21 = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted country code = c_nationkey;
# the NOT-EXISTS subquery is date-windowed to "no orders since
# 2000-06-01" so the answer set is non-vacuous on the synthetic order
# density — the spec's unwindowed form is the cutoff at -infinity):
# customers from 5 countries with above-positive-average balances and no
# recent orders. The average is ONE scalar broadcast; the no-orders test
# is a left-anti join on the customer key; final group-by is 5 rows.
# ---------------------------------------------------------------------------
def q_tpch_q22(spark, sf_dir):
    keys = [1, 3, 5, 7, 9]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-06-01")
        .select("o_custkey")
    )
    cand = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        cand.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_TPCH_Q22 = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (
    SELECT avg(c_acctbal) FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY cntrycode ORDER BY cntrycode
"""


REGISTRY_R4C = {
    "tpch_q8_market_share": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q12_priority_lateness": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q15_top_supplier": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q17_small_qty_revenue": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q19_discounted_revenue": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q21_waiting_suppliers": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q22_sales_opportunity": (q_tpch_q22, SQL_TPCH_Q22),
}


# ===========================================================================
# Tranche: math-evaluator distributions, markovChain, series calculus,
# monteCarlo, fft, dbscan (SURVEY §3.9 — solr/solrj/.../io/eval).
# ===========================================================================


def q_stream_weibull_cdf(spark, sf_dir):
    """weibullDistribution(k, λ).cumulativeProbability — closed form as
    pure Column arithmetic; the identical formula is the oracle."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return ev.select(
        "event_id",
        F.round(ME.weibull_cdf_col(F.col("value"), 1.5, 60.0), 6).alias("cdf"),
    ).orderBy("event_id")


SQL_WEIBULL_CDF = """
SELECT event_id,
       ROUND(CASE WHEN value < 0 THEN 0.0
                  ELSE 1.0 - exp(-pow(value / 60.0, 1.5)) END, 6) AS cdf
FROM events WHERE event_id < 20 ORDER BY event_id
"""


def q_stream_lognormal_cdf(spark, sf_dir):
    """logNormalDistribution(μ, σ).cumulativeProbability via the shared
    A&S erf (exact arithmetic restated in SQL, as stream_norm_cdf)."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return ev.select(
        "event_id",
        F.round(
            ME.lognormal_cdf_col(F.col("value"), 3.5, 0.9), 6
        ).alias("cdf"),
    ).orderBy("event_id")


SQL_LOGNORMAL_CDF = """
WITH z AS (
  SELECT event_id, value,
         CASE WHEN value > 0
              THEN (ln(value) - 3.5) / (0.9 * sqrt(2.0)) ELSE 0.0 END AS x
  FROM events WHERE event_id < 20),
e AS (
  SELECT event_id, value, x, abs(x) AS ax,
         1.0 / (1.0 + 0.3275911 * abs(x)) AS t
  FROM z),
erf AS (
  SELECT event_id, value, x,
         1.0 - (0.254829592 * t - 0.284496736 * t * t
                + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
                + 1.061405429 * t * t * t * t * t) * exp(-ax * ax) AS y
  FROM e)
SELECT event_id,
       ROUND(CASE WHEN value <= 0 THEN 0.0
                  ELSE 0.5 * (1.0 + CASE WHEN x < 0 THEN -y ELSE y END)
             END, 6) AS cdf
FROM erf ORDER BY event_id
"""


def q_stream_zipf_pmf(spark, sf_dir):
    """zipFDistribution(N=100, s=1.07).probability(k), k=1..20 — pure
    generator; the harmonic normalizer is one `aggregate` expression."""
    from .operators import matheval as ME

    return ME.zipf_pmf_df(spark, n=100, exponent=1.07, k_max=20)


SQL_ZIPF_PMF = """
WITH h AS (
  SELECT sum(1.0 / pow(i, 1.07)) AS hn
  FROM generate_series(1, 100) t(i))
SELECT k, ROUND((1.0 / pow(k, 1.07)) / hn, 9) AS pmf
FROM generate_series(1, 20) t(k), h ORDER BY k
"""


def q_markov_chain_2step(spark, sf_dir):
    """markovChain(): transition matrix estimated from per-user ordered
    event streams, powered to 2 steps RELATIONALLY (join on the middle
    state) — the only way a 10^6-state chain powers on a cluster."""
    from .operators import matheval as ME

    return ME.markov_two_step(_t(spark, sf_dir, "events"))


SQL_MARKOV_2STEP = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events),
pairs AS (
  SELECT event_type AS src, nxt AS dst, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
tm AS (
  SELECT src, dst, n * 1.0 / sum(n) OVER (PARTITION BY src) AS p
  FROM pairs)
SELECT p1.src AS src, p2.dst AS dst, ROUND(sum(p1.p * p2.p), 9) AS p_two_step
FROM tm p1 JOIN tm p2 ON p1.dst = p2.src
GROUP BY p1.src, p2.dst ORDER BY src, dst
"""


def _daily_series(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
        .select(
            (F.unix_timestamp("day") / F.lit(86400.0)).alias("t"),
            "n",
        )
    )


_SQL_DAILY = """
  SELECT epoch(date_trunc('day', ts)) / 86400.0 AS t,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
"""


def q_stream_derivative(spark, sf_dir):
    """derivative(): central finite differences of the daily event-count
    series (one lag/lead window over the tiny aggregate)."""
    from .operators import matheval as ME

    return ME.derivative_stream(_daily_series(spark, sf_dir), "t", "n")


SQL_DERIVATIVE = f"""
WITH daily AS ({_SQL_DAILY}),
w AS (
  SELECT t, n,
         lag(n)  OVER (ORDER BY t) AS yp, lead(n) OVER (ORDER BY t) AS yn,
         lag(t)  OVER (ORDER BY t) AS tp, lead(t) OVER (ORDER BY t) AS tn
  FROM daily)
SELECT t,
       ROUND(CASE WHEN tp IS NULL THEN (yn - n) / (tn - t)
                  WHEN tn IS NULL THEN (n - yp) / (t - tp)
                  ELSE (yn - yp) / (tn - tp) END, 9) AS dydt
FROM w ORDER BY t
"""


def q_stream_integrate(spark, sf_dir):
    """integrate(): cumulative trapezoid of the daily series."""
    from .operators import matheval as ME

    return ME.integrate_stream(_daily_series(spark, sf_dir), "t", "n")


SQL_INTEGRATE = f"""
WITH daily AS ({_SQL_DAILY}),
s AS (
  SELECT t,
         COALESCE((n + lag(n) OVER (ORDER BY t)) / 2.0
                  * (t - lag(t) OVER (ORDER BY t)), 0.0) AS step
  FROM daily)
SELECT t, ROUND(sum(step) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9)
         AS integral
FROM s ORDER BY t
"""


def q_stream_oscillate(spark, sf_dir):
    """oscillate(A, ω, φ): A·sin(ωt + φ) at t = 0..63 — pure generator."""
    from .operators import matheval as ME

    return ME.oscillate_df(spark, 2.5, 0.3, 1.0, 64)


SQL_OSCILLATE = """
SELECT t, ROUND(2.5 * sin(0.3 * t + 1.0), 9) AS y
FROM generate_series(0, 63) g(t) ORDER BY t
"""


def q_stream_gamma_cdf(spark, sf_dir):
    """gammaDistribution(shape, scale).cumulativeProbability — the
    regularized lower incomplete gamma (series + continued fraction,
    published NR-style construction) in an Arrow-batched UDF. Rows-only:
    the iterative recurrence is not SQL-expressible; pytest pins the
    shape=1 case to the closed-form exponential CDF and monotonicity."""
    from .operators import matheval as ME

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20)
    return (
        ME.gamma_cdf_stream(ev, "value", shape=2.0, scale=30.0)
        .select("event_id", "cdf")
        .orderBy("event_id")
    )


def q_stream_monte_carlo(spark, sf_dir):
    """monteCarlo(): E[X·Y], X~N(10,3), Y~U(0,2) — 100k draws split
    across 16 tasks, each seeded (seed, partition_id): deterministic at
    ANY parallelism; ONE (sum, n) partial per task. Rows-only."""
    from .operators import matheval as ME

    return ME.monte_carlo_mean(spark)


def q_stream_fft(spark, sf_dir):
    """fft(): DFT magnitude spectrum of the daily event-count series
    (numpy rfft over the tiny aggregate). Rows-only; pytest pins the
    spectrum against a direct O(n²) DFT."""
    from .operators import matheval as ME

    return ME.fft_magnitudes(_daily_series(spark, sf_dir), "t", "n")


def q_ml_dbscan(spark, sf_dir):
    """dbscan() from scratch: eps-graph (JVM-side distances) -> degrees
    -> core flags -> min-label components -> border attach. Rows-only;
    pytest runs a numpy reference DBSCAN and requires identical clusters."""
    from .operators import ml as ML

    emb = _t(spark, sf_dir, "embeddings")
    return ML.dbscan_embeddings(emb, eps=1.22, min_pts=4)


REGISTRY_R4C.update(
    {
        "stream_weibull_cdf": (q_stream_weibull_cdf, SQL_WEIBULL_CDF),
        "stream_lognormal_cdf": (q_stream_lognormal_cdf, SQL_LOGNORMAL_CDF),
        "stream_zipf_pmf": (q_stream_zipf_pmf, SQL_ZIPF_PMF),
        "markov_chain_2step": (q_markov_chain_2step, SQL_MARKOV_2STEP),
        "stream_derivative": (q_stream_derivative, SQL_DERIVATIVE),
        "stream_integrate": (q_stream_integrate, SQL_INTEGRATE),
        "stream_oscillate": (q_stream_oscillate, SQL_OSCILLATE),
        "stream_gamma_cdf": (q_stream_gamma_cdf, None),
        "stream_monte_carlo": (q_stream_monte_carlo, None),
        "stream_fft": (q_stream_fft, None),
        "ml_dbscan": (q_ml_dbscan, None),
    }
)


# ===========================================================================
# Tranche: TermAutomatonQuery (lucene/sandbox) — token-graph NFA query.
# Automaton (start 0, accept {2}):
#   0 -hash->1, 0 -merge->1, 1 -join->2, 1 -table->3, 3 -scan->2,
#   0 -slow->4, 4 -ANY->1
# i.e. matches "hash join", "merge join", "hash table scan",
# "merge table scan", "slow ? join", "slow ? table scan". freq counts
# DISTINCT start positions with an accepting path (as the span/sloppy
# entries do); the oracle is the hand-unrolled union of the six paths.
# ===========================================================================


def q_term_automaton(spark, sf_dir):
    from .entry_queries import _tok
    from .operators.spans import term_automaton_query

    tok = _tok(spark, sf_dir)
    transitions = [
        (0, "hash", 1), (0, "merge", 1),
        (1, "join", 2), (1, "table", 3), (3, "scan", 2),
        (0, "slow", 4), (4, None, 1),
    ]
    out = term_automaton_query(tok, transitions, accept_states=[2])
    return out.orderBy(F.desc("freq"), F.asc("doc_id")).limit(50)


SQL_TERM_AUTOMATON = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
starts AS (
  -- hash|merge join
  SELECT t1.doc_id, t1.pos AS start
  FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.term IN ('hash', 'merge') AND t2.term = 'join'
  UNION
  -- hash|merge table scan
  SELECT t1.doc_id, t1.pos
  FROM tok t1
  JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
  WHERE t1.term IN ('hash', 'merge') AND t2.term = 'table'
    AND t3.term = 'scan'
  UNION
  -- slow ANY join
  SELECT t1.doc_id, t1.pos
  FROM tok t1 JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
  WHERE t1.term = 'slow' AND t3.term = 'join'
  UNION
  -- slow ANY table scan
  SELECT t1.doc_id, t1.pos
  FROM tok t1
  JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
  JOIN tok t4 ON t4.doc_id = t1.doc_id AND t4.pos = t1.pos + 3
  WHERE t1.term = 'slow' AND t3.term = 'table' AND t4.term = 'scan')
SELECT doc_id, count(*) AS freq
FROM starts GROUP BY doc_id
ORDER BY freq DESC, doc_id LIMIT 50
"""


REGISTRY_R4C.update(
    {
        "term_automaton_query": (q_term_automaton, SQL_TERM_AUTOMATON),
    }
)


# ===========================================================================
# Tranche: UpdateRequestProcessor index-time field mutations (SURVEY
# §3.11 last row — RegexReplaceProcessorFactory, TrimFieldUpdateProcessor,
# ConcatFieldUpdateProcessor, FirstFieldValueUpdateProcessor,
# UUIDUpdateProcessor; each ≈L40 in solr/core/.../update/processor/).
# One chained projection — every stage a built-in Column function, zero
# UDFs, fully codegen'd. The UUID stage is the documented deterministic
# variant (md5 of the doc key formatted as UUID) — Solr's random UUIDs
# can't be oracle-checked; content-derived ids are what a reproducible
# 10^12-doc pipeline wants anyway.
# ===========================================================================


def q_urp_field_mutations(spark, sf_dir):
    from .entry_round4 import _t as _tt

    d = _tt(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    clean = F.trim(
        F.regexp_replace(F.substring("text", 1, 60), " +", " ")
    )
    md5 = F.md5(F.col("doc_id").cast("string"))
    uuid = F.concat_ws(
        "-",
        F.substring(md5, 1, 8),
        F.substring(md5, 9, 4),
        F.substring(md5, 13, 4),
        F.substring(md5, 17, 4),
        F.substring(md5, 21, 12),
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.concat_ws("/", "lang", "source").alias("path"),
        F.split(clean, " ").getItem(0).alias("first_word"),
        uuid.alias("doc_uuid"),
    ).orderBy("doc_id")


SQL_URP_MUTATIONS = """
WITH base AS (
  SELECT doc_id, trim(regexp_replace(substr(text, 1, 60), ' +', ' ', 'g'))
           AS clean_text,
         lang || '/' || source AS path,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE doc_id < 20)
SELECT doc_id, clean_text, path,
       string_split(clean_text, ' ')[1] AS first_word,
       substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4)
         || '-' || substr(h,17,4) || '-' || substr(h,21,12) AS doc_uuid
FROM base ORDER BY doc_id
"""


REGISTRY_R4C.update(
    {
        "urp_field_mutations": (q_urp_field_mutations, SQL_URP_MUTATIONS),
    }
)


# ===========================================================================
# Tranche: multi-select faceting (tag/ex exclusion), block-join parent
# sort, def/map/exists function queries, let/get stream DAG reuse.
# ===========================================================================


def q_facet_exclude_tags(spark, sf_dir):
    """facet.field={!ex=st}o_orderstatus with fq={!tag=st}status='O' and
    fq=priority IN (URGENT,HIGH): the status filter is EXCLUDED from its
    own facet (multi-select UI semantics) — counts spread over ALL
    statuses while the result set itself stays filtered."""
    from .operators.facets import facet_exclude_tag
    from .entry_round4 import _t as _tt

    o = _tt(spark, sf_dir, "orders")
    filters = {
        "st": F.col("o_orderstatus") == "O",
        "prio": F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
    }
    return facet_exclude_tag(o, filters, "o_orderstatus", {"st"})


SQL_FACET_EXCLUDE_TAGS = """
SELECT o_orderstatus, count(*) AS n
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus ORDER BY n DESC, o_orderstatus
"""


def q_block_join_child_sort(spark, sf_dir):
    """ToParentBlockJoinSortField: open orders sorted by max child
    l_extendedprice (missing last), top 15."""
    from .operators.joins import block_join_parent_sort
    from .entry_round4 import _t as _tt

    o = _tt(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = _tt(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    out = block_join_parent_sort(
        o, li, "o_orderkey", F.col("l_extendedprice"), "max"
    )
    return (
        out.select("o_orderkey", F.round("child_sort", 2).alias("child_sort"))
        .orderBy(F.desc_nulls_last("child_sort"), F.asc("o_orderkey"))
        .limit(15)
    )


SQL_BLOCK_JOIN_CHILD_SORT = """
SELECT o_orderkey, ROUND(child_sort, 2) AS child_sort FROM (
  SELECT o_orderkey, (SELECT max(l_extendedprice) FROM lineitem
                      WHERE l_orderkey = o_orderkey) AS child_sort
  FROM orders WHERE o_orderstatus = 'O') t
ORDER BY child_sort DESC NULLS LAST, o_orderkey LIMIT 15
"""


def q_function_def_map_exists(spark, sf_dir):
    """def() / exists() / map() / if(lt()) value sources
    (ValueSourceParser ≈L700-850, RangeMapFloatFunction ≈L40) as pure
    Column expressions: seg = the segment unless MACHINERY (def over a
    nullif), map negative balances to 0, flag small accounts."""
    from .entry_round4 import _t as _tt

    c = _tt(spark, sf_dir, "customer").filter(F.col("c_custkey") < 30)
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.select(
        "c_custkey",
        F.coalesce(seg_or_null, F.lit("OTHER")).alias("seg_def"),
        seg_or_null.isNotNull().alias("seg_exists"),
        F.when(
            (F.col("c_acctbal") >= -1000.0) & (F.col("c_acctbal") <= 0.0),
            F.lit(0.0),
        ).otherwise(F.col("c_acctbal")).alias("bal_mapped"),
        F.when(F.col("c_acctbal") < 1000.0, F.lit("small"))
        .otherwise(F.lit("large")).alias("size_if"),
    ).orderBy("c_custkey")


SQL_FUNCTION_DEF_MAP_EXISTS = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_def,
       nullif(c_mktsegment, 'MACHINERY') IS NOT NULL AS seg_exists,
       CASE WHEN c_acctbal >= -1000.0 AND c_acctbal <= 0.0 THEN 0.0
            ELSE c_acctbal END AS bal_mapped,
       CASE WHEN c_acctbal < 1000.0 THEN 'small' ELSE 'large' END AS size_if
FROM customer WHERE c_custkey < 30 ORDER BY c_custkey
"""


def q_let_get_stream(spark, sf_dir):
    """let(a=search(...), b=rollup(a), c=stats(a), get(b) x get(c))
    (LetStream/GetStream ≈L40 each): the bound stream `a` is REUSED by
    two consumers — localCheckpoint(eager) is the let-binding (evaluate
    once, bounded per-entry: blocks are dropped with the RDD, unlike a
    persist() the long-running sweep driver would accumulate), each
    get() is a plan reference; the tiny outputs cross-join at the end."""
    from .entry_round4 import _t as _tt

    a = (
        _tt(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .localCheckpoint(eager=True)
    )
    b = a.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty")
    )
    c = a.agg(F.count("*").alias("n_total"))
    out = b.crossJoin(F.broadcast(c)).orderBy("l_returnflag")
    return out.select("l_returnflag", "sum_qty", "n_total")


SQL_LET_GET_STREAM = """
WITH a AS (
  SELECT * FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'),
b AS (SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM a GROUP BY 1),
c AS (SELECT count(*) AS n_total FROM a)
SELECT l_returnflag, sum_qty, n_total FROM b, c ORDER BY l_returnflag
"""


REGISTRY_R4C.update(
    {
        "facet_exclude_tags": (q_facet_exclude_tags, SQL_FACET_EXCLUDE_TAGS),
        "block_join_child_sort": (
            q_block_join_child_sort,
            SQL_BLOCK_JOIN_CHILD_SORT,
        ),
        "function_def_map_exists": (
            q_function_def_map_exists,
            SQL_FUNCTION_DEF_MAP_EXISTS,
        ),
        "let_get_stream": (q_let_get_stream, SQL_LET_GET_STREAM),
    }
)


# ===========================================================================
# Tranche: parallel() stream (SURVEY §3.9 — ParallelStream.java ≈L60 +
# HashQParserPlugin's {!hash workers=N worker=i} partition filter).
# Spark IS this operator: repartition(N, key) is the hash split, the
# inner expression runs per partition, the exchange's merge is the
# wrapping node. The entry makes the shape explicit — an EXPLICIT
# repartition by the partition key, per-partition partial rollups
# (mapInArrow-free: groupBy under AQE keeps partials map-side), then the
# final merge — and must equal the unpartitioned rollup exactly.
# ===========================================================================


def q_parallel_stream_rollup(spark, sf_dir):
    from .entry_round4 import _t as _tt

    ev = _tt(spark, sf_dir, "events")
    # parallel(workers=4, rollup(search(events), over=user_id, sum(value)))
    split = ev.repartition(4, F.col("user_id"))
    per_user = split.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count("*").alias("n"),
    )
    return per_user.orderBy(F.desc("sum_value"), F.asc("user_id")).limit(25)


SQL_PARALLEL_ROLLUP = """
SELECT user_id, ROUND(sum(value), 4) AS sum_value, count(*) AS n
FROM events GROUP BY user_id
ORDER BY sum_value DESC, user_id LIMIT 25
"""


REGISTRY_R4C.update(
    {
        "parallel_stream_rollup": (
            q_parallel_stream_rollup,
            SQL_PARALLEL_ROLLUP,
        ),
    }
)


# ===========================================================================
# Tranche: topic() version-cursor poll + matheval termVectors().
# ===========================================================================


def q_topic_poll_batch(spark, sf_dir):
    """topic(checkpoint, q) (TopicStream.java ≈L60): at-least-once
    incremental pull — emit only rows with _version_ (here the monotone
    event_id) above the subscriber's checkpoint, capped to one batch in
    version order; the NEXT checkpoint the subscriber would ack is the
    batch max, returned on every row (TopicStream carries it per tuple).
    Segment-level cursoring over a real index is TopicCursor
    (streaming/incremental.py, tested in tests/test_streaming.py); this
    entry is the version-filter contract itself. Scale shape: the
    version predicate pushes to the scan (min-max pruning skips whole
    files below the checkpoint); the cap is TakeOrderedAndProject."""
    from .entry_round4 import _t as _tt

    checkpoint = 9950
    batch = 25
    ev = _tt(spark, sf_dir, "events").filter(F.col("event_id") > checkpoint)
    picked = (
        ev.select("event_id", "event_type", "user_id")
        .orderBy("event_id")
        .limit(batch)
    )
    from pyspark.sql import Window

    return picked.withColumn(
        "next_checkpoint",
        F.max("event_id").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    ).orderBy("event_id")


SQL_TOPIC_POLL = """
WITH batch AS (
  SELECT event_id, event_type, user_id
  FROM events WHERE event_id > 9950
  ORDER BY event_id LIMIT 25)
SELECT event_id, event_type, user_id,
       (SELECT max(event_id) FROM batch) AS next_checkpoint
FROM batch ORDER BY event_id
"""


def q_stream_term_vectors(spark, sf_dir):
    """termVectors() math evaluator (solr/solrj/.../io/eval/
    TermVectorsEvaluator.java ≈L40): docs x top-terms TF-IDF matrix.
    Terms = the 8 highest-df terms (df ties broken by term); value =
    tf * ln(numDocs / (df + 1)). Emitted in long form (doc_id, term, w)
    — the matrix a 10^12-doc corpus can actually materialize; the wide
    form is a pivot away. df/numDocs come from the same token scan,
    aggregated once and broadcast."""
    from .entry_queries import _tok

    tok = _tok(spark, sf_dir)
    n_docs = tok.select("doc_id").distinct().count()
    df_t = (
        tok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    top = df_t.orderBy(F.desc("df"), F.asc("term")).limit(8)
    tf = (
        tok.filter(F.col("doc_id") < 5)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.join(F.broadcast(top), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / (F.col("df") + 1)),
                6,
            ).alias("w"),
        )
        .orderBy("doc_id", "term")
    )


SQL_TERM_VECTORS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
top AS (SELECT term, df FROM dfs ORDER BY df DESC, term LIMIT 8),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE doc_id < 5 GROUP BY doc_id, term)
SELECT tf.doc_id, tf.term AS term,
       ROUND(tf.tf * ln(CAST(nd.n AS DOUBLE) / (top.df + 1)), 6) AS w
FROM tf JOIN top ON tf.term = top.term, nd
ORDER BY tf.doc_id, tf.term
"""


REGISTRY_R4C.update(
    {
        "topic_poll_batch": (q_topic_poll_batch, SQL_TOPIC_POLL),
        "stream_term_vectors": (q_stream_term_vectors, SQL_TERM_VECTORS),
    }
)


# ===========================================================================
# Tranche: multimodal audio-chunk plan (ASR-style export windows).
# ===========================================================================


def q_multimodal_audio_chunks(spark, sf_dir):
    """Fixed-length overlapping audio windows (5 s / 0.5 s overlap): the
    1->N chunk fan-out plan over the opaque-binary media table; decode of
    each window stays the documented stub. Audio durations derive
    deterministically from media_id (one row keeps NULL duration to
    witness the unknown-length branch). Rows-only: the media table is
    synthesized, not an sf_dir parquet; pytest pins the stride/clip
    arithmetic against a python reference."""
    from .pipeline.multimodal import audio_chunk_plan, synthetic_media

    media = synthetic_media(spark, 64)
    media = media.withColumn(
        "duration_ms",
        F.when(
            (F.col("kind") == "audio") & (F.col("media_id") != 1),
            (F.lit(3500) + F.col("media_id") * 211 % 15000).cast("int"),
        ).otherwise(F.col("duration_ms")),
    )
    out = audio_chunk_plan(media, chunk_ms=5000, overlap_ms=500)
    return out.orderBy("media_id", "chunk_idx")


REGISTRY_R4C.update(
    {
        "multimodal_audio_chunks": (q_multimodal_audio_chunks, None),
    }
)


# ===========================================================================
# Tranche: facet.pivot with stats (pivot + stats component integration —
# solr/core/.../handler/component/FacetComponent + StatsComponent via
# stats.field={!tag=..} facet.pivot={!stats=..}): per pivot cell,
# count + sum/avg/min/max of a metric. ONE groupBy on the two pivot
# levels — the stats ride the same map-side-combined agg as the counts.
# ===========================================================================


def q_facet_pivot_stats(spark, sf_dir):
    from .entry_round4 import _t as _tt

    li = _tt(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_FACET_PIVOT_STATS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       ROUND(sum(l_quantity), 2) AS sum_qty,
       ROUND(avg(l_discount), 6) AS avg_disc,
       ROUND(min(l_extendedprice), 2) AS min_price,
       ROUND(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


REGISTRY_R4C.update(
    {
        "facet_pivot_stats": (q_facet_pivot_stats, SQL_FACET_PIVOT_STATS),
    }
)


# ===========================================================================
# Tranche: harmonicFit() (solr/solrj/.../io/eval/HarmonicFitEvaluator.java
# ≈L40; commons-math harmonic fitting). Deterministic fixed-frequency
# tier: with known ω (here the weekly cycle, 2π/7 over day index) the
# model y = b1·sin(ωt) + b2·cos(ωt) + b0 is LINEAR — exactly the
# ols2_stream 9-sum distributed agg on transformed basis columns;
# amplitude = √(b1²+b2²), phase = atan2(b2, b1). (The reference's
# frequency-estimating tier is Levenberg–Marquardt — nonlinear and
# iterative; the fixed-ω fit is the deterministic, one-agg scale path.)
# ===========================================================================


def q_stream_harmonic_fit(spark, sf_dir):
    import math

    from pyspark.sql import Window

    from .entry_round4 import _t as _tt
    from .operators.matheval import ols2_stream

    omega = 2.0 * math.pi / 7.0
    daily = (
        _tt(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    t = F.row_number().over(Window.orderBy("day")).cast("double")
    basis = daily.select(
        "n",
        F.sin(F.lit(omega) * t).alias("s"),
        F.cos(F.lit(omega) * t).alias("c"),
    )
    fit = ols2_stream(basis, "n", "s", "c")
    return fit.select(
        F.col("b0").alias("offset"),
        "b1",
        "b2",
        F.round(F.sqrt(F.col("b1") ** 2 + F.col("b2") ** 2), 6).alias(
            "amplitude"
        ),
        F.round(F.atan2(F.col("b2"), F.col("b1")), 6).alias("phase"),
        "r2",
    )


SQL_HARMONIC_FIT = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1),
basis AS (
  SELECT n,
         sin(2 * pi() / 7 * row_number() OVER (ORDER BY day)) AS s,
         cos(2 * pi() / 7 * row_number() OVER (ORDER BY day)) AS c
  FROM daily),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS cnt,
         sum(s) AS s1, sum(c) AS s2, sum(n) AS sy,
         sum(s*s) AS s11r, sum(c*c) AS s22r, sum(s*c) AS s12r,
         sum(s*n) AS s1yr, sum(c*n) AS s2yr, sum(n*n) AS syyr
  FROM basis),
cc AS (
  SELECT cnt, s1, s2, sy,
         s11r - s1*s1/cnt AS s11, s22r - s2*s2/cnt AS s22,
         s12r - s1*s2/cnt AS s12, s1yr - s1*sy/cnt AS s1y,
         s2yr - s2*sy/cnt AS s2y, syyr - sy*sy/cnt AS syy
  FROM g),
b AS (
  SELECT cnt, s1, s2, sy, s1y, s2y, syy,
         (s22*s1y - s12*s2y) / (s11*s22 - s12*s12) AS b1r,
         (s11*s2y - s12*s1y) / (s11*s22 - s12*s12) AS b2r
  FROM cc)
SELECT ROUND((sy - b1r*s1 - b2r*s2) / cnt, 6) AS "offset",
       ROUND(b1r, 6) AS b1, ROUND(b2r, 6) AS b2,
       ROUND(sqrt(ROUND(b1r, 6) * ROUND(b1r, 6)
                  + ROUND(b2r, 6) * ROUND(b2r, 6)), 6) AS amplitude,
       ROUND(atan2(ROUND(b2r, 6), ROUND(b1r, 6)), 6) AS phase,
       ROUND((b1r*s1y + b2r*s2y) / syy, 6) AS r2
FROM b
"""


REGISTRY_R4C.update(
    {
        "stream_harmonic_fit": (q_stream_harmonic_fit, SQL_HARMONIC_FIT),
    }
)


# ===========================================================================
# Tranche: literal/concat stream sources (SURVEY §3.9 — EchoStream /
# TupStream / ListStream ≈L150 each, CatStream in solr/core). echo() is
# a 1-row literal, tuple() a named-field literal row, list() the
# concatenation of its sub-streams, cat() streams file lines (here: the
# first lines of the documents table standing in for the configset file
# tree, line-numbered). All four are createDataFrame/union/read mappings
# — the entry witnesses the composition in one plan.
# ===========================================================================


def q_echo_tuple_list_cat(spark, sf_dir):
    from .entry_round4 import _t as _tt

    echo = spark.createDataFrame(
        [("echo", "hello world", 0)], "src string, line string, line_no int"
    )
    tup = spark.createDataFrame(
        [("tuple", "a=1,b=two", 0)], "src string, line string, line_no int"
    )
    cat = (
        _tt(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 3)
        .select(
            F.lit("cat").alias("src"),
            F.substring("text", 1, 30).alias("line"),
            F.col("doc_id").cast("int").alias("line_no"),
        )
    )
    # list(echo, tuple, cat): ordered concatenation
    return echo.unionByName(tup).unionByName(cat).orderBy("src", "line_no")


SQL_ECHO_TUPLE_LIST_CAT = """
SELECT * FROM (
  SELECT 'echo' AS src, 'hello world' AS line, 0 AS line_no
  UNION ALL
  SELECT 'tuple', 'a=1,b=two', 0
  UNION ALL
  SELECT 'cat', substr(text, 1, 30), CAST(doc_id AS INT)
  FROM documents WHERE doc_id < 3)
ORDER BY src, line_no
"""


REGISTRY_R4C.update(
    {
        "echo_tuple_list_cat": (q_echo_tuple_list_cat, SQL_ECHO_TUPLE_LIST_CAT),
    }
)


# ===========================================================================
# Tranche: miscellaneous token-filter utilities (SURVEY §3.2 utilities
# row): KeywordRepeat+Porter+RemoveDuplicates stack; Length/LimitTokenCount.
# ===========================================================================


def q_analysis_keyword_repeat(spark, sf_dir):
    """KeywordRepeatFilter -> PorterStem -> RemoveDuplicates: per doc,
    (pos, term) rows holding surface AND stem at the same position (dup
    dropped when stemming is identity). Arrow-batched over the docs
    (the per-row kernel is the same function the pytest golden vectors
    pin); rows-only — Porter is not SQL-expressible."""
    import pandas as pd

    from .analysis import keyword_repeat_porter
    from .entry_round4 import _t as _tt

    d = _tt(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)

    def gen(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for term, pos in keyword_repeat_porter(text[:200]):
                    rows.append((int(doc_id), int(pos), term))
            yield pd.DataFrame(rows, columns=["doc_id", "pos", "term"])

    out = d.select("doc_id", "text").mapInPandas(
        gen, "doc_id long, pos int, term string"
    )
    return out.orderBy("doc_id", "pos", "term")


def q_analysis_length_limit(spark, sf_dir):
    """LengthFilter(3..8) + LimitTokenCountFilter(40) over the whitespace
    stream: per doc, tokens kept. Both filters are pure Column
    predicates at scale (length + position cap), so the SQL oracle is a
    full restatement."""
    from .entry_queries import _tok

    tok = _tok(spark, sf_dir).filter(F.col("doc_id") < 10)
    kept = tok.filter(
        (F.length("term") >= 3) & (F.length("term") <= 8)
        & (F.col("pos") <= 40)
    )
    return (
        kept.groupBy("doc_id")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("doc_id")
    )


SQL_LENGTH_LIMIT = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id < 10)
SELECT doc_id, count(*) AS n_kept
FROM tok
WHERE length(term) BETWEEN 3 AND 8 AND pos <= 40
GROUP BY doc_id ORDER BY doc_id
"""


REGISTRY_R4C.update(
    {
        "analysis_keyword_repeat": (q_analysis_keyword_repeat, None),
        "analysis_length_limit": (q_analysis_length_limit, SQL_LENGTH_LIMIT),
    }
)


# ===========================================================================
# Tranche: ElisionFilter (FrenchAnalyzer DEFAULT_ARTICLES). The synthetic
# corpus has no apostrophe contractions, so the entry injects them
# deterministically (every 3rd position becomes "l'<term>", every 7th
# "jusqu'<term>") and then runs the REAL python filter (Arrow-batched)
# — the oracle is an INDEPENDENT SQL restatement via regexp_replace, so
# the two implementations cross-check.
# ===========================================================================


def q_analysis_elision_fr(spark, sf_dir):
    import pandas as pd

    from .analysis import elision_filter
    from .entry_queries import _tok

    tok = _tok(spark, sf_dir).filter(F.col("doc_id") < 5)
    injected = tok.select(
        "doc_id",
        "pos",
        F.when(F.col("pos") % 7 == 0, F.concat(F.lit("jusqu'"), "term"))
        .when(F.col("pos") % 3 == 0, F.concat(F.lit("l'"), "term"))
        .otherwise(F.col("term"))
        .alias("term"),
    )

    def apply_elision(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["term"] = pdf["term"].map(elision_filter)
            yield pdf

    out = injected.mapInPandas(
        apply_elision, "doc_id long, pos int, term string"
    )
    return out.orderBy("doc_id", "pos")


SQL_ELISION_FR = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
  FROM documents WHERE doc_id < 5),
inj AS (
  SELECT doc_id, pos,
         CASE WHEN pos % 7 = 0 THEN 'jusqu''' || term
              WHEN pos % 3 = 0 THEN 'l''' || term
              ELSE term END AS term
  FROM tok)
SELECT doc_id, pos,
       regexp_replace(term,
         '^(l|m|t|qu|n|s|j|d|c|jusqu|quoiqu|lorsqu|puisqu)[''’]', '', 'i')
         AS term
FROM inj ORDER BY doc_id, pos
"""


REGISTRY_R4C.update(
    {
        "analysis_elision_fr": (q_analysis_elision_fr, SQL_ELISION_FR),
    }
)


# ===========================================================================
# Tranche: cosineSimilarity() matrix (CosineSimilarityEvaluator.java
# ≈L30) — pairwise cosine over the first 8 embeddings, long form
# (i, j, cos). Dot products and norms are JVM-side zip_with/aggregate
# expressions; the oracle recomputes from unnested (vec_id, idx, v)
# rows — an independent relational formulation.
# ===========================================================================


def q_stream_cosine_matrix(spark, sf_dir):
    from .entry_round4 import _t as _tt

    emb = (
        _tt(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("x")
        )
    )
    a = emb.select(F.col("vec_id").alias("i"), F.col("x").alias("xa"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("x").alias("xb"))
    dot = F.aggregate(
        F.zip_with("xa", "xb", lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.round(dot / (nrm(F.col("xa")) * nrm(F.col("xb"))), 6).alias(
                "cos"
            ),
        )
        .orderBy("i", "j")
    )


SQL_COSINE_MATRIX = """
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id < 8),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.v * b.v) AS dot
  FROM flat a JOIN flat b ON a.idx = b.idx AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
norms AS (
  SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY 1)
SELECT d.i, d.j, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots d
JOIN norms na ON na.vec_id = d.i
JOIN norms nb ON nb.vec_id = d.j
ORDER BY d.i, d.j
"""


REGISTRY_R4C.update(
    {
        "stream_cosine_matrix": (q_stream_cosine_matrix, SQL_COSINE_MATRIX),
    }
)
