"""Solr Streaming Expressions (SURVEY.md §3.9) — the reference's relational
dataflow algebra (pull-based sorted TupleStreams over HTTP), re-expressed as
DataFrame one-liners. The `parallel(workers, partitionKeys, ...)` shuffle is
literally Spark's exchange; `rollup` over a sorted stream is hash aggregation;
order-preserving merge unions are unnecessary (Spark re-sorts).

Reference twins: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
<Name>Stream.java, cited per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def search_stream(
    df: DataFrame, where, select_cols: list, sort_cols: list, limit: int | None = None
) -> DataFrame:
    """search(col, q, fl, sort, qt=/export) — filtered sorted projection
    (CloudSolrStream.java ≈L60 / ExportWriter.java ≈L100)."""
    out = df.filter(where).select(*select_cols).orderBy(*sort_cols)
    return out.limit(limit) if limit else out


def rollup_stream(df: DataFrame, over: list[str], metrics: list) -> DataFrame:
    """rollup(over, metrics...) — sort-based partial agg in the reference
    (RollupStream.java ≈L50); Spark picks hash agg with partial/final."""
    return df.groupBy(*over).agg(*metrics).orderBy(*over)


def having_stream(df: DataFrame, over: list[str], metrics: list, cond) -> DataFrame:
    """having(booleanEvaluator) — post-agg filter (HavingStream.java ≈L40)."""
    return df.groupBy(*over).agg(*metrics).filter(cond).orderBy(*over)


def top_stream(df: DataFrame, sort_cols: list, n: int) -> DataFrame:
    """top(n, sort) — top-k reorder (RankStream.java ≈L40)."""
    return df.orderBy(*sort_cols).limit(n)


def unique_stream(df: DataFrame, over: list[str], sort_cols: list) -> DataFrame:
    """unique(over) — first-by-sort dedup on a sorted stream
    (UniqueStream.java ≈L40); pinned as deterministic window rank=1."""
    w = Window.partitionBy(*over).orderBy(*sort_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def random_stream(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """random(collection, rows=n) — pseudorandom sample (RandomStream.java
    ≈L40). Deterministic twin of ORDER BY random(): order by a seeded hash
    of the key, so the sample is reproducible across engines and runs (the
    oracle computes the identical md5 ordering). At scale this is a
    TakeOrderedAndProject (per-partition top-n + merge), not a full sort."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))
    return (
        df.withColumn("_h", h)
        .orderBy("_h")
        .limit(n)
        .drop("_h")
    )


def reduce_stream(df: DataFrame, by: list[str], collect_col: str) -> DataFrame:
    """reduce(by, group(...)) — one tuple per key holding the group's
    collected sub-tuples (ReduceStream.java ≈L40 with GroupOperation).
    Spark: groupBy + sort_array(collect_list) — the sorted-stream group
    walk becomes a hash agg; per-group order restored by the array sort."""
    return (
        df.groupBy(*by)
        .agg(
            F.sort_array(F.collect_list(collect_col)).alias("group"),
            F.count("*").alias("n"),
        )
        .orderBy(*by)
    )


def select_eval(df: DataFrame, exprs: dict[str, F.Column]) -> DataFrame:
    """select(expr, as...) — projection/rename + per-tuple evaluators
    (SelectStream.java ≈L50; eval registry Lang.java)."""
    return df.select(*[col.alias(name) for name, col in exprs.items()])


def merge_stream(dfs: list[DataFrame], sort_cols: list) -> DataFrame:
    """merge(s1, s2, on) — union of sorted streams (MergeStream.java ≈L40);
    Spark needs no order-preserving k-way merge, union + sort is exact."""
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u.orderBy(*sort_cols)


def cartesian_product_stream(df: DataFrame, array_col: str, out_col: str) -> DataFrame:
    """cartesianProduct() — unnest/explode a multivalued field
    (CartesianProductStream.java ≈L50)."""
    return df.withColumn(out_col, F.explode(F.col(array_col))).drop(array_col)


def fetch_stream(
    df: DataFrame, lookup: DataFrame, on: str, fields: list[str]
) -> DataFrame:
    """fetch() — lookup join / late materialization (FetchStream.java ≈L50)."""
    return df.join(lookup.select(on, *fields), on, "left")


def significant_terms(
    tok: DataFrame, fg_docs: DataFrame, min_doc_freq: int = 1, limit: int = 10
) -> DataFrame:
    """significantTerms() (SignificantTermsStream.java ≈L60): terms
    over-represented in the foreground doc-set vs the background corpus.
    Score = (fg_df / fg_size) / (bg_df / bg_size), exact global counts.
    tok: (doc_id, term); fg_docs: (doc_id)."""
    bg_size = tok.select("doc_id").distinct().count()
    fg_size = fg_docs.count()
    bg = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("bg_df"))
    fg = (
        tok.join(fg_docs, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("fg_df"))
    )
    j = fg.join(bg, "term").filter(F.col("fg_df") >= min_doc_freq)
    score = (F.col("fg_df") / F.lit(float(fg_size))) / (
        F.col("bg_df") / F.lit(float(bg_size))
    )
    return (
        j.select("term", "fg_df", "bg_df", F.round(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(limit)
    )
