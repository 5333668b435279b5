"""Collectors, grouping, collapse/expand, rerank, diversified top-k
(SURVEY.md §3.6) — all window-function recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse(df: DataFrame, field: str, sort_cols: list) -> DataFrame:
    """Solr field collapsing (CollapsingQParserPlugin.java ≈L100): keep one
    doc per group by sort criterion."""
    w = Window.partitionBy(field).orderBy(*sort_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def expand(df: DataFrame, field: str, sort_cols: list, n: int) -> DataFrame:
    """ExpandComponent (≈L90): restore top-N members of collapsed groups,
    with their in-group rank."""
    w = Window.partitionBy(field).orderBy(*sort_cols)
    return df.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= n
    )


def grouping_two_pass(
    df: DataFrame,
    group_field: str,
    group_sort: list,
    within_sort: list,
    top_groups: int,
    docs_per_group: int,
) -> DataFrame:
    """lucene/grouping two-pass (FirstPassGroupingCollector ≈L50 +
    TopGroupsCollector): pass 1 = top groups by group head; pass 2 = top docs
    within each selected group."""
    heads = (
        df.groupBy(group_field)
        .agg(*[s.alias(f"_g{i}") for i, s in enumerate(group_sort)])
        .orderBy(*[F.desc(f"_g{i}") for i in range(len(group_sort))], F.asc(group_field))
        .limit(top_groups)
        .select(group_field)
    )
    w = Window.partitionBy(group_field).orderBy(*within_sort)
    return (
        df.join(F.broadcast(heads), group_field, "left_semi")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= docs_per_group)
    )


def rerank(
    df: DataFrame,
    first_sort: list,
    rerank_score,
    top_n: int,
    weight: float,
    k: int,
    first_score,
) -> DataFrame:
    """ReRankQParserPlugin (≈L50) / QueryRescorer: rescore the top-N of a
    first-pass ranking with a second query's score times weight; docs below
    the rerank window keep their first-pass order."""
    first = df.orderBy(*first_sort).limit(top_n)
    rescored = first.withColumn(
        "score", first_score + F.lit(weight) * rerank_score
    )
    return rescored.orderBy(F.desc("score")).limit(k)


def diversified_topk(
    df: DataFrame, key_field: str, sort_cols: list, max_per_key: int, k: int
) -> DataFrame:
    """DiversifiedTopDocsCollector (lucene/misc): global top-k with at most
    max_per_key hits per key."""
    w = Window.partitionBy(key_field).orderBy(*sort_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_key)
        .drop("_rn")
        .orderBy(*sort_cols)
        .limit(k)
    )


def group_ngroups(df: DataFrame, group_field: str) -> DataFrame:
    """Solr group.ngroups + matches (solr/.../search/grouping/
    GroupingSpecification, Grouping.java ≈L300): for a match set, the
    total matched-doc count and the number of distinct groups. One
    map-side-combined aggregation (count_distinct rewrites to a two-stage
    partial agg under AQE)."""
    return df.agg(
        F.count("*").alias("matches"),
        F.count_distinct(group_field).alias("ngroups"),
    )


def group_by_queries(
    df: DataFrame,
    queries: list,
    within_sort: list,
    docs_per_group: int,
) -> DataFrame:
    """Solr `group.query` mode (solr/core/.../search/grouping/distributed/
    command/QueryCommand.java ≈L40; Grouping.java): each entry in
    `queries` is a (name, Column-predicate) pair forming ONE group —
    groups may overlap (a doc can match several group queries, unlike
    group.field). Per group: matches count + top docs_per_group by
    within_sort. Distributed shape: ONE pass over df — each predicate is
    a when()-tagged explode-free union of filtered branches; the
    per-group top-k is a partitioned window over the (small) matched
    subsets, never a global sort."""
    parts = []
    for name, pred in queries:
        parts.append(
            df.filter(pred).withColumn("group_q", F.lit(name))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("group_q").orderBy(*within_sort)
    cnt = Window.partitionBy("group_q")
    return (
        u.withColumn("matches", F.count(F.lit(1)).over(cnt))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= docs_per_group)
    )
