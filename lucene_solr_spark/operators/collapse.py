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
