"""Join family (SURVEY.md §3.8): Solr streaming joins, {!join} semi-joins,
block (parent/child) joins with score modes, graph-ish lookups.

Catalyst picks broadcast/hash/sort-merge physically; we broadcast explicitly
where the reference's HashJoinStream reads the build side fully into memory
(same contract: small build side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """hashJoin(...) — in-memory equi hash join, build side broadcast
    (HashJoinStream.java ≈L50 `open` builds the multimap)."""
    return left.join(F.broadcast(right), on, how)


def outer_hash_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """outerHashJoin(...) — left outer (OuterHashJoinStream.java ≈L40)."""
    return left.join(F.broadcast(right), on, "left")


def merge_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """innerJoin/leftOuterJoin — merge join over streams pre-sorted on keys
    (InnerJoinStream.java ≈L30, BiJoinStream.java). Spark: sort-merge join;
    we hint MERGE to pin the physical strategy the reference uses."""
    return left.hint("merge").join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """intersect(...) / {!join from to} — keep left rows whose key appears in
    right (IntersectStream.java ≈L40; JoinQParserPlugin.java ≈L60)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """complement(...) — left minus right on keys (ComplementStream.java)."""
    return left.join(right, on, "left_anti")


def join_with_score_mode(
    matches: DataFrame, child_key: str, parent_key: str, score_col: str, mode: str
) -> DataFrame:
    """JoinUtil.createJoinQuery ScoreMode{None,Avg,Max,Min,Total}
    (lucene/join/.../JoinUtil.java ≈L80): semi-join that aggregates child
    scores onto the parent key."""
    agg = {
        "avg": F.avg(score_col),
        "max": F.max(score_col),
        "min": F.min(score_col),
        "total": F.sum(score_col),
        "none": F.lit(1.0),
    }[mode]
    return (
        matches.groupBy(F.col(child_key).alias(parent_key))
        .agg(agg.alias("score"))
    )


def block_join_parent(
    children: DataFrame,
    parents: DataFrame,
    parent_key: str,
    child_filter,
    score_col,
    score_mode: str = "total",
) -> DataFrame:
    """ToParentBlockJoinQuery (lucene/join/.../ToParentBlockJoinQuery.java
    ≈L50): parents having >=1 matching child; child scores aggregated by
    ScoreMode. The reference needs contiguous doc blocks — a real equi-join
    trivializes it (SURVEY.md §3.3)."""
    agg = {
        "total": F.sum(score_col),
        "max": F.max(score_col),
        "min": F.min(score_col),
        "avg": F.avg(score_col),
        "none": F.count(F.lit(1)),
    }[score_mode]
    matched = (
        children.filter(child_filter)
        .groupBy(parent_key)
        .agg(agg.alias("score"), F.count("*").alias("n_children"))
    )
    return parents.join(matched, parent_key, "inner")


def block_join_children(
    parents: DataFrame, children: DataFrame, parent_key: str, parent_filter
) -> DataFrame:
    """ToChildBlockJoinQuery: children of matching parents."""
    keep = parents.filter(parent_filter).select(parent_key)
    return children.join(keep, parent_key, "left_semi")


def block_join_parent_sort(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    sort_child_col,
    selector: str = "max",
) -> DataFrame:
    """ToParentBlockJoinSortField (lucene/join/.../ToParentBlockJoinSortField
    .java ≈L40): sort PARENTS by a selector over a child field. Left
    outer: parents with no children keep a NULL sort value (missing-last
    is the caller's orderBy concern). One child-side agg + one join, both
    on the parent key — a single exchange at scale."""
    sel = {
        "max": F.max(sort_child_col),
        "min": F.min(sort_child_col),
    }[selector]
    child_vals = children.groupBy(parent_key).agg(sel.alias("child_sort"))
    return parents.join(child_vals, parent_key, "left_outer")
