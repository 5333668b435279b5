"""Graph traversal (SURVEY.md §3.8/§3.9): gatherNodes / shortestPath as
iterative frontier-expansion DataFrame joins (BFS), with cycle avoidance.

Reference twins: solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java (≈L80), ShortestPathStream.java (≈L60).

At 100TB scale each hop is one equi-join shuffle; the frontier is usually
small enough to broadcast — we broadcast it explicitly, and checkpoint/
localCheckpoint between hops to cut lineage growth on deep traversals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    from_col: str,
    to_col: str,
    start: DataFrame,
    hops: int = 1,
    dedup: bool = True,
) -> DataFrame:
    """gatherNodes(): expand the frontier `hops` times along (from -> to).
    start: DataFrame with one column named `from_col`. Returns distinct
    reached node ids in a column named `node`."""
    frontier = start.select(F.col(from_col).alias("node"))
    for _ in range(hops):
        nxt = edges.join(
            F.broadcast(frontier.withColumnRenamed("node", from_col)),
            from_col,
            "inner",
        ).select(F.col(to_col).alias("node"))
        frontier = nxt.distinct() if dedup else nxt
    return frontier.distinct()


def score_nodes(
    edges: DataFrame,
    from_col: str,
    to_col: str,
    start: DataFrame,
    hops: int = 1,
) -> DataFrame:
    """scoreNodes() (solr/solrj/.../io/stream/ScoreNodesStream.java ≈L60):
    tf-idf rank the nodes gatherNodes reached — nodes arrived at often from
    the frontier (tf = arrival count) but globally rare (df = in-degree in
    the full edge set) score highest:
        score = count * log(n_edges / df)
    One frontier join per hop + one broadcast join against the (tiny,
    node-keyed) df table."""
    frontier = start.select(F.col(from_col).alias("node"))
    for _ in range(hops):
        nxt = edges.join(
            F.broadcast(frontier.withColumnRenamed("node", from_col)),
            from_col,
            "inner",
        ).select(F.col(to_col).alias("node"))
        frontier = nxt  # keep duplicates: arrival count is the node tf
    counts = frontier.groupBy("node").agg(F.count("*").alias("count"))
    n_edges = edges.count()
    df_tbl = edges.groupBy(F.col(to_col).alias("node")).agg(
        F.count("*").alias("df")
    )
    j = counts.join(df_tbl, "node")
    score = F.col("count") * F.log(F.lit(float(n_edges)) / F.col("df"))
    return j.select(
        "node", "count", F.round(score, 4).alias("score")
    ).orderBy(F.desc("score"), F.asc("node"))


def shortest_path(
    edges: DataFrame,
    from_col: str,
    to_col: str,
    source,
    target,
    max_depth: int = 6,
) -> int | None:
    """shortestPath(): BFS depth of `target` from `source`, or None.
    Visited-set pruning = the reference's cycle detection."""
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(source,)], ["node"])
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", from_col)),
                from_col,
                "inner",
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        if nxt.filter(F.col("node") == target).count() > 0:
            return depth
        if nxt.isEmpty():
            return None
        visited = visited.unionByName(nxt).distinct().localCheckpoint()
        frontier = nxt.localCheckpoint()
    return None


def bfs_levels(
    edges: DataFrame,
    from_col: str,
    to_col: str,
    sources: DataFrame,
    max_depth: int = 6,
) -> DataFrame:
    """Full BFS level assignment: (node, depth) for every node reachable
    from `sources` (a 1-column DataFrame named `node`) within `max_depth`
    hops, depth = MINIMUM hop count (sources themselves at depth 0).

    This is ShortestPathStream.java (≈L60) generalized from one target to
    the whole reachable set — the level table IS the shortest-path length
    for every node, so a single run answers any (source, target) distance
    query. Same scale shape as shortest_path: one equi-join shuffle per
    hop, broadcast frontier, left-anti against the visited set (cycle
    pruning), localCheckpoint per hop to keep lineage flat on deep runs."""
    frontier = sources.select("node").distinct()
    visited = frontier.withColumn("depth", F.lit(0)).localCheckpoint()
    frontier = frontier.localCheckpoint()
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", from_col)),
                from_col,
                "inner",
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        if nxt.isEmpty():
            break
        nxt = nxt.localCheckpoint()
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(depth))
        ).localCheckpoint()
        frontier = nxt
    return visited


def pagerank(
    edges: DataFrame,
    from_col: str,
    to_col: str,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over an edge DataFrame.

    PR_0(v) = 1/N;  PR_{t+1}(v) = (1-d)/N + d * sum_{u->v} PR_t(u)/out(u).
    Contract notes (restated by the SQL oracle): the node set is
    distinct(from UNION to); dangling-node mass is DROPPED, not
    redistributed (so total mass decays when sinks exist — the simple
    textbook variant); fixed iteration count, no convergence test.

    Shape per iteration: one edges-join-pr shuffle keyed on `from`, one
    groupBy(to) aggregation, one left join back to the node set — at
    10^9 edges each round is two hash-keyed exchanges, the same profile
    as connected_components (pipeline/dedup.py), and like it the plan is
    localCheckpoint()ed each round so lineage stays flat over deep runs.

    Float determinism contract: each iteration's pr is quantized to a
    1e-12 lattice via floor(pr*1e12 + 0.5)/1e12 — multiply/add/floor/
    divide are bit-identical IEEE ops in every engine, so the quantize
    collapses summation-ORDER noise (distributed aggregation sums in
    arbitrary order) onto identical doubles, and the final 6-decimal
    value is produced with the same floor expression. Plain ROUND is NOT
    cross-engine stable: Spark's round(double) goes through Java's
    shortest-decimal BigDecimal.valueOf while DuckDB rounds the binary
    value, and they split on exact-boundary values (e.g. 0.0069375)."""
    f, t = F.col(from_col).alias("node"), F.col(to_col).alias("node")
    nodes = edges.select(f).union(edges.select(t)).distinct().persist()
    n = nodes.count()
    outdeg = edges.groupBy(F.col(from_col).alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            edges.join(
                pr.join(outdeg, "node").withColumnRenamed("node", from_col),
                from_col,
            )
            .groupBy(F.col(to_col).alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        raw = F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.floor(raw * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr.select(
        "node",
        (F.floor(F.col("pr") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "pagerank"
        ),
    )
