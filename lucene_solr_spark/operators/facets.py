"""Faceting & stats — Solr SimpleFacets / StatsComponent / JSON Facet API
(SURVEY.md §3.7) as exact DataFrame aggregations.

Where SolrCloud needs overrequest + refinement (per-shard top-limit buckets
are approximate; FacetFieldMerger.java), Spark's shuffle groupBy is exact by
construction — a semantics improvement, noted in SURVEY.md §5.1.

Reference twins cited per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_money(col) -> F.Column:
    """Deterministic sum helper: 2-decimal doubles -> exact integer cents.
    Makes sums order-independent (float sums are not)."""
    return F.round(F.col(col) * 100).cast("long")


def facet_field(
    df: DataFrame,
    field: str,
    limit: int = 10,
    mincount: int = 1,
    sort: str = "count",
    prefix: str | None = None,
    offset: int = 0,
    missing: bool = False,
) -> DataFrame:
    """facet.field — group-count with the full SimpleFacets param set:
    limit/offset/mincount/prefix/missing/sort=count|index
    (solr/core/src/java/org/apache/solr/request/SimpleFacets.java ≈L120).
    `missing=True` appends the null-value bucket LAST (Solr renders it
    after the value buckets); `offset` pages within the sorted buckets
    (rank window, not a Spark offset — keeps the plan AQE-prunable)."""
    src = df
    if prefix is not None:
        src = src.filter(F.col(field).startswith(prefix))
    g = src.filter(F.col(field).isNotNull()).groupBy(
        F.col(field).alias("facet_value")
    ).agg(F.count("*").alias("count"))
    if mincount > 0:
        g = g.filter(F.col("count") >= mincount)
    if sort == "count":
        order = [F.desc("count"), F.asc("facet_value")]
    else:  # index order
        order = [F.asc("facet_value")]
    if offset > 0:
        rk = F.row_number().over(Window.orderBy(*order))
        g = (
            g.withColumn("_rk", rk)
            .filter((F.col("_rk") > offset) & (F.col("_rk") <= offset + limit))
            .drop("_rk")
            .orderBy(*order)
        )
    else:
        g = g.orderBy(*order).limit(limit)
    if missing:
        # The null bucket must sort LAST (Solr renders it after the value
        # buckets). Union row order is not a Spark contract (AQE may
        # repartition), so re-sort with an explicit is-null-last key
        # instead of relying on unionByName output order.
        miss = df.filter(F.col(field).isNull()).agg(
            F.lit(None).cast(df.schema[field].dataType).alias("facet_value"),
            F.count("*").alias("count"),
        )
        g = g.unionByName(miss).orderBy(
            F.col("facet_value").isNull().asc(), *order
        )
    return g


def facet_range(
    df: DataFrame, field: str, start: float, end: float, gap: float
) -> DataFrame:
    """facet.range — fixed-width histogram (RangeFacetProcessor.java);
    values outside [start, end) are dropped (hardend semantics)."""
    bucket = (
        F.floor((F.col(field) - F.lit(start)) / F.lit(gap)) * F.lit(gap)
        + F.lit(start)
    ).cast("double")
    return (
        df.filter((F.col(field) >= start) & (F.col(field) < end))
        .groupBy(bucket.alias("bucket_start"))
        .agg(F.count("*").alias("count"))
        .orderBy("bucket_start")
    )


def facet_query(df: DataFrame, predicates: dict[str, F.Column]) -> DataFrame:
    """facet.query — one count per named predicate (SimpleFacets
    getFacetQueryCounts)."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name)
        for name, cond in predicates.items()
    ]
    wide = df.agg(*aggs)
    # unpivot to (facet_name, count) rows
    names = list(predicates.keys())
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (facet_name, count)"
    )


def facet_pivot(
    df: DataFrame, fields: list[str], limit: int = 20
) -> DataFrame:
    """facet.pivot — multi-level group-by drill-down
    (PivotFacetProcessor.java ≈L60)."""
    g = df.groupBy(*fields).agg(F.count("*").alias("count"))
    return g.orderBy(F.desc("count"), *[F.asc(f) for f in fields]).limit(limit)


def facet_rollup(df: DataFrame, fields: list[str]) -> DataFrame:
    """Hierarchical totals — facet.pivot's implicit per-level totals as a
    ROLLUP grouping set (SURVEY.md §3.7 grouping-set analogs)."""
    return (
        df.rollup(*fields)
        .agg(F.count("*").alias("count"))
        .orderBy(*[F.asc_nulls_first(f) for f in fields])
    )


def facet_interval(
    df: DataFrame, field: str, intervals: list[tuple[str, float, float]]
) -> DataFrame:
    """facet.interval (IntervalFacets.java): arbitrary [lo, hi) interval
    counts; intervals = [(name, lo, hi)], hi=None means unbounded."""
    expr = None
    for name, lo, hi in intervals:
        cond = F.col(field) >= lo
        if hi is not None:
            cond = cond & (F.col(field) < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (
        df.select(expr.alias("interval"))
        .filter(F.col("interval").isNotNull())
        .groupBy("interval")
        .agg(F.count("*").alias("count"))
        .orderBy("interval")
    )


def stats_component(df: DataFrame, field: str, money: bool = True) -> DataFrame:
    """StatsComponent (StatsValuesFactory.java ≈L80): min/max/sum/count/
    missing/mean/stddev(sample)/sumOfSquares. Money fields use exact-cents
    sums for cross-engine determinism."""
    c = F.col(field)
    if money:
        cents = exact_money(field)
        sum_expr = (F.sum(cents) / 100.0).alias("sum")
        mean_expr = (F.sum(cents) / 100.0 / F.count(c)).alias("mean")
    else:
        sum_expr = F.sum(c).alias("sum")
        mean_expr = F.avg(c).alias("mean")
    return df.agg(
        F.count(c).alias("count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        sum_expr,
        mean_expr,
        F.round(F.stddev_samp(c), 4).alias("stddev"),
    )


def percentiles(df: DataFrame, field: str, ps: list[float]) -> DataFrame:
    """stats percentiles — Solr uses t-digest (PercentileAgg.java); we use
    Spark's EXACT percentile (continuous interpolation) so the DuckDB
    quantile_cont oracle matches bit-for-bit; percentile_approx remains
    available as the sketch path at scale."""
    arr = F.expr(
        f"percentile({field}, array({', '.join(str(p) for p in ps)}))"
    )
    cols = [
        F.round(arr[i], 4).alias(f"p{int(p * 100)}") for i, p in enumerate(ps)
    ]
    return df.agg(*cols)


def unique_agg(df: DataFrame, group: str, field: str) -> DataFrame:
    """facet 'unique' / countDistinct (UniqueAgg.java): exact distinct per
    bucket. 'hll' (HLLAgg.java) maps to approx_count_distinct at scale."""
    return (
        df.groupBy(F.col(group).alias("facet_value"))
        .agg(F.count_distinct(F.col(field)).alias("unique"))
        .orderBy("facet_value")
    )


def json_facet_nested(
    df: DataFrame, outer: str, inner: str, metric_field: str, top_inner: int = 2
) -> DataFrame:
    """JSON Facet API nested sub-facets (FacetFieldProcessor.java ≈L100):
    terms bucket on `outer`, per-bucket metric + top-N `inner` sub-buckets."""
    w = Window.partitionBy(outer).orderBy(
        F.desc("count"), F.asc(inner)
    )
    sub = (
        df.groupBy(outer, inner)
        .agg(F.count("*").alias("count"), F.sum(exact_money(metric_field)).alias("_cents"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_inner)
    )
    return sub.select(
        F.col(outer).alias("outer_value"),
        F.col(inner).alias("inner_value"),
        "count",
        (F.col("_cents") / 100.0).alias("metric_sum"),
        "rank",
    ).orderBy("outer_value", "rank")


def timeseries(
    df: DataFrame, ts_field: str, value_field: str, unit: str = "day"
) -> DataFrame:
    """timeseries() stream / date-range facet (TimeSeriesStream.java ≈L60):
    fixed-gap date buckets + metrics. Bucket surfaced as epoch seconds for
    cross-engine hash stability."""
    bucket = F.unix_timestamp(F.date_trunc(unit, F.col(ts_field)))
    return (
        df.groupBy(bucket.alias("bucket_ts"))
        .agg(
            F.count("*").alias("count"),
            (F.sum(exact_money(value_field)) / 100.0).alias("sum_value"),
        )
        .orderBy("bucket_ts")
    )


def heatmap_facet(
    df: DataFrame, lat_col, lon_col, grid_deg: float
) -> DataFrame:
    """facet.heatmap (solr/core/.../request/SpatialHeatmapFacets.java ≈L60):
    geo grid-cell counts. The reference rasterizes via the spatial index's
    prefix-tree levels; ours is the equivalent fixed-resolution grid —
    floor-snap both axes, ONE groupBy keyed by the cell (shuffle bounded by
    the number of occupied cells, never by rows)."""
    cell_lat = F.floor(lat_col / F.lit(grid_deg)).cast("int")
    cell_lon = F.floor(lon_col / F.lit(grid_deg)).cast("int")
    return (
        df.groupBy(cell_lat.alias("cell_lat"), cell_lon.alias("cell_lon"))
        .agg(F.count("*").alias("count"))
        .orderBy("cell_lat", "cell_lon")
    )


def sampled_facet_counts(
    df: DataFrame, field: str, key_col: str, fraction_denom: int, seed: int = 42
) -> DataFrame:
    """Sampling collector (Lucene facet/.../RandomSamplingFacetsCollector
    ≈L60): facet counts over a deterministic hash sample of the docs —
    the 10^12-scale answer when exact counts aren't needed. Sample
    predicate = pmod(xxhash-style md5 of the key, denom) == 0, identically
    expressible in ANSI SQL; scale counts back up by the denominator."""
    h = F.conv(F.substring(F.md5(F.concat(F.col(key_col).cast("string"),
                                          F.lit(f"#{seed}"))), 1, 8), 16, 10)
    sampled = df.filter(h.cast("long") % fraction_denom == 0)
    return (
        sampled.groupBy(field)
        .agg(
            F.count("*").alias("sample_count"),
            (F.count("*") * fraction_denom).alias("estimated_count"),
        )
        .orderBy(field)
    )


def unique_block(
    children: DataFrame, child_field: str, parent_key: str
) -> DataFrame:
    """uniqueBlock(_root_) (solr/core/.../facet/UniqueBlockAgg.java ≈L40):
    per child-field bucket, the number of DISTINCT parent blocks containing
    at least one such child — the block-join faceting count."""
    return (
        children.groupBy(child_field)
        .agg(F.count_distinct(parent_key).alias("unique_blocks"))
        .orderBy(child_field)
    )


def block_children_domain_facet(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    parent_filter,
    child_field: str,
) -> DataFrame:
    """JSON-facet `domain: {blockChildren: ...}` (solr/core/.../facet/
    FacetRequest.java domain handling ≈L300): switch the facet domain from
    matching PARENTS to their CHILDREN, then facet the children by
    `child_field`. Spark shape: filter parents -> left_semi join children
    on the block key (broadcastable when the parent filter is selective)
    -> groupBy child field."""
    keys = parents.filter(parent_filter).select(parent_key)
    return (
        children.join(F.broadcast(keys), parent_key, "left_semi")
        .groupBy(child_field)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(child_field)
    )


def relatedness_agg(
    df: DataFrame, bucket_field: str, fg_pred, bg_pred
) -> DataFrame:
    """relatedness(fg, bg) (solr/core/.../facet/RelatednessAgg.java ≈L200)
    — semantic-knowledge-graph bucket scoring: per bucket, how much more
    prevalent the bucket is in the foreground set than the background set.

    Formula (popularity-differential form of the SKG paper, Grainger et al.
    2016: normalized fg_pop vs bg_pop; the reference's exact float
    sequencing is unverifiable here — /root/reference is empty — so the
    formula below IS the contract and the SQL oracle restates it):
      fg_pop = fg_bucket / fg_size,  bg_pop = bg_bucket / bg_size
      relatedness = (fg_pop - bg_pop) / greatest(fg_pop, bg_pop)  in [-1,1]
      (0 when both empty)
    """
    fg = F.sum(F.when(fg_pred, 1).otherwise(0))
    bg = F.sum(F.when(bg_pred, 1).otherwise(0))
    tot_fg = df.filter(fg_pred).count()
    tot_bg = df.filter(bg_pred).count()
    g = df.groupBy(bucket_field).agg(
        fg.alias("fg_count"), bg.alias("bg_count")
    )
    fg_pop = F.col("fg_count") / F.lit(float(max(tot_fg, 1)))
    bg_pop = F.col("bg_count") / F.lit(float(max(tot_bg, 1)))
    rel = F.when(
        F.greatest(fg_pop, bg_pop) > 0,
        (fg_pop - bg_pop) / F.greatest(fg_pop, bg_pop),
    ).otherwise(F.lit(0.0))
    return g.select(
        bucket_field,
        "fg_count",
        "bg_count",
        F.round(rel, 4).alias("relatedness"),
    ).orderBy(F.desc("relatedness"), bucket_field)


def drill_sideways(
    df: DataFrame,
    selections: dict,
    limit: int = 10,
) -> DataFrame:
    """DrillSideways (lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java ≈L60): faceted navigation where each dimension's
    counts are computed with every OTHER dimension's drill-down filter
    applied but its OWN filter excluded — so the UI can show what the
    user would get by switching this dimension's value, not just the
    counts inside the current selection.

    `selections` maps dim column -> selected value (value None = dimension
    faceted but not drilled into). Output: (dim, facet_value, count),
    top-`limit` buckets per dim by (count desc, value asc).

    Scale shape: one groupBy per dimension over the near-drill-down subset
    — D narrow aggregations that each push the other dims' equality
    filters into the scan (partition-prunable), never a full-corpus facet.
    """
    outs = []
    rank_w = Window.partitionBy("dim").orderBy(
        F.desc("count"), F.asc("facet_value")
    )
    for dim in selections:
        sub = df
        for other, val in selections.items():
            if other != dim and val is not None:
                sub = sub.filter(F.col(other) == val)
        outs.append(
            sub.filter(F.col(dim).isNotNull())
            .groupBy(F.col(dim).cast("string").alias("facet_value"))
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn("dim", F.lit(dim))
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return (
        u.withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") <= limit)
        .drop("_rk")
        .select("dim", "facet_value", "count")
        .orderBy("dim", F.desc("count"), F.asc("facet_value"))
    )


def json_facet_stats_buckets(
    df: DataFrame,
    bucket_col: str,
    metric_col,
    all_buckets: bool = True,
) -> DataFrame:
    """JSON Facet API per-bucket stat aggs + allBuckets
    (solr/core/.../search/facet/SlotAcc.java ≈L600: CountAgg,
    CountValsAgg, MissingAgg, SumAgg, SumsqAgg, StddevAgg;
    FacetField allBuckets:true = the grand-total slot). Facet stddev is
    the POPULATION form (SlotAcc computes sqrt(sumsq/n - mean²)), unlike
    StatsComponent's sample form — pinned by the oracle.

    `metric_col` may be a Column expression (e.g. a nullif-derived
    nullable metric); `missing` counts its nulls per bucket. One agg for
    the buckets + one 1-row agg for allBuckets — both map-side
    combinable; the allBuckets row is NOT a second scan in Solr either
    (same SlotAcc pass)."""
    m = metric_col if not isinstance(metric_col, str) else F.col(metric_col)
    aggs = [
        F.count("*").alias("count"),
        F.count(m).alias("countvals"),
        F.sum(F.when(m.isNull(), 1).otherwise(0)).alias("missing"),
        F.round(F.sum(m), 4).alias("sum"),
        F.round(F.sum(m * m), 4).alias("sumsq"),
        F.round(F.stddev_pop(m), 6).alias("stddev"),
    ]
    buckets = (
        df.groupBy(F.col(bucket_col).alias("bucket"))
        .agg(*aggs)
        .orderBy("bucket")
    )
    if not all_buckets:
        return buckets
    total = df.agg(F.lit("__all__").alias("bucket"), *aggs)
    return buckets.unionByName(total).orderBy(
        F.col("bucket") == "__all__", F.col("bucket")
    )


def stats_cardinality(df, col: str, rsd: float = 0.05):
    """StatsComponent `cardinality=true` (solr/core/.../component/
    StatsValuesFactory.java ≈L60 — HyperLogLog via java-hll): approximate
    distinct count as a MERGEABLE sketch. Spark mapping:
    approx_count_distinct (HLL++, Heule 2013) — each executor builds a
    local sketch over its partition, sketches merge in the reduce, ONE
    small row ships to the driver; at 10^12 rows this is the only
    distinct-count that doesn't shuffle the column. `rsd` is the target
    relative standard deviation (Solr's cardinality accuracy knob).
    Returns (approx_distinct, n_rows); the exact count is deliberately
    NOT computed here — the accuracy bound is asserted in tests, and the
    exact path is the separate unique_agg/collection_stats operators."""
    from pyspark.sql import functions as F

    return df.agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def percentiles_approx(df, col: str, ps: list, accuracy: int = 10000):
    """StatsComponent `percentiles` (solr/core/.../component/
    StatsValuesFactory.java — t-digest via com.tdunning): approximate,
    MERGEABLE quantile sketch. Spark mapping: approx_percentile
    (Greenwald-Khanna) — per-partition sketches merged in the reduce,
    no sort and no shuffle of the column; `accuracy` trades memory for
    error exactly like Solr's tdigest `compression` knob. The exact-sort
    path is the separate `percentiles` operator above."""
    from pyspark.sql import functions as F

    q = F.expr(
        f"approx_percentile({col}, array({', '.join(str(p) for p in ps)}), {accuracy})"
    )
    cols = [
        F.round(q.getItem(i), 4).alias(f"ap{int(p * 100)}")
        for i, p in enumerate(ps)
    ]
    return df.agg(*cols)


def facet_exclude_tag(
    df: DataFrame,
    filters: dict,
    facet_field: str,
    exclude_tags: set,
) -> DataFrame:
    """Multi-select faceting: facet.field={!ex=tag}f (solr/core/.../search/
    facet — tag/ex filter exclusion, SimpleFacets ≈L400): compute facet
    counts over the base DataFrame with every tagged filter applied EXCEPT
    the excluded tags. ``filters`` is {tag: Column-predicate}. The facet
    domain re-derives from the SAME scan — one pass, one map-side-combined
    agg; nothing is re-queried."""
    dom = df
    for tag, cond in filters.items():
        if tag not in exclude_tags:
            dom = dom.filter(cond)
    return (
        dom.groupBy(facet_field)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(facet_field))
    )
