"""Web-corpus preparation operators: URL canonicalization, URL-level
dedup, and per-host corpus statistics.

The reference indexes Common-Crawl-style pages keyed by url
(SURVEY.md §2 data model: (url, warc_ts, html, text, lang)); every real
crawl pipeline canonicalizes URLs before dedup because the same page is
fetched under scheme/case/port/tracking-param variants. These are the
standard RFC 3986 syntax-based normalizations plus tracking-parameter
stripping (the "safe" tier — no content fetch needed):

  1. drop the fragment (never sent to the server)
  2. lowercase scheme and host (RFC 3986 §6.2.2.1)
  3. strip a leading ``www.`` label (crawl-dedup convention)
  4. strip default ports (http:80 / https:443), keep explicit others
  5. drop tracking query params (utm_*, fbclid, gclid, msclkid, igshid,
     mc_eid, ref_src)
  6. sort surviving query params bytewise (param order is almost never
     semantic; sorting makes equivalent URLs compare equal)
  7. strip trailing slashes from the path; an empty path becomes "/"

Everything is JVM-side Column expressions (regexp + array lambdas) —
a narrow zero-shuffle map, so at 10^12 rows the canonicalizer runs at
scan speed inside whole-stage codegen. ``url_dedup`` adds exactly one
shuffle keyed by the canonical url (hash-partitioned, no skew beyond the
natural duplicate-group sizes); ``host_stats`` one shuffle keyed by host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking params dropped by step 5. Kept in one place so the Spark
# expression and any SQL twin agree on the exact set.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid|ref_src)="


def canonical_url_col(url: Column) -> Column:
    """The canonical form of ``url`` as a single Column expression."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.regexp_extract(
        nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    is_default = ((scheme == F.lit("http")) & (port == F.lit("80"))) | (
        (scheme == F.lit("https")) & (port == F.lit("443"))
    )
    portpart = F.when(
        (port == F.lit("")) | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path0 = F.regexp_extract(
        nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path1 = F.regexp_replace(path0, r"/+$", "")
    path = F.when(path1 == F.lit(""), F.lit("/")).otherwise(path1)
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append the canonical url column. Narrow map, zero shuffle."""
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))


def canonical_host_col(url: Column) -> Column:
    """Canonical host (lowercased, www-stripped, port dropped)."""
    hostport = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")), r"^www\.", ""
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row per canonical url — the lowest id (crawl
    pipelines keep the earliest fetch). One hash shuffle on the canonical
    url; the min-aggregation is map-side partial, so even a url duplicated
    across every input partition reduces to one row per partition before
    the exchange."""
    c = canonicalize_url(df, url_col)
    keep = c.groupBy("canonical_url").agg(F.min(id_col).alias(id_col))
    return c.join(keep, ["canonical_url", id_col], "inner")


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus stats: pages, distinct canonical urls, dup pages.
    The standard pre-filter signal for crawl curation (boilerplate farms
    show pages >> distinct urls)."""
    c = canonicalize_url(df, url_col).withColumn(
        "host", canonical_host_col(F.col(url_col))
    )
    return (
        c.groupBy("host")
        .agg(
            F.count("*").alias("pages"),
            F.count_distinct("canonical_url").alias("distinct_urls"),
            (F.count("*") - F.count_distinct("canonical_url")).alias(
                "dup_pages"
            ),
        )
        .orderBy(F.desc("pages"), F.asc("host"))
    )


def host_cap_sample(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    order_col: str | None = None,
    descending: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-host document cap — the standard web-pipeline guard against a
    single host dominating the training mix (a handful of hosts hold a
    huge share of any crawl; cf. C4/Gopher host-balancing): keep at most
    `cap` documents per canonical host, preferring high `order_col`
    (quality score, length, ...) with the canonical url as the
    deterministic tie-break. order_col=None keeps the cap deterministic
    on url alone.

    Scale shape: ONE shuffle keyed by host (window row_number with
    partial pre-ranking impossible — row_number needs the full host
    group), then a narrow filter. Host groups are the skew surface: the
    window sorts each host's rows, so a 10^8-page host costs one task's
    sort — if a crawl has such hosts, pre-filter them with host_stats +
    a count cap before the window (same two-step every production
    pipeline uses)."""
    from pyspark.sql import Window

    host = canonical_host_col(F.col(url_col))
    keys = [F.col("_ord").desc() if descending else F.col("_ord").asc()] if order_col else []
    # tiebreak columns make the cap fully deterministic when distinct rows
    # share (order_col, canonical_url) — e.g. a stable document id
    w = Window.partitionBy("_host").orderBy(
        *keys,
        canonical_url_col(F.col(url_col)).asc(),
        *[F.col(c).asc() for c in (tiebreak or [])],
    )
    out = (
        df.withColumn("_host", host)
        .withColumn("_ord", F.col(order_col) if order_col else F.lit(0))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_ord", "_rk")
        .withColumnRenamed("_host", "host")
    )
    return out


def detect_template_ngrams(
    docs: DataFrame,
    n: int = 2,
    min_frac: float = 0.16,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate / template-phrase detection: word n-grams recurring in
    >= min_frac of a GROUP's (host / source / template) documents are
    template text — nav bars, footers, legal boilerplate — the standard
    pre-dedup cleanup in Common-Crawl-style pipelines (the per-site
    frequency test jusText/trafilatura apply per line, applied here per
    shingle since the corpus has no line structure).

    Plan: transform() shingling in codegen -> explode -> DISTINCT
    (group, shingle, doc) -> one (group, shingle)-keyed agg joined to a
    broadcast per-group doc count. Nothing ever compares doc pairs; the
    shuffle is keyed by (group, shingle) so 10^12 docs fan out by
    content, not by site size (a mega-site's shingles spread over the
    whole cluster).
    """
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    per_doc = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("_id"),
            F.explode(shingles).alias("shingle"),
        )
        .dropDuplicates(["grp", "_id", "shingle"])
    )
    group_sizes = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs_grp")
    )
    counts = per_doc.groupBy("grp", "shingle").agg(
        F.count("*").alias("n_docs")
    )
    return (
        counts.join(F.broadcast(group_sizes), "grp")
        .withColumn(
            "doc_frac", F.round(F.col("n_docs") / F.col("n_docs_grp"), 6)
        )
        .filter(F.col("doc_frac") >= min_frac)
        .select(
            F.col("grp").alias(group_col), "shingle", "n_docs", "doc_frac"
        )
        .orderBy(group_col, "shingle")
    )


def remove_template_ngrams(
    docs: DataFrame,
    templates: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply boilerplate removal: every token position covered by one of
    the group's flagged template n-grams (output of
    detect_template_ngrams, or any (group, shingle) table) is dropped and
    the document re-assembled — the cleanup step after per-site template
    detection in a CC-style pipeline.

    Plan shape: posexplode in codegen -> shingle view via lead() windows
    (per-doc partitions) -> broadcast join against the flagged shingles
    (the template table is tiny BY CONSTRUCTION — min_frac caps it near
    vocab², independent of corpus size) -> covered-offset explode ->
    anti-join on (doc, pos) -> sorted re-assembly with one array_sort
    (no second shuffle: assembly groups on the same doc key the windows
    partitioned by). Returns (id, cleaned_text, n_removed).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("_id").orderBy("pos")
    sh = toks.select(
        "grp",
        "_id",
        "pos",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", i).over(w) for i in range(1, n)]
        ).alias("shingle"),
        F.lead("tok", n - 1).over(w).isNotNull().alias("_full"),
    ).filter(F.col("_full"))
    flagged = templates.select(
        F.col(group_col).alias("grp"), "shingle"
    ).dropDuplicates(["grp", "shingle"])
    hits = sh.join(F.broadcast(flagged), ["grp", "shingle"])
    covered = hits.select(
        "_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
        ).alias("pos"),
    ).dropDuplicates(["_id", "pos"])
    kept = toks.join(covered, ["_id", "pos"], "left_anti")
    out = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept"),
    )
    lens = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_orig"),
    )
    return (
        out.join(lens, "_id")
        .select(
            F.col("_id").alias(id_col),
            "cleaned_text",
            (F.col("n_orig") - F.col("n_kept")).alias("n_removed"),
        )
        .orderBy(id_col)
    )
