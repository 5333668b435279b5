"""Driver entries for the multi-field document model (multifield.py) —
the REAL engine (per-field build_index → packed postings → fielded
search) vs pure ANSI-SQL DuckDB oracles.

Fields over the `documents` table:
  title := first 5 whitespace tokens of text   (SQL: string_split[1:5])
  body  := text

Reference twins: FieldInfos / PerFieldPostingsFormat (per-field postings),
IndexSearcher#collectionStatistics (per-field stats),
ExtendedDismaxQParser qf (cross-field per-term dismax),
PerFieldSimilarityWrapper (per-field similarity dispatch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_MF: dict = {}


def _mf_engine(spark, sf_dir):
    """Build once per sf_dir: simple-profile, raw-dl per-field indexes
    (title, body) over documents; url := zero-padded doc_id so dense ids
    are monotone in doc_id (same device as entry_engine)."""
    if sf_dir in _MF:
        return _MF[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .multifield import MultiFieldSearcher, build_multifield_index

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
    )
    out = tempfile.mkdtemp(prefix="lss_mf_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    indexes = build_multifield_index(
        spark,
        d,
        out,
        fields={
            "title": F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 5), " "
            ),
            "body": F.col("text"),
        },
        profile="simple",
        num_buckets=8,
        quantize=False,
    )
    idmap = indexes["body"]["docmeta"].select(
        F.col("doc_id").alias("_eid"),
        F.substring("url", 4, 9).cast("long").alias("orig_id"),
    )
    _MF[sf_dir] = {
        "indexes": indexes,
        "searcher": MultiFieldSearcher(indexes),
        # PerFieldSimilarityWrapper instance: title under ClassicSimilarity,
        # body under BM25 — each with its own field's collection stats
        "perfield": MultiFieldSearcher(
            indexes, similarities={"title": "classic", "body": "bm25"}
        ),
        "idmap": idmap,
    }
    return _MF[sf_dir]


def _to_orig(eng, df):
    return (
        df.withColumnRenamed("doc_id", "_eid")
        .join(F.broadcast(eng["idmap"]), "_eid")
        .select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


def q_fielded_term(spark, sf_dir):
    """title:vector — only the title index is scanned; BM25 uses the
    TITLE field's own df/N/avgdl (per-field CollectionStatistics)."""
    from .query import Term

    eng = _mf_engine(spark, sf_dir)
    return _to_orig(eng, eng["searcher"].search_field("title", Term("vector"), 10))


def q_dismax_fields(spark, sf_dir):
    """eDisMax qf=title^2.0,body tie=0.1 over terms (merge, join): per
    term take max cross-field score + tie*rest, sum over terms."""
    eng = _mf_engine(spark, sf_dir)
    return _to_orig(
        eng,
        eng["searcher"].dismax_fields(
            ["merge", "join"], {"title": 2.0, "body": 1.0}, 10, tie=0.1
        ),
    )


def q_perfield_sim(spark, sf_dir):
    """PerFieldSimilarityWrapper over REAL per-field indexes: title:hash
    scored by ClassicSimilarity (title stats), body:hash by BM25 (body
    stats), summed (BooleanQuery of the two fielded terms)."""
    eng = _mf_engine(spark, sf_dir)
    return _to_orig(
        eng,
        eng["perfield"].combined_sum_fields(
            ["hash"], {"title": 1.0, "body": 1.0}, 10
        ),
    )


# ---------------------------------------------------------------------------
# SQL oracles: per-field token CTEs + per-field BM25/Classic restatements
# ---------------------------------------------------------------------------

_FIELDS = """
tokT AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:5]) AS term FROM documents
),
tokB AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dlT AS (SELECT doc_id, count(*) AS dl FROM tokT GROUP BY doc_id),
dlB AS (SELECT doc_id, count(*) AS dl FROM tokB GROUP BY doc_id),
cs AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT avg(dl) FROM dlT) AS avgdlT,
         (SELECT avg(dl) FROM dlB) AS avgdlB
)"""


def _bm25(field: str, term: str, alias: str, boost: float = 1.0) -> str:
    """Per-field BM25 CTEs: tf table, df scalar, score table ``alias``."""
    tok, dl, avg = (
        ("tokT", "dlT", "avgdlT") if field == "title" else ("tokB", "dlB", "avgdlB")
    )
    return (
        f"{alias}_tf AS (SELECT doc_id, count(*) AS tf FROM {tok} "
        f"WHERE term = '{term}' GROUP BY doc_id),\n"
        f"{alias}_df AS (SELECT count(*) AS df FROM {alias}_tf),\n"
        f"{alias} AS (SELECT t.doc_id, {boost} * "
        f"ln(1 + (cs.n - d.df + 0.5) / (d.df + 0.5)) * t.tf "
        f"/ (t.tf + 1.2 * (0.25 + 0.75 * l.dl / cs.{avg})) AS score "
        f"FROM {alias}_tf t, {dl} l, cs, {alias}_df d "
        f"WHERE l.doc_id = t.doc_id)"
    )


def _classic(field: str, term: str, alias: str, boost: float = 1.0) -> str:
    """ClassicSimilarity: boost * sqrt(tf) * (ln((n+1)/(df+1))+1)^2 / sqrt(dl)."""
    tok, dl = ("tokT", "dlT") if field == "title" else ("tokB", "dlB")
    return (
        f"{alias}_tf AS (SELECT doc_id, count(*) AS tf FROM {tok} "
        f"WHERE term = '{term}' GROUP BY doc_id),\n"
        f"{alias}_df AS (SELECT count(*) AS df FROM {alias}_tf),\n"
        f"{alias} AS (SELECT t.doc_id, {boost} * sqrt(t.tf) * "
        f"pow(ln((cs.n + 1.0) / (d.df + 1.0)) + 1.0, 2) / sqrt(l.dl) AS score "
        f"FROM {alias}_tf t, {dl} l, cs, {alias}_df d "
        f"WHERE l.doc_id = t.doc_id)"
    )


SQL_FIELDED_TERM = f"""
WITH {_FIELDS},
{_bm25("title", "vector", "s1")}
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s1 ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_DISMAX_FIELDS = f"""
WITH {_FIELDS},
{_bm25("title", "merge", "tm", 2.0)},
{_bm25("body", "merge", "bm", 1.0)},
{_bm25("title", "join", "tj", 2.0)},
{_bm25("body", "join", "bj", 1.0)},
u AS (
  SELECT doc_id, 'merge' AS qt, score FROM tm
  UNION ALL SELECT doc_id, 'merge', score FROM bm
  UNION ALL SELECT doc_id, 'join', score FROM tj
  UNION ALL SELECT doc_id, 'join', score FROM bj
),
per_term AS (
  SELECT doc_id, qt,
         max(score) + 0.1 * (sum(score) - max(score)) AS score
  FROM u GROUP BY doc_id, qt
),
g AS (SELECT doc_id, sum(score) AS score FROM per_term GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_PERFIELD_SIM = f"""
WITH {_FIELDS},
{_classic("title", "hash", "tc", 1.0)},
{_bm25("body", "hash", "bb", 1.0)},
u AS (
  SELECT doc_id, score FROM tc
  UNION ALL SELECT doc_id, score FROM bb
),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

def q_edismax_alias(spark, sf_dir):
    """eDisMax field aliasing end-to-end: qf = "headline^1.5 content"
    where f.headline.qf = title^2 and f.content.qf = body — resolved to
    {title: 3.0, body: 1.0} (boosts multiply down the alias path), then
    the standard per-term cross-field dismax with tie=0.25
    (ExtendedDismaxQParser.Alias / SolrPluginUtils#parseFieldBoosts)."""
    from .query_parser import parse_field_boosts, resolve_field_aliases

    eng = _mf_engine(spark, sf_dir)
    qf = resolve_field_aliases(
        parse_field_boosts("headline^1.5 content"),
        {"headline": {"title": 2.0}, "content": {"body": 1.0}},
    )
    assert qf == {"title": 3.0, "body": 1.0}
    return _to_orig(
        eng, eng["searcher"].dismax_fields(["sort", "tree"], qf, 10, tie=0.25)
    )


SQL_EDISMAX_ALIAS = f"""
WITH {_FIELDS},
{_bm25("title", "sort", "ts", 3.0)},
{_bm25("body", "sort", "bs", 1.0)},
{_bm25("title", "tree", "tt", 3.0)},
{_bm25("body", "tree", "bt", 1.0)},
u AS (
  SELECT doc_id, 'sort' AS qt, score FROM ts
  UNION ALL SELECT doc_id, 'sort', score FROM bs
  UNION ALL SELECT doc_id, 'tree', score FROM tt
  UNION ALL SELECT doc_id, 'tree', score FROM bt
),
per_term AS (
  SELECT doc_id, qt,
         max(score) + 0.25 * (sum(score) - max(score)) AS score
  FROM u GROUP BY doc_id, qt
),
g AS (SELECT doc_id, sum(score) AS score FROM per_term GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_MULTIFIELD = {
    "engine_edismax_alias_sql": (q_edismax_alias, SQL_EDISMAX_ALIAS),
    "engine_fielded_term_sql": (q_fielded_term, SQL_FIELDED_TERM),
    "engine_dismax_fields_sql": (q_dismax_fields, SQL_DISMAX_FIELDS),
    "engine_perfield_sim_sql": (q_perfield_sim, SQL_PERFIELD_SIM),
}


def q_combined_field(spark, sf_dir):
    """CombinedFieldQuery / BM25F 'vector merge' over title^2 + body:
    one pseudo-field (summed weighted tfs, combined weighted lengths,
    max-df pseudo term stats), one BM25 saturation."""
    eng = _mf_engine(spark, sf_dir)
    return _to_orig(
        eng,
        eng["searcher"].combined_field_query(
            ["vector", "merge"], {"title": 2.0, "body": 1.0}, 10
        ),
    )


SQL_COMBINED_FIELD = f"""
WITH {_FIELDS},
wtf AS (
  SELECT doc_id, term, sum(w) AS tf FROM (
    SELECT doc_id, term, 2.0 * count(*) AS w FROM tokT
    WHERE term IN ('vector','merge') GROUP BY doc_id, term
    UNION ALL
    SELECT doc_id, term, 1.0 * count(*) AS w FROM tokB
    WHERE term IN ('vector','merge') GROUP BY doc_id, term)
  GROUP BY doc_id, term),
dfs AS (
  SELECT d.term,
         greatest(
           (SELECT count(DISTINCT doc_id) FROM tokT WHERE term = d.term),
           (SELECT count(DISTINCT doc_id) FROM tokB WHERE term = d.term))
           AS df
  FROM (SELECT DISTINCT term FROM wtf) d),
cdl AS (
  SELECT dlT.doc_id, 2.0 * dlT.dl + 1.0 * dlB.dl AS dl
  FROM dlT JOIN dlB ON dlT.doc_id = dlB.doc_id),
av AS (
  SELECT 2.0 * (SELECT avg(dl) FROM dlT)
       + 1.0 * (SELECT avg(dl) FROM dlB) AS avgdl),
sc AS (
  SELECT wtf.doc_id,
         ln(1 + (cs.n - dfs.df + 0.5) / (dfs.df + 0.5)) * wtf.tf
           / (wtf.tf + 1.2 * (0.25 + 0.75 * cdl.dl / av.avgdl)) AS score
  FROM wtf
  JOIN dfs ON wtf.term = dfs.term
  JOIN cdl ON cdl.doc_id = wtf.doc_id, cs, av),
g AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

REGISTRY_MULTIFIELD.update(
    {
        "engine_combined_field_sql": (q_combined_field, SQL_COMBINED_FIELD),
    }
)
