"""Driver entries for numeric DocValues updates + soft deletes
(docvalues.py) — the REAL update-log machinery (parquet generations +
manifest commits on a real index dir) vs pure ANSI-SQL oracles.

Deterministic update script applied once per sf_dir at engine build:
  gen1: popularity := orig_id * 3.0   for orig_id % 7 == 0
  gen2: popularity := orig_id * 5.0   for orig_id % 14 == 0  (overrides gen1)
  gen3: soft-delete                   for orig_id % 13 == 0
Base value for popularity is docmeta.field_len (the doc's token count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_DV: dict = {}


def _dv_engine(spark, sf_dir):
    if sf_dir in _DV:
        return _DV[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .docvalues import soft_delete, update_numeric_docvalues
    from .indexer import build_index, read_index
    from .search import Searcher

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
    )
    out = tempfile.mkdtemp(prefix="lss_dv_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    build_index(spark, d, out, profile="simple", num_buckets=8, quantize=False)
    idx = read_index(spark, out)
    idmap = idx["docmeta"].select(
        F.col("doc_id"),
        F.substring("url", 4, 9).cast("long").alias("orig_id"),
    )
    # the update script, keyed on engine ids via orig_id arithmetic
    g1 = idmap.filter(F.col("orig_id") % 7 == 0).select(
        "doc_id", (F.col("orig_id") * 3.0).alias("value")
    )
    update_numeric_docvalues(spark, out, g1, "popularity")
    g2 = idmap.filter(F.col("orig_id") % 14 == 0).select(
        "doc_id", (F.col("orig_id") * 5.0).alias("value")
    )
    update_numeric_docvalues(spark, out, g2, "popularity")
    soft_delete(spark, out, idmap.filter(F.col("orig_id") % 13 == 0))
    _DV[sf_dir] = {
        "out": out,
        "index": idx,
        "searcher": Searcher(idx),
        "idmap": idmap,
    }
    return _DV[sf_dir]


def q_docvalue_update_read(spark, sf_dir):
    """updateNumericDocValue + reader overlay: popularity = latest update
    generation (gen2 beats gen1) else the base docvalue (field_len)."""
    from .docvalues import resolve_docvalues

    eng = _dv_engine(spark, sf_dir)
    r = resolve_docvalues(
        spark, eng["out"], eng["index"]["docmeta"], "popularity", "field_len"
    )
    return (
        r.join(eng["idmap"].withColumnRenamed("orig_id", "_oid"), "doc_id")
        .select(
            F.col("_oid").alias("doc_id"),
            F.round("popularity", 4).alias("popularity"),
        )
    )


def q_soft_delete_search(spark, sf_dir):
    """Soft deletes mask search results (liveDocs from the __soft_deletes
    docvalues field) while collection stats still count the deleted docs
    (Lucene keeps them in df/N/avgdl until merge): BM25 term top-10 over
    live docs only."""
    from .docvalues import live_filter
    from .query import Term

    eng = _dv_engine(spark, sf_dir)
    hits = eng["searcher"].search(Term("merge"), 10_000, with_fields=False)
    live = live_filter(spark, eng["out"], hits)
    top = live.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    return (
        top.join(F.broadcast(eng["idmap"].withColumnRenamed("orig_id", "_oid")), "doc_id")
        .select(F.col("_oid").alias("doc_id"), F.round("score", 4).alias("score"))
    )


def q_soft_delete_retention_merge(spark, sf_dir):
    """SoftDeletesRetentionMergePolicy: the merge drops soft-deleted docs
    EXCEPT those matching the retention query (field_len >= 60 here);
    docvalues updates bake in during the same merge. Returns the merged
    docmeta's (doc_id, popularity)."""
    from .docvalues import fold_docvalues

    eng = _dv_engine(spark, sf_dir)
    merged = fold_docvalues(
        spark,
        eng["out"],
        eng["index"]["docmeta"],
        numeric_fields={"popularity": "field_len"},
        retention=F.col("field_len") >= 60,
    )
    return (
        merged.join(eng["idmap"].withColumnRenamed("orig_id", "_oid"), "doc_id")
        .select(
            F.col("_oid").alias("doc_id"),
            F.round("popularity", 4).alias("popularity"),
        )
    )


_POP = """
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
pop AS (
  SELECT doc_id,
         CASE WHEN doc_id % 14 = 0 THEN doc_id * 5.0
              WHEN doc_id % 7  = 0 THEN doc_id * 3.0
              ELSE dl END AS popularity,
         dl
  FROM dl
)"""

SQL_DOCVALUE_UPDATE_READ = f"""
WITH {_POP}
SELECT doc_id, ROUND(popularity, 4) AS popularity FROM pop
"""

SQL_SOFT_DELETE_SEARCH = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'merge' GROUP BY doc_id),
dfv AS (SELECT count(*) AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (cstats.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM scored WHERE doc_id % 13 <> 0
      ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_SOFT_DELETE_RETENTION = f"""
WITH {_POP}
SELECT doc_id, ROUND(popularity, 4) AS popularity
FROM pop
WHERE doc_id % 13 <> 0 OR dl >= 60
"""

REGISTRY_DOCVALUES = {
    "docvalue_update_read": (q_docvalue_update_read, SQL_DOCVALUE_UPDATE_READ),
    "soft_delete_search": (q_soft_delete_search, SQL_SOFT_DELETE_SEARCH),
    "soft_delete_retention_merge": (
        q_soft_delete_retention_merge,
        SQL_SOFT_DELETE_RETENTION,
    ),
}
