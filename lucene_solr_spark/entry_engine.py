"""Driver-contract entries that run the REAL engine end-to-end —
build_index (simple profile, unquantized norms) -> packed posting blocks ->
WandSearcher / Searcher — and verify against a pure ANSI-SQL DuckDB oracle.

This is the strongest correctness claim in the registry: the whole physical
pipeline (vectorized analysis, delta+varint blocks, block-max WAND pruning,
bucket-pruned stats lookup) must reproduce the mathematical BM25 definition
the SQL states. The quantized english profile (Porter, SmallFloat norms —
not SQL-expressible) is covered by oracle.py tests instead (SURVEY.md §6.2
item 8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_ENGINE: dict = {}


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _engine(spark, sf_dir):
    """Build once per sf_dir: simple-profile, raw-dl index over documents
    (url := zero-padded doc_id so dense ids are monotone in doc_id)."""
    if sf_dir in _ENGINE:
        return _ENGINE[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .indexer import build_index, read_index
    from .search import Searcher
    from .wand import WandSearcher

    d = _docs(spark, sf_dir).select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
    )
    out = tempfile.mkdtemp(prefix="lss_wand_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    build_index(
        spark, d, out, profile="simple", num_buckets=8, quantize=False
    )
    idx = read_index(spark, out)
    # map engine-internal dense ids back to the original doc_id
    idmap = idx["docmeta"].select(
        F.col("doc_id").alias("_eid"),
        F.substring("url", 4, 9).cast("long").alias("orig_id"),
    )
    _ENGINE[sf_dir] = {
        "index": idx,
        "searcher": Searcher(idx),
        "wand": WandSearcher(idx),
        "idmap": idmap,
    }
    return _ENGINE[sf_dir]


def _to_orig(eng, df):
    """(doc_id=dense, score) -> (doc_id=original, score) rounded."""
    return (
        df.withColumnRenamed("doc_id", "_eid")
        .join(F.broadcast(eng["idmap"]), "_eid")
        .select(
            F.col("orig_id").alias("doc_id"), F.round("score", 4).alias("score")
        )
    )


def q_engine_wand_term(spark, sf_dir):
    """Full engine path for a TermQuery: packed blocks + block-max WAND
    (WANDScorer.java ≈L60) == SQL BM25 definition."""
    eng = _engine(spark, sf_dir)
    return _to_orig(eng, eng["wand"].search(["dup"], 10, "or"))


def q_engine_wand_or(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return _to_orig(eng, eng["wand"].search(["dup", "vector"], 10, "or"))


def q_engine_wand_and(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return _to_orig(eng, eng["wand"].search(["dup", "vector"], 10, "and"))


def q_engine_searcher_bool(spark, sf_dir):
    """Searcher plan-compiler path (union+groupBy scorer DAG) on the same
    index: SHOULD over three terms."""
    from .query import Boolean, Term

    eng = _engine(spark, sf_dir)
    q = Boolean(should=[Term("dup"), Term("vector"), Term("window")])
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


_TOK = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl
)"""

_BM25 = (
    "ln(1 + (cstats.n - {df} + 0.5) / ({df} + 0.5)) * {tf}"
    " / ({tf} + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))"
)


def _sql_scores(i: int, term: str) -> str:
    return (
        f"t{i} AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = '{term}' GROUP BY doc_id),\n"
        f"d{i} AS (SELECT count(*) AS df FROM t{i}),\n"
        f"s{i} AS (SELECT t{i}.doc_id, "
        + _BM25.format(df=f"d{i}.df", tf=f"t{i}.tf")
        + f" AS score FROM t{i}, dl, cstats, d{i} WHERE dl.doc_id = t{i}.doc_id)"
    )


SQL_ENGINE_WAND_TERM = f"""
WITH {_TOK},
{_sql_scores(1, "dup")}
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s1 ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_ENGINE_WAND_OR = f"""
WITH {_TOK},
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
u AS (SELECT doc_id, score FROM s1 UNION ALL SELECT doc_id, score FROM s2),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_ENGINE_WAND_AND = f"""
WITH {_TOK},
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
g AS (SELECT s1.doc_id, s1.score + s2.score AS score
      FROM s1 JOIN s2 ON s1.doc_id = s2.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_ENGINE_SEARCHER_BOOL = f"""
WITH {_TOK},
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
{_sql_scores(3, "window")},
u AS (SELECT doc_id, score FROM s1 UNION ALL SELECT doc_id, score FROM s2
      UNION ALL SELECT doc_id, score FROM s3),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

def q_engine_multi_phrase(spark, sf_dir):
    """MultiPhraseQuery through the real engine: per-slot union of
    positions (UnionPostingsEnum), shifted intersect, BM25 with summed
    constituent idfs — '(hash|merge) join'."""
    from .query import MultiPhrase

    eng = _engine(spark, sf_dir)
    q = MultiPhrase(slots=(("hash", "merge"), ("join",)))
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


SQL_ENGINE_MULTI_PHRASE = """
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
p1 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term IN ('hash', 'merge')),
p2 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term = 'join'),
d1 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'hash'),
d2 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'merge'),
d3 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'join'),
ptf AS (SELECT p1.doc_id, count(*) AS tf
        FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        GROUP BY p1.doc_id),
idfs AS (SELECT ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5))
              + ln(1 + (cstats.n - d2.df + 0.5) / (d2.df + 0.5))
              + ln(1 + (cstats.n - d3.df + 0.5) / (d3.df + 0.5)) AS s
         FROM cstats, d1, d2, d3),
g AS (SELECT ptf.doc_id,
             idfs.s * ptf.tf
               / (ptf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
      FROM ptf, dl, cstats, idfs WHERE dl.doc_id = ptf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_query_parser(spark, sf_dir):
    """Classic query-parser syntax end-to-end: parse_classic
    ('+dup (vector OR window) -"merge join"') -> AST -> the real engine
    (QueryParser.jj grammar + QueryParserBase#addClause occur assembly);
    the oracle restates the full boolean semantics in SQL: required dup
    score + optional vector/window scores, docs with the adjacent phrase
    "merge join" excluded."""
    from .query_parser import parse_classic

    eng = _engine(spark, sf_dir)
    q = parse_classic('+dup (vector OR window) -"merge join"', profile="simple")
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


SQL_ENGINE_QUERY_PARSER = f"""
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
tok AS (SELECT doc_id, term FROM tokp),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
{_sql_scores(3, "window")},
ph AS (SELECT DISTINCT a.doc_id
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'merge' AND b.term = 'join'),
g AS (SELECT s1.doc_id,
             s1.score + coalesce(s2.score, 0) + coalesce(s3.score, 0) AS score
      FROM s1
      LEFT JOIN s2 ON s1.doc_id = s2.doc_id
      LEFT JOIN s3 ON s1.doc_id = s3.doc_id
      WHERE s1.doc_id NOT IN (SELECT doc_id FROM ph))
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_edismax(spark, sf_dir):
    """eDisMax user-query parsing end-to-end: parse_edismax('dup vector',
    pf boost 2, slop 0) -> SHOULD terms + boosted exact-phrase sibling ->
    the real engine. Oracle: sum of the two term BM25 scores plus 2 x the
    phrase BM25 (phrase tf = adjacent 'dup vector' count, idf = summed
    constituent idfs)."""
    from .query_parser import parse_edismax

    eng = _engine(spark, sf_dir)
    q = parse_edismax("dup vector", profile="simple", phrase_boost=2.0)
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


SQL_ENGINE_EDISMAX = f"""
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
tok AS (SELECT doc_id, term FROM tokp),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
p1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'dup'),
p2 AS (SELECT doc_id, pos FROM tokp WHERE term = 'vector'),
ptf AS (SELECT p1.doc_id, count(*) AS tf
        FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        GROUP BY p1.doc_id),
pidf AS (SELECT ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5))
              + ln(1 + (cstats.n - d2.df + 0.5) / (d2.df + 0.5)) AS s
         FROM cstats, d1, d2),
ps AS (SELECT ptf.doc_id,
              2.0 * pidf.s * ptf.tf
                / (ptf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
       FROM ptf, dl, cstats, pidf WHERE dl.doc_id = ptf.doc_id),
u AS (SELECT doc_id, score FROM s1 UNION ALL SELECT doc_id, score FROM s2
      UNION ALL SELECT doc_id, score FROM ps),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_explain(spark, sf_dir):
    """IndexSearcher#explain parity: per-term BM25 score breakdown (tf,
    df, idf, dl, tf_norm, contrib) for doc 8 on {dup, vector}, through
    the real engine (internal ids == original ids here because urls are
    zero-padded doc ids and ids are url-rank)."""
    eng = _engine(spark, sf_dir)
    return eng["searcher"].explain(["dup", "vector"], 8)


SQL_ENGINE_EXPLAIN = f"""
WITH {_TOK},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ('dup', 'vector') GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT tf.term, CAST(tf.tf AS INT) AS tf, dfs.df,
       ROUND(ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5)), 4) AS idf,
       CAST(dl.dl AS INT) AS dl,
       ROUND(tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)), 4)
         AS tf_norm,
       ROUND(ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)), 4)
         AS contrib
FROM tf JOIN dfs USING (term) JOIN dl ON dl.doc_id = tf.doc_id, cstats
WHERE tf.doc_id = 8 ORDER BY term
"""


def q_streaming_window_counts(spark, sf_dir):
    """Watermarked tumbling-window agg (streaming/incremental.py) run on the
    batch events table — Spark's unified batch/stream semantics make the
    same plan checkable against plain SQL (window == date_trunc hour)."""
    from .streaming import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(events, "1 hour", "2 hours")
    return (
        out.select(
            F.unix_timestamp("window_start").alias("win_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 4).alias("sum_value"),
        ).orderBy("win_start", "event_type")
    )


SQL_STREAMING_WINDOW_COUNTS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
       event_type,
       count(*) AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_engine_maxscore(spark, sf_dir):
    """MAXSCORE dynamic pruning through the real engine
    (MaxScoreBulkScorer.java: essential/non-essential term partition by
    global max score vs θ) — must equal the same SQL BM25 sum as WAND on
    the 3-term disjunction."""
    eng = _engine(spark, sf_dir)
    return _to_orig(
        eng, eng["wand"].search_maxscore(["dup", "vector", "window"], 10)
    )


SQL_ENGINE_MAXSCORE = SQL_ENGINE_SEARCHER_BOOL


_SORTED: dict = {}


def _engine_sorted(spark, sf_dir):
    """Index-SORTED engine (IndexWriterConfig#setIndexSort): documents
    indexed with sort_by=[("n_chars", "desc")], so dense doc ids are
    monotone in document length (longest first, url tiebreak)."""
    if sf_dir in _SORTED:
        return _SORTED[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .indexer import build_index, read_index

    d = _docs(spark, sf_dir).select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
        "n_chars",
    )
    out = tempfile.mkdtemp(prefix="lss_sorted_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    build_index(
        spark, d, out, profile="simple", num_buckets=8, quantize=False,
        sort_by=[("n_chars", "desc")],
    )
    idx = read_index(spark, out)
    idmap = idx["docmeta"].select(
        F.col("doc_id").alias("_eid"),
        F.substring("url", 4, 9).cast("long").alias("orig_id"),
    )
    _SORTED[sf_dir] = {"index": idx, "idmap": idmap}
    return _SORTED[sf_dir]


def q_engine_sorted_early(spark, sf_dir):
    """Early-terminated sorted top-k on the REAL sorted index
    (TopFieldCollector early termination over a setIndexSort segment,
    LUCENE-6766): the 10 longest documents containing both 'dup' and
    'vector', found by probing only leading doc-id ranges of the posting
    lists (operators/sorted_index.py)."""
    from .operators.sorted_index import assert_index_sorted, early_terminated_topk

    eng = _engine_sorted(spark, sf_dir)
    assert_index_sorted(eng["index"])
    top = early_terminated_topk(
        eng["index"], ["dup", "vector"], k=10, mode="and"
    )
    return (
        top.withColumnRenamed("doc_id", "_eid")
        .join(F.broadcast(eng["idmap"]), "_eid")
        .join(
            _docs(spark, sf_dir).select(
                F.col("doc_id").alias("orig_id"), "n_chars"
            ),
            "orig_id",
        )
        .select(F.col("orig_id").alias("doc_id"), "n_chars")
        .orderBy(F.col("n_chars").desc(), "doc_id")
    )


SQL_ENGINE_SORTED_EARLY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (
  SELECT doc_id FROM tok WHERE term IN ('dup', 'vector')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
)
SELECT d.doc_id, d.n_chars
FROM m JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id LIMIT 10
"""


REGISTRY_ENGINE: dict[str, tuple] = {
    "streaming_window_counts": (
        q_streaming_window_counts,
        SQL_STREAMING_WINDOW_COUNTS,
    ),
    "engine_wand_term_sql": (q_engine_wand_term, SQL_ENGINE_WAND_TERM),
    "engine_wand_or_sql": (q_engine_wand_or, SQL_ENGINE_WAND_OR),
    "engine_wand_and_sql": (q_engine_wand_and, SQL_ENGINE_WAND_AND),
    "engine_searcher_bool_sql": (q_engine_searcher_bool, SQL_ENGINE_SEARCHER_BOOL),
    "engine_multi_phrase_sql": (q_engine_multi_phrase, SQL_ENGINE_MULTI_PHRASE),
    "engine_query_parser_sql": (q_engine_query_parser, SQL_ENGINE_QUERY_PARSER),
    "engine_edismax_sql": (q_engine_edismax, SQL_ENGINE_EDISMAX),
    "engine_explain_sql": (q_engine_explain, SQL_ENGINE_EXPLAIN),
    "engine_sorted_early_sql": (q_engine_sorted_early, SQL_ENGINE_SORTED_EARLY),
    "engine_maxscore_sql": (q_engine_maxscore, SQL_ENGINE_MAXSCORE),
}


def q_engine_synonym_rewrite(spark, sf_dir):
    """Query-time synonym expansion through the REAL engine: parse
    '"hash join"', expand {hash -> merge} (query_parser.expand_synonyms),
    yielding MultiPhrase(((hash|merge), join)) — the exact-semantics
    query-time path that index-time graph flattening cannot give — then
    score with the per-slot position-union matcher."""
    from .query_parser import expand_synonyms, parse_classic

    eng = _engine(spark, sf_dir)
    q = parse_classic('"hash join"', profile="simple")
    q2 = expand_synonyms(q, {"hash": ["merge"]})
    return _to_orig(eng, eng["searcher"].search(q2, 10, with_fields=False))


# identical semantics to SQL_ENGINE_MULTI_PHRASE (the rewrite must produce
# exactly that query), restated independently so the entry stands alone
SQL_ENGINE_SYNONYM_REWRITE = """
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
p1 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term IN ('hash', 'merge')),
p2 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term = 'join'),
d1 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'hash'),
d2 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'merge'),
d3 AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'join'),
ptf AS (SELECT p1.doc_id, count(*) AS tf
        FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        GROUP BY p1.doc_id),
idf AS (SELECT ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5))
             + ln(1 + (cstats.n - d2.df + 0.5) / (d2.df + 0.5))
             + ln(1 + (cstats.n - d3.df + 0.5) / (d3.df + 0.5)) AS v
        FROM cstats, d1, d2, d3),
scored AS (
  SELECT ptf.doc_id,
         idf.v * ptf.tf / (ptf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))
           AS score
  FROM ptf, dl, cstats, idf WHERE dl.doc_id = ptf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10) t
"""

REGISTRY_ENGINE.update(
    {"engine_synonym_rewrite_sql": (q_engine_synonym_rewrite, SQL_ENGINE_SYNONYM_REWRITE)}
)


def q_engine_edismax_pf23(spark, sf_dir):
    """eDisMax pf2/pf3 shingled phrase boosts through the real engine
    (solr ExtendedDismaxQParser#addShingledPhraseQueries): user query
    'dup vector merge', every adjacent bigram added as a slop-0 phrase
    SHOULD clause boosted 1.5 and the trigram boosted 1.25; all boosts
    sit outside the mm boolean (`+(main) pf2 pf2 pf3`). Oracle: sum of
    the three term BM25 scores + boosted phrase scores (phrase idf = sum
    of constituent idfs, phrase tf = adjacency count)."""
    from .query_parser import parse_edismax

    eng = _engine(spark, sf_dir)
    q = parse_edismax(
        "dup vector merge", profile="simple", pf2=1.5, pf3=1.25
    )
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


def _sql_phrase2(name: str, t1: str, t2: str, boost: float, d1: str, d2: str) -> str:
    return (
        f"{name}tf AS (SELECT a.doc_id, count(*) AS tf FROM tokp a "
        f"JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        f"WHERE a.term = '{t1}' AND b.term = '{t2}' GROUP BY a.doc_id),\n"
        f"{name} AS (SELECT {name}tf.doc_id, {boost} * "
        f"(ln(1 + (cstats.n - {d1}.df + 0.5) / ({d1}.df + 0.5)) + "
        f"ln(1 + (cstats.n - {d2}.df + 0.5) / ({d2}.df + 0.5))) * {name}tf.tf "
        f"/ ({name}tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score "
        f"FROM {name}tf, dl, cstats, {d1}, {d2} WHERE dl.doc_id = {name}tf.doc_id)"
    )


SQL_ENGINE_EDISMAX_PF23 = f"""
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
tok AS (SELECT doc_id, term FROM tokp),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
{_sql_scores(3, "merge")},
{_sql_phrase2("b12", "dup", "vector", 1.5, "d1", "d2")},
{_sql_phrase2("b23", "vector", "merge", 1.5, "d2", "d3")},
tritf AS (SELECT a.doc_id, count(*) AS tf FROM tokp a
          JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          JOIN tokp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
          WHERE a.term = 'dup' AND b.term = 'vector' AND c.term = 'merge'
          GROUP BY a.doc_id),
tri AS (SELECT tritf.doc_id, 1.25 *
          (ln(1 + (cstats.n - d1.df + 0.5) / (d1.df + 0.5))
         + ln(1 + (cstats.n - d2.df + 0.5) / (d2.df + 0.5))
         + ln(1 + (cstats.n - d3.df + 0.5) / (d3.df + 0.5))) * tritf.tf
          / (tritf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
        FROM tritf, dl, cstats, d1, d2, d3 WHERE dl.doc_id = tritf.doc_id),
u AS (SELECT doc_id, score FROM s1 UNION ALL SELECT doc_id, score FROM s2
      UNION ALL SELECT doc_id, score FROM s3
      UNION ALL SELECT doc_id, score FROM b12
      UNION ALL SELECT doc_id, score FROM b23
      UNION ALL SELECT doc_id, score FROM tri),
g AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_edismax_bqbf(spark, sf_dir):
    """eDisMax bq (additive boost query) + bf (boost function) through
    the real engine (ExtendedDismaxQParser#getBoostQueries /
    #getBoostFunctions): user query 'dup vector' with
    bq = merge^0.5 (ADDS 0.5x merge's BM25, unlike multiplicative Boost)
    and bf = recip(doc_id, 1, 100, 100) == 100/(100+doc_id), a freshness-
    style FunctionScore over docmeta. Matching stays governed by the
    required user query: `+(dup vector) bq bf`."""
    from .query import Boost, Term
    from .query_parser import parse_edismax

    eng = _engine(spark, sf_dir)
    q = parse_edismax(
        "dup vector", profile="simple",
        bq=Boost(Term("merge"), 0.5),
        bf="100.0 / (100.0 + doc_id)",
    )
    return _to_orig(eng, eng["searcher"].search(q, 10, with_fields=False))


SQL_ENGINE_EDISMAX_BQBF = f"""
WITH {_TOK},
{_sql_scores(1, "dup")},
{_sql_scores(2, "vector")},
{_sql_scores(3, "merge")},
m AS (SELECT doc_id, sum(score) AS score
      FROM (SELECT doc_id, score FROM s1
            UNION ALL SELECT doc_id, score FROM s2) u GROUP BY doc_id),
g AS (SELECT m.doc_id,
             m.score + coalesce(0.5 * s3.score, 0)
                     + 100.0 / (100.0 + m.doc_id) AS score
      FROM m LEFT JOIN s3 ON m.doc_id = s3.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

REGISTRY_ENGINE.update(
    {
        "engine_edismax_pf23_sql": (q_engine_edismax_pf23, SQL_ENGINE_EDISMAX_PF23),
        "engine_edismax_bqbf_sql": (q_engine_edismax_bqbf, SQL_ENGINE_EDISMAX_BQBF),
    }
)


def q_engine_prefix_scoring(spark, sf_dir):
    """MultiTermQuery SCORING_BOOLEAN_REWRITE through the real engine
    (MultiTermQuery.java ≈L60, ScoringRewrite.SCORING_BOOLEAN_REWRITE):
    prefix s* expands against the terms dict into SHOULD TermQueries,
    each scored with its OWN df; TooManyClauses guard at 1024."""
    from .query import Prefix

    eng = _engine(spark, sf_dir)
    s = eng["searcher"]
    q = s.rewrite_multiterm(Prefix("s"), "scoring_boolean")
    return _to_orig(eng, s.search(q, 10, with_fields=False))


SQL_ENGINE_PREFIX_SCORING = f"""
WITH {_TOK},
mt AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term LIKE 's%' GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM mt GROUP BY term),
sc AS (SELECT mt.doc_id,
              ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5)) * mt.tf
              / (mt.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS s
       FROM mt JOIN dfs ON mt.term = dfs.term
       JOIN dl ON dl.doc_id = mt.doc_id, cstats),
g AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_fuzzy_topterms(spark, sf_dir):
    """TopTermsScoringBooleanQueryRewrite(2) for FuzzyQuery hase~2
    (FuzzyTermsEnum similarity boost 1 - ed/min(|term|,|target|)): the
    two best candidates (hash: boost .75, fast: boost .5) become boosted
    SHOULD TermQueries."""
    from .query import Fuzzy

    eng = _engine(spark, sf_dir)
    s = eng["searcher"]
    q = s.rewrite_multiterm(Fuzzy("hase", 2), "top_terms", size=2)
    return _to_orig(eng, s.search(q, 10, with_fields=False))


SQL_ENGINE_FUZZY_TOPTERMS = f"""
WITH {_TOK},
cands AS (
  SELECT term, count(DISTINCT doc_id) AS df,
         1.0 - levenshtein(term, 'hase')
             / CAST(least(length(term), 4) AS DOUBLE) AS boost
  FROM tok WHERE levenshtein(term, 'hase') <= 2
  GROUP BY term ORDER BY boost DESC, term LIMIT 2
),
mt AS (SELECT t.doc_id, t.term, count(*) AS tf
       FROM tok t JOIN cands c ON t.term = c.term
       GROUP BY t.doc_id, t.term),
sc AS (SELECT mt.doc_id,
              c.boost * ln(1 + (cstats.n - c.df + 0.5) / (c.df + 0.5)) * mt.tf
              / (mt.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS s
       FROM mt JOIN cands c ON mt.term = c.term
       JOIN dl ON dl.doc_id = mt.doc_id, cstats),
g AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_engine_blended_prefix(spark, sf_dir):
    """TopTermsBlendedFreqScoringRewrite(4) for prefix s*
    (BlendedTermQuery df blending): the 4 highest-df candidates keep
    their own tfs but ALL score with df := max df of the kept set."""
    from .query import Prefix

    eng = _engine(spark, sf_dir)
    s = eng["searcher"]
    q = s.rewrite_multiterm(Prefix("s"), "top_terms_blended", size=4)
    return _to_orig(eng, s.search(q, 10, with_fields=False))


SQL_ENGINE_BLENDED_PREFIX = f"""
WITH {_TOK},
mt0 AS (SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term LIKE 's%' GROUP BY doc_id, term),
cands AS (SELECT term, count(*) AS df FROM mt0 GROUP BY term
          ORDER BY df DESC, term LIMIT 4),
dfm AS (SELECT max(df) AS df FROM cands),
sc AS (SELECT mt0.doc_id,
              ln(1 + (cstats.n - dfm.df + 0.5) / (dfm.df + 0.5)) * mt0.tf
              / (mt0.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS s
       FROM mt0 JOIN cands c ON mt0.term = c.term
       JOIN dl ON dl.doc_id = mt0.doc_id, cstats, dfm),
g AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_ENGINE.update(
    {
        "engine_prefix_scoring_sql": (
            q_engine_prefix_scoring,
            SQL_ENGINE_PREFIX_SCORING,
        ),
        "engine_fuzzy_topterms_sql": (
            q_engine_fuzzy_topterms,
            SQL_ENGINE_FUZZY_TOPTERMS,
        ),
        "engine_blended_prefix_sql": (
            q_engine_blended_prefix,
            SQL_ENGINE_BLENDED_PREFIX,
        ),
    }
)


def q_engine_phrase_wildcard(spark, sf_dir):
    """PhraseWildcardQuery "fast s*" through the real engine: the prefix
    slot expands against the terms dict, then the MultiPhrase position
    matcher scores with summed constituent idfs (see
    Searcher.phrase_wildcard; semantics == MultiPhraseQuery)."""
    from .query import Prefix

    eng = _engine(spark, sf_dir)
    return _to_orig(
        eng, eng["searcher"].phrase_wildcard(["fast", Prefix("s")], 10)
    )


SQL_ENGINE_PHRASE_WILDCARD = """
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
p1 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term = 'fast'),
p2 AS (SELECT DISTINCT doc_id, pos FROM tokp WHERE term LIKE 's%'),
idf1 AS (
  SELECT ln(1 + (cstats.n - d.df + 0.5) / (d.df + 0.5)) AS v
  FROM (SELECT count(DISTINCT doc_id) AS df FROM tokp
        WHERE term = 'fast') d, cstats),
idf2 AS (
  SELECT sum(ln(1 + (cstats.n - d.df + 0.5) / (d.df + 0.5))) AS v
  FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
        WHERE term LIKE 's%' GROUP BY term) d, cstats),
ptf AS (SELECT p1.doc_id, count(*) AS tf
        FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        GROUP BY p1.doc_id),
scored AS (
  SELECT ptf.doc_id,
         (idf1.v + idf2.v) * ptf.tf
           / (ptf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
  FROM ptf, dl, cstats, idf1, idf2 WHERE dl.doc_id = ptf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10) t
"""

REGISTRY_ENGINE.update(
    {
        "engine_phrase_wildcard_sql": (
            q_engine_phrase_wildcard,
            SQL_ENGINE_PHRASE_WILDCARD,
        ),
    }
)


def q_engine_sorted_range_count(spark, sf_dir):
    """Range count resolved from the SORTED index's contiguous doc-id run
    (IndexSortSortedNumericDocValuesRangeQuery analog): count of docs
    with n_chars in [200, 300] on the n_chars-desc index — two boundary
    ids, no postings touched."""
    from .operators.sorted_index import sorted_range_count

    eng = _engine_sorted(spark, sf_dir)
    n = sorted_range_count(eng["index"], "n_chars", 200, 300)
    return spark.createDataFrame([(n,)], "n_in_range long")


SQL_ENGINE_SORTED_RANGE = """
SELECT count(*) AS n_in_range
FROM documents WHERE n_chars BETWEEN 200 AND 300
"""

REGISTRY_ENGINE.update(
    {
        "engine_sorted_range_count_sql": (
            q_engine_sorted_range_count,
            SQL_ENGINE_SORTED_RANGE,
        ),
    }
)
