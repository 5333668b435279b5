"""Driver-facing entries: training-data pipeline operators (task brief) —
deduplication, similarity search, text analysis, multimodal plumbing —
plus engine-native (english-profile, Porter-stemmed) queries that have no
SQL twin (rows-only checks; covered by oracle.py differential tests instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .pipeline import dedup as D
from .pipeline import similarity as SIM
from .pipeline import textqc as TQ


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tok_pos(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


# --------------------------------------------------------------------------
# deduplication
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup_stats(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
WITH g AS (SELECT md5(text) AS fp, count(*) AS n FROM documents GROUP BY 1)
SELECT count(*) AS unique_docs,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
       max(n) AS max_group
FROM g
"""


def q_minhash_signature(spark, sf_dir):
    sig = D.minhash_signature(_tok_pos(spark, sf_dir), num_hashes=4)
    return sig.filter(F.col("doc_id") < 10).orderBy("doc_id")


SQL_MINHASH_SIGNATURE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
SELECT doc_id,
       min(md5(term || '#0')) AS mh_0, min(md5(term || '#1')) AS mh_1,
       min(md5(term || '#2')) AS mh_2, min(md5(term || '#3')) AS mh_3
FROM tok WHERE doc_id < 10 GROUP BY doc_id ORDER BY doc_id
"""


def q_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_buckets(_tok_pos(spark, sf_dir), num_hashes=4)


SQL_MINHASH_LSH = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
sig AS (
  SELECT doc_id,
         min(md5(term || '#0')) AS mh_0, min(md5(term || '#1')) AS mh_1,
         min(md5(term || '#2')) AS mh_2, min(md5(term || '#3')) AS mh_3
  FROM tok GROUP BY doc_id)
SELECT md5(mh_0 || mh_1 || mh_2 || mh_3) AS band_key, count(*) AS n_docs
FROM sig GROUP BY 1 HAVING count(*) >= 2 ORDER BY n_docs DESC, band_key
"""


def q_simhash(spark, sf_dir):
    return D.simhash16(_tok_pos(spark, sf_dir)).filter(
        F.col("doc_id") < 10
    ).orderBy("doc_id")


def _sql_simhash() -> str:
    bit_sums = ",\n".join(
        "sum(CASE WHEN ('0x' || substr(md5(term), {p}, 1))::BIGINT % 2 = 1 "
        "THEN tf ELSE -tf END) AS b{b}".format(p=b + 1, b=b)
        for b in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
sums AS (SELECT doc_id, {bit_sums} FROM tf GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
FROM sums WHERE doc_id < 10 ORDER BY doc_id
"""


SQL_SIMHASH = _sql_simhash()


def q_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_vs_doc(_docs(spark, sf_dir), ref_doc=0, n=3, k=10)


SQL_NGRAM_JACCARD = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term,
         generate_subscripts(string_split(text,' '), 1) AS pos
  FROM documents),
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS gram
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
ref AS (SELECT gram FROM sh WHERE doc_id = 0),
refn AS (SELECT count(*) AS rn FROM ref),
inter AS (SELECT doc_id, count(*) AS inter FROM sh
          WHERE gram IN (SELECT gram FROM ref) GROUP BY doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
j AS (SELECT s.doc_id, inter.inter / CAST(s.sz + refn.rn - inter.inter AS DOUBLE) AS jac
      FROM inter JOIN sizes s USING (doc_id), refn WHERE s.doc_id != 0)
SELECT doc_id, ROUND(jac, 4) AS jaccard FROM (
  SELECT * FROM j ORDER BY jac DESC, doc_id LIMIT 10) t
"""


# ---- full LSH dedup: banding -> pairs -> verify -> clusters ---------------

_LSH_BANDS, _LSH_ROWS, _LSH_THRESH = 8, 2, 0.8


def q_lsh_pairs(spark, sf_dir):
    """Banded MinHash-LSH candidate pairs, exact-Jaccard verified: the part
    of LSH dedup that actually identifies duplicates (b=8 bands × r=2 rows
    over 3-gram shingles; bucket-join, never all-pairs)."""
    docs = _docs(spark, sf_dir)
    sh = D.shingle_grams(docs, 3)
    sig = D.minhash_over(sh, _LSH_BANDS * _LSH_ROWS)
    pairs = D.lsh_candidate_pairs(sig, _LSH_BANDS, _LSH_ROWS)
    return D.verify_jaccard(sh, pairs, _LSH_THRESH).orderBy("a", "b")


_SQL_SHINGLE_CTES = """
tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term,
               generate_subscripts(string_split(text,' '), 1) AS pos
        FROM documents),
sh AS (SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS gram
       FROM tok a
       JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2)"""


def _sql_lsh_pairs_ctes() -> str:
    nh = _LSH_BANDS * _LSH_ROWS
    mhs = ", ".join(
        f"min(md5(gram || '#{i}')) AS mh_{i}" for i in range(nh)
    )
    bands = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5(mh_{b * _LSH_ROWS} || '|' || "
        f"mh_{b * _LSH_ROWS + 1}) AS band_key FROM sig"
        for b in range(_LSH_BANDS)
    )
    return f"""{_SQL_SHINGLE_CTES},
sig AS (SELECT doc_id, {mhs} FROM sh GROUP BY doc_id),
bands AS (
{bands}),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.band_key = y.band_key
          AND x.doc_id < y.doc_id),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT c.a, c.b, count(*) AS i
          FROM cand c
          JOIN sh p ON p.doc_id = c.a
          JOIN sh q ON q.doc_id = c.b AND q.gram = p.gram
          GROUP BY c.a, c.b),
verified AS (
  SELECT i.a, i.b,
         i.i / CAST(sa.sz + sb.sz - i.i AS DOUBLE) AS jac
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.a
  JOIN sz sb ON sb.doc_id = i.b
  WHERE i.i / CAST(sa.sz + sb.sz - i.i AS DOUBLE) >= {_LSH_THRESH})"""


SQL_LSH_PAIRS = f"""
WITH {_sql_lsh_pairs_ctes()}
SELECT a, b, ROUND(jac, 4) AS jaccard FROM verified ORDER BY a, b
"""


def q_lsh_clusters(spark, sf_dir):
    """Near-dup clusters: verified LSH pairs -> connected components
    (iterative min-label propagation) -> (cluster_id, n_docs). Keep-one
    dedup = keep doc_id == cluster_id."""
    docs = _docs(spark, sf_dir)
    cc = D.lsh_dedup_clusters(
        docs, 3, _LSH_BANDS, _LSH_ROWS, _LSH_THRESH
    )
    return (
        cc.groupBy(F.col("cluster").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("cluster_id")
    )


SQL_LSH_CLUSTERS = f"""
WITH RECURSIVE {_sql_lsh_pairs_ctes()},
edges AS (SELECT a, b FROM verified UNION SELECT b, a FROM verified),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b),
cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, count(*) AS n_docs FROM cc GROUP BY 1 ORDER BY cluster_id
"""


def q_simhash64(spark, sf_dir):
    """64-bit SimHash (production width — the 16-bit entry above is the
    compact SQL demo): tf-weighted md5-nibble bits, bit 63 as the sign."""
    return (
        D.simhash64(_tok_pos(spark, sf_dir))
        .filter(F.col("doc_id") < 10)
        .orderBy("doc_id")
    )


def _sql_simhash64() -> str:
    bit_sums = ",\n".join(
        "sum(CASE WHEN (('0x' || substr(md5(term), {p}, 1))::BIGINT >> {s}) % 2 = 1 "
        "THEN tf ELSE -tf END) AS b{b}".format(p=b // 4 + 1, s=b % 4, b=b)
        for b in range(64)
    )
    bits = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(63)
    )
    sign = "(CASE WHEN b63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
sums AS (SELECT doc_id, {bit_sums} FROM tf GROUP BY doc_id)
SELECT doc_id, CAST({sign} + {bits} AS BIGINT) AS simhash
FROM sums WHERE doc_id < 10 ORDER BY doc_id
"""


SQL_SIMHASH64 = _sql_simhash64()


def q_simhash_hamming(spark, sf_dir):
    """SimHash near-dup candidates: 16-bit-chunk bucket join (pigeonhole-
    complete for Hamming <= 3), exact bit_count verify. The oracle computes
    the same pair set all-pairs — valid only at test scale; the engine's
    bucket join is the 10^12 shape."""
    sim = D.simhash64(_tok_pos(spark, sf_dir))
    return D.simhash_hamming_candidates(sim, max_hamming=3).orderBy("a", "b")


def q_simhash_manku(spark, sf_dir):
    """SimHash near-dup candidates via the Manku WWW'07 multi-table block
    scheme (C(6,3)=20 tables keyed on ~32 bits) — the 10^9+-doc bucketing
    that replaces 16-bit chunks. Pigeonhole-complete for Hamming <= 3, so
    the pair set equals the all-pairs oracle exactly."""
    sim = D.simhash64(_tok_pos(spark, sf_dir))
    return D.simhash_manku_candidates(sim, max_hamming=3).orderBy("a", "b")


def _sql_simhash_hamming() -> str:
    bit_sums = ",\n".join(
        "sum(CASE WHEN (('0x' || substr(md5(term), {p}, 1))::BIGINT >> {s}) % 2 = 1 "
        "THEN tf ELSE -tf END) AS b{b}".format(p=b // 4 + 1, s=b % 4, b=b)
        for b in range(64)
    )
    bits = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(63)
    )
    sign = "(CASE WHEN b63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
sums AS (SELECT doc_id, {bit_sums} FROM tf GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({sign} + {bits} AS BIGINT) AS simhash FROM sums)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM sh x JOIN sh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
ORDER BY a, b
"""


SQL_SIMHASH_HAMMING = _sql_simhash_hamming()


def q_embedding_cosine_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cosine >= 0.45; the fixture's
    near-uniform vectors peak at 0.51). Gate runs the exact all-pairs
    form the oracle states; the production path is the LSH-bucketed
    variant (recall-tested in tests/test_pipeline_scale.py)."""
    return SIM.embedding_cosine_near_dups(
        _emb(spark, sf_dir), threshold=0.45, exact=True
    )


SQL_EMBEDDING_COSINE_DUPS = """
WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i FROM embeddings),
dots AS (SELECT a.vec_id AS a, b.vec_id AS b,
                sum(a.x * b.x) AS dot, sum(a.x * a.x) AS a2, sum(b.x * b.x) AS b2
         FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
         GROUP BY 1, 2)
SELECT a, b, ROUND(dot / (sqrt(a2) * sqrt(b2)), 4) AS cosine
FROM dots WHERE ROUND(dot / (sqrt(a2) * sqrt(b2)), 4) >= 0.45
ORDER BY a, b
"""


def q_winnowing(spark, sf_dir):
    """Winnowing (MOSS) fingerprint sharing vs doc 0: k=3-gram hashes,
    w=4 window minima."""
    return D.winnowing_shared_with(_docs(spark, sf_dir), ref_doc=0, k=3, w=4)


SQL_WINNOWING = """
WITH g AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         ('0x' || substr(md5(
            array_to_string(list_slice(string_split(text, ' '),
                            generate_subscripts(string_split(text,' '),1),
                            generate_subscripts(string_split(text,' '),1) + 2), ' ')
          ), 1, 15))::BIGINT AS h,
         len(string_split(text, ' ')) AS n
  FROM documents),
valid AS (SELECT * FROM g WHERE pos <= n - 3),
mins AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, pos, n,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
    FROM valid) t
  WHERE pos <= n - 3 - 3),
ref AS (SELECT fp FROM mins WHERE doc_id = 0)
SELECT doc_id, count(*) AS shared
FROM mins WHERE doc_id != 0 AND fp IN (SELECT fp FROM ref)
GROUP BY doc_id ORDER BY shared DESC, doc_id
"""


def q_fingerprint(spark, sf_dir):
    fp = TQ.fingerprint(_docs(spark, sf_dir))
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fingerprint").alias("n_fingerprints"),
    )


SQL_FINGERPRINT = """
SELECT count(*) AS n_docs,
       count(DISTINCT md5(array_to_string(
         list_sort(list_distinct(string_split(text,' '))), ' '))) AS n_fingerprints
FROM documents
"""


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def _query_vec(spark, sf_dir, vec_id=0):
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).first()
    return [float(x) for x in row["embedding"]], int(row["label"])


def q_ann_cosine(spark, sf_dir):
    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    return SIM.cosine_topk(e, qv, k=10)


SQL_ANN_COSINE = """
WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0),
dots AS (SELECT v.vec_id, sum(v.x * q.x) AS dot,
                sum(v.x * v.x) AS n2, sum(q.x * q.x) AS q2
         FROM v JOIN q USING (i) GROUP BY v.vec_id)
SELECT vec_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT vec_id, dot / (sqrt(n2) * sqrt(q2)) AS cosine FROM dots
  ORDER BY cosine DESC, vec_id LIMIT 10) t
"""


_IVF_PLANES, _IVF_SEED, _IVF_DIM = 3, 7, 64


def q_ann_ivf(spark, sf_dir):
    """IVF probe with a deterministic (hyperplane-sign) coarse quantizer:
    engine-computed partitions (not the fixture's label), query probes its
    cell + single-bit-flip neighbors, brute-force cosine within. The oracle
    restates the IDENTICAL pruning in ANSI SQL (plane literals shared), so
    the partition-prune mechanics are checked exactly. Trained-KMeans IVF
    (ivf_train/ivf_probe_topk) is the ann_ivf_kmeans rows-only entry +
    the clustered-data recall test — on THIS fixture's near-uniform vectors
    no centroid quantizer can guarantee exact top-10 without scanning
    nearly everything, which is a property of the data, not the operator."""
    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    return SIM.ivf_hyperplane_topk(
        e, qv, n_planes=_IVF_PLANES, seed=_IVF_SEED, k=10
    )


def _sql_ann_ivf() -> str:
    planes = SIM.hyperplane_planes(_IVF_PLANES, _IVF_DIM, _IVF_SEED)
    vals = ",\n    ".join(
        f"({pl}, {i + 1}, {planes[pl][i]!r})"
        for pl in range(_IVF_PLANES)
        for i in range(_IVF_DIM)
    )
    return f"""
WITH planes(pl, i, p) AS (VALUES
    {vals}),
q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0),
qb AS (SELECT CAST(sum(CASE WHEN dot > 0 THEN 1 << pl ELSE 0 END) AS INT) AS b
       FROM (SELECT pl, sum(q.x * planes.p) AS dot
             FROM q JOIN planes ON q.i = planes.i GROUP BY pl) t),
probes AS (SELECT b FROM qb
           UNION SELECT xor(b, 1) FROM qb
           UNION SELECT xor(b, 2) FROM qb
           UNION SELECT xor(b, 4) FROM qb),
vb AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << pl ELSE 0 END) AS INT) AS b
       FROM (SELECT v.vec_id, pl, sum(v.x * planes.p) AS dot
             FROM v JOIN planes ON v.i = planes.i GROUP BY v.vec_id, pl) t
       GROUP BY vec_id),
cand AS (SELECT vec_id FROM vb WHERE b IN (SELECT b FROM probes)),
dots AS (SELECT v.vec_id, sum(v.x * q.x) AS dot,
                sum(v.x * v.x) AS n2, sum(q.x * q.x) AS q2
         FROM v JOIN q USING (i)
         WHERE v.vec_id IN (SELECT vec_id FROM cand)
         GROUP BY v.vec_id)
SELECT vec_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT vec_id, dot / (sqrt(n2) * sqrt(q2)) AS cosine FROM dots
  ORDER BY cosine DESC, vec_id LIMIT 10) t
"""


SQL_ANN_IVF = _sql_ann_ivf()


def q_ann_ivf_kmeans(spark, sf_dir):
    """Trained-KMeans IVF (ivf_train -> nprobe partition-pruned probe):
    rows-only aggregate (KMeans isn't ANSI-SQL-expressible); exactness on
    clustered data is asserted in tests/test_pipeline_scale.py."""
    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    assigned, centroids = SIM.ivf_train(e, n_centroids=10, seed=42)
    out = SIM.ivf_probe_topk(assigned, centroids, qv, nprobe=3, k=10)
    return out.agg(
        F.count("*").alias("n_results"),
        F.round(F.avg("cosine"), 4).alias("avg_cosine"),
    )


def q_knn_join_lsh(spark, sf_dir):
    """LARGE×LARGE approximate kNN join: hyperplane-LSH bucket both sides +
    single-bit multiprobe (similarity.knn_join_bucketed). Rows-only entry;
    recall vs the exact join is asserted in tests/test_pipeline_scale.py."""
    e = _emb(spark, sf_dir)
    left = e.filter(F.col("vec_id") < 3)
    out = SIM.knn_join_bucketed(left, e, k=3)
    return out.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("qid").alias("n_queries"),
        F.round(F.avg("cosine"), 4).alias("avg_cosine"),
    )


def q_embedding_norms(spark, sf_dir):
    return (
        SIM.embedding_norms(_emb(spark, sf_dir))
        .orderBy(F.desc("l2_norm"), F.asc("vec_id"))
        .limit(10)
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id, ROUND(nrm, 4) AS l2_norm FROM (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM (
    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings) t
  GROUP BY vec_id ORDER BY ROUND(nrm, 4) DESC, vec_id LIMIT 10) s
"""


def q_knn_join(spark, sf_dir):
    e = _emb(spark, sf_dir)
    left = e.filter(F.col("vec_id") < 3)
    return SIM.knn_join(left, e, k=3)


SQL_KNN_JOIN = """
WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 3),
dots AS (SELECT q.vec_id AS qid, v.vec_id AS nid,
                sum(q.x * v.x) AS dot, sum(q.x * q.x) AS q2, sum(v.x * v.x) AS n2
         FROM q JOIN v ON q.i = v.i AND q.vec_id != v.vec_id
         GROUP BY q.vec_id, v.vec_id),
ranked AS (SELECT qid, nid, ROUND(dot / (sqrt(q2) * sqrt(n2)), 4) AS cosine,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY ROUND(dot / (sqrt(q2) * sqrt(n2)), 4) DESC, nid) AS rank
           FROM dots)
SELECT qid, nid, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# text analysis / quality
# --------------------------------------------------------------------------

def q_token_count(spark, sf_dir):
    return TQ.token_count(_docs(spark, sf_dir)).filter(
        F.col("doc_id") < 10
    ).orderBy("doc_id")


SQL_TOKEN_COUNT = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS word_tokens,
       len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS distinct_terms
FROM documents WHERE doc_id < 10 ORDER BY doc_id
"""


_STOPS_SQL = "'" + "', '".join(
    sorted(
        __import__("lucene_solr_spark").ENGLISH_STOP_WORDS
    )
) + "'"


def q_lang_id(spark, sf_dir):
    pred = TQ.lang_id_heuristic(_docs(spark, sf_dir))
    return pred.groupBy("pred_lang").agg(F.count("*").alias("count")).orderBy(
        "pred_lang"
    )


SQL_LANG_ID = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
r AS (SELECT doc_id,
             count(*) FILTER (WHERE term IN ({_STOPS_SQL})) / CAST(count(*) AS DOUBLE)
               AS stop_ratio
      FROM tok GROUP BY doc_id)
SELECT CASE WHEN ROUND(stop_ratio, 4) >= 0.03 THEN 'en' ELSE 'other' END AS pred_lang,
       count(*) AS count
FROM r GROUP BY 1 ORDER BY pred_lang
"""


def q_quality_score(spark, sf_dir):
    return TQ.quality_score(_docs(spark, sf_dir)).filter(
        F.col("doc_id") < 10
    ).orderBy("doc_id")


SQL_QUALITY_SCORE = f"""
WITH base AS (
  SELECT doc_id,
         len(string_split(text,' ')) AS n,
         (length(text) - (len(string_split(text,' ')) - 1))
           / CAST(len(string_split(text,' ')) AS DOUBLE) AS mean_len,
         len(list_filter(string_split(text,' '), t -> t IN ({_STOPS_SQL})))
           / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_r
  FROM documents WHERE doc_id < 10)
SELECT doc_id, n AS n_tokens, ROUND(mean_len, 4) AS mean_token_len,
       ROUND(stop_r, 4) AS stop_ratio,
       ROUND(CASE WHEN n < 8 THEN 0.0 WHEN mean_len < 2.0 THEN 0.2
             ELSE least(1.0, n / 256.0) * 0.6 + least(1.0, stop_r * 10) * 0.4
             END, 4) AS quality
FROM base ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# multimodal + engine-native (rows-only: no SQL twin)
# --------------------------------------------------------------------------

def q_multimodal_features(spark, sf_dir):
    """Binary media column -> mapInPandas feature extraction (decode stubbed
    deterministically; plumbing real). Rows-only check."""
    from .pipeline.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 64)
    feats = extract_features(media, dim=8)
    return feats.agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("checksum").alias("n_distinct"),
        F.round(F.avg(F.element_at("feature", 1)), 4).alias("avg_f0"),
    )


def q_multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling plan (1->N fan-out). Rows-only check."""
    from .pipeline.multimodal import frame_sample_plan, synthetic_media

    media = synthetic_media(spark, 64)
    plan = frame_sample_plan(media, every_ms=1000)
    return plan.agg(
        F.count("*").alias("n_frames"),
        F.count_distinct("media_id").alias("n_videos"),
        F.max("ts_ms").alias("max_ts"),
    )


_ENGINE_IDX: dict = {}
_ENGINE_TABLES: dict = {}  # sf_dir -> read_index() dict (for check_index)


def _engine_searcher(spark, sf_dir):
    """Build (once per sf_dir) a real english-profile index over documents
    treated as pages (url := doc_id as string)."""
    if sf_dir in _ENGINE_IDX:
        return _ENGINE_IDX[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .indexer import build_index, read_index
    from .search import Searcher

    d = _docs(spark, sf_dir).select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
    )
    out = tempfile.mkdtemp(prefix="lss_entry_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    build_index(spark, d, out, profile="en", num_buckets=8)
    idx = read_index(spark, out)
    s = Searcher(idx)
    _ENGINE_IDX[sf_dir] = s
    _ENGINE_TABLES[sf_dir] = idx
    return s


def q_engine_bm25_english(spark, sf_dir):
    """The actual engine (english analysis chain + SmallFloat-quantized norms
    + Lucene-8.x BM25) on documents. Porter stemming is not ANSI-SQL-
    expressible -> rows-only here; rank-identity is proven against oracle.py
    in tests/test_index_search.py."""
    s = _engine_searcher(spark, sf_dir)
    return s.search("customers joining streams", k=10, with_fields=False).select(
        "doc_id", F.round("score", 4).alias("score")
    )


def q_engine_phrase_english(spark, sf_dir):
    s = _engine_searcher(spark, sf_dir)
    return s.search('"hash join"', k=10, with_fields=False).select(
        "doc_id", F.round("score", 4).alias("score")
    )


def q_pii_redact(spark, sf_dir):
    """PII scrubbing over documents: deterministic synthetic PII is
    spliced into every 7th doc (both sides identically), then the
    email/phone/IPv4 redaction pass runs; full redacted text is part of
    the value hash."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact bob@example.com or +1 (555) 123-4567 at 10.0.0.1"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = TQ.pii_redact(d)
    return out.orderBy("doc_id").limit(50)


SQL_PII_REDACT = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact bob@example.com or +1 (555) 123-4567 at 10.0.0.1'
              ELSE text END AS text
  FROM documents),
r1 AS (
  SELECT doc_id, text,
         CAST(len(regexp_split_to_array(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS INT)
           AS n_emails,
         regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           AS t1
  FROM d),
r2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_split_to_array(t1,
            '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) - 1 AS INT) AS n_ips,
         regexp_replace(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')
           AS t2
  FROM r1),
r3 AS (
  SELECT doc_id, n_emails, n_ips,
         CAST(len(regexp_split_to_array(t2,
            '\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}')) - 1 AS INT)
           AS n_phones,
         regexp_replace(t2,
            '\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}',
            '<PHONE>', 'g') AS text
  FROM r2)
SELECT doc_id, text, n_emails, n_phones, n_ips
FROM r3 ORDER BY doc_id LIMIT 50
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher repetition filters: duplicate-token fraction + most-frequent
    bigram coverage, per doc."""
    return TQ.repetition_stats(_docs(spark, sf_dir)).orderBy("doc_id").limit(40)


SQL_REPETITION_STATS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
dup AS (
  SELECT doc_id,
         1.0 - CAST(count(DISTINCT term) AS DOUBLE) / count(*) AS dup_frac,
         count(*) AS n
  FROM tok GROUP BY doc_id),
bg AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS gram, count(*) AS c
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS topc FROM bg GROUP BY doc_id)
SELECT d.doc_id,
       ROUND(d.dup_frac, 4) AS dup_token_frac,
       ROUND(CASE WHEN d.n >= 2
                  THEN LEAST(1.0, CAST(coalesce(t.topc, 0) * 2 AS DOUBLE) / d.n)
                  ELSE 0.0 END, 4) AS top_bigram_frac
FROM dup d LEFT JOIN top t ON t.doc_id = d.doc_id
ORDER BY d.doc_id LIMIT 40
"""


REGISTRY_PIPELINE: dict[str, tuple] = {
    "dedup_exact_stats": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_signature": (q_minhash_signature, SQL_MINHASH_SIGNATURE),
    "dedup_minhash_lsh_buckets": (q_minhash_lsh, SQL_MINHASH_LSH),
    "dedup_simhash": (q_simhash, SQL_SIMHASH),
    "dedup_simhash64": (q_simhash64, SQL_SIMHASH64),
    "dedup_simhash_hamming": (q_simhash_hamming, SQL_SIMHASH_HAMMING),
    "dedup_simhash_manku": (q_simhash_manku, SQL_SIMHASH_HAMMING),
    "dedup_lsh_pairs": (q_lsh_pairs, SQL_LSH_PAIRS),
    "dedup_lsh_clusters": (q_lsh_clusters, SQL_LSH_CLUSTERS),
    "dedup_ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "dedup_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "dedup_winnowing": (q_winnowing, SQL_WINNOWING),
    "dedup_embedding_cosine": (q_embedding_cosine_dups, SQL_EMBEDDING_COSINE_DUPS),
    "ann_cosine_topk": (q_ann_cosine, SQL_ANN_COSINE),
    "ann_ivf_topk": (q_ann_ivf, SQL_ANN_IVF),
    "ann_ivf_kmeans": (q_ann_ivf_kmeans, None),
    "embedding_norms": (q_embedding_norms, SQL_EMBEDDING_NORMS),
    "knn_join": (q_knn_join, SQL_KNN_JOIN),
    "knn_join_lsh": (q_knn_join_lsh, None),
    "text_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_lang_id": (q_lang_id, SQL_LANG_ID),
    "text_quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "text_pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "text_repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "multimodal_features": (q_multimodal_features, None),
    "multimodal_frame_plan": (q_multimodal_frame_plan, None),
    "engine_bm25_english": (q_engine_bm25_english, None),
    "engine_phrase_english": (q_engine_phrase_english, None),
}


# ---------------------------------------------------------------------------
# web-corpus prep: URL canonicalization / dedup / host stats (webprep.py)
# ---------------------------------------------------------------------------
# The testdata documents table has no url column, so both sides derive a
# deterministic synthetic url per row (scheme/host-case/port/params/fragment
# variants keyed off doc_id) and the ORACLE replicates the derivation —
# the operator under test is the canonicalizer, not the synthesis.

def _with_urls(docs):
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, "HTTP").otherwise("https")
    host = F.when(
        d % 3 == 0, F.concat(F.lit("WWW."), F.upper("source"), F.lit(".Example.COM"))
    ).otherwise(F.concat(F.col("source"), F.lit(".example.com")))
    port = (
        F.when(d % 4 == 0, ":80")
        .when(d % 4 == 1, ":443")
        .when(d % 4 == 2, ":8080")
        .otherwise("")
    )
    path = F.concat(
        F.lit("/Docs/"), (d % 50).cast("string"),
        F.when(d % 5 == 0, "/").otherwise(""),
    )
    query = (
        F.when(d % 3 == 0, "?utm_source=feed&z=1&a=2&fbclid=xyz")
        .when(d % 3 == 1, "?b=2&a=1")
        .otherwise("")
    )
    frag = F.when(d % 2 == 0, "#Section-2").otherwise(F.lit(""))
    return docs.withColumn(
        "url", F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    )


_SQL_URLS = """
urls AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
         (CASE WHEN doc_id % 3 = 0
               THEN 'WWW.' || upper(source) || '.Example.COM'
               ELSE source || '.example.com' END) ||
         (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                          WHEN 2 THEN ':8080' ELSE '' END) ||
         '/Docs/' || CAST(doc_id % 50 AS VARCHAR) ||
         (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         (CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&z=1&a=2&fbclid=xyz'
                          WHEN 1 THEN '?b=2&a=1' ELSE '' END) ||
         (CASE WHEN doc_id % 2 = 0 THEN '#Section-2' ELSE '' END) AS url
  FROM documents)
"""

# the canonicalizer, restated in DuckDB SQL (same 7 rules as webprep.py)
_SQL_CANON = """
canon AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(
      lower(regexp_replace(
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        ':[0-9]+$', '')),
      '^www\\.', '') AS host,
    regexp_extract(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      ':([0-9]+)$', 1) AS port,
    regexp_replace(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/+$', '') AS path1,
    regexp_extract(regexp_replace(url, '#.*$', ''), '\\?([^#]*)', 1) AS query
  FROM urls),
cu AS (
  SELECT doc_id, url,
    scheme || '://' || host ||
    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
               OR (scheme = 'https' AND port = '443')
          THEN '' ELSE ':' || port END) ||
    (CASE WHEN path1 = '' THEN '/' ELSE path1 END) ||
    (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
          ELSE '' END) AS canonical_url,
    host
  FROM (SELECT *,
          list_sort(list_filter(string_split(query, '&'),
            p -> len(p) > 0 AND NOT regexp_matches(p,
              '^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid|ref_src)=')))
          AS kept
        FROM canon))
"""


def q_url_canonical(spark, sf_dir):
    from .pipeline.webprep import canonicalize_url

    d = _with_urls(_docs(spark, sf_dir))
    return (
        canonicalize_url(d)
        .filter(F.col("doc_id") < 24)
        .select("doc_id", "canonical_url")
        .orderBy("doc_id")
    )


SQL_URL_CANONICAL = f"""
WITH {_SQL_URLS}, {_SQL_CANON}
SELECT doc_id, canonical_url FROM cu WHERE doc_id < 24 ORDER BY doc_id
"""


def q_url_dedup_hosts(spark, sf_dir):
    from .pipeline.webprep import host_stats

    return host_stats(_with_urls(_docs(spark, sf_dir))).limit(20)


SQL_URL_DEDUP_HOSTS = f"""
WITH {_SQL_URLS}, {_SQL_CANON}
SELECT host, count(*) AS pages,
       count(DISTINCT canonical_url) AS distinct_urls,
       count(*) - count(DISTINCT canonical_url) AS dup_pages
FROM cu GROUP BY host ORDER BY pages DESC, host LIMIT 20
"""


# ---------------------------------------------------------------------------
# decontamination + repeated-span detection (decontam.py)
# ---------------------------------------------------------------------------

def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 97 == 0 act as the
    held-out eval set; report the most-contaminated remaining docs."""
    from .pipeline.decontam import contamination_report

    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    # n=4 at this corpus' vocabulary plays the role 13-grams play on real
    # web text: rare enough to mean true overlap, common enough that the
    # entry's evidence is non-vacuous (8 contaminated docs at sf0.01)
    rep = contamination_report(corpus, bench, n=4)
    return rep.orderBy(
        F.desc("contamination_frac"), F.asc("doc_id")
    ).limit(15)


_SQL_GRAMS4 = """
tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term,
         generate_subscripts(string_split(text,' '), 1) AS pos
  FROM documents),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term AS gram
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN tok d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3)
"""

SQL_DECONTAMINATE = f"""
WITH {_SQL_GRAMS4},
bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 97 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 97 != 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id),
hit AS (SELECT doc_id, count(*) AS contaminated_grams FROM corp
        WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id)
SELECT t.doc_id, t.n_grams, h.contaminated_grams,
       ROUND(CAST(h.contaminated_grams AS DOUBLE) / t.n_grams, 4)
         AS contamination_frac
FROM tot t JOIN hit h ON h.doc_id = t.doc_id
ORDER BY contamination_frac DESC, t.doc_id LIMIT 15
"""


def q_repeated_spans(spark, sf_dir):
    """Lee-et-al-style repeated-substring summary at k=8 tokens."""
    from .pipeline.decontam import duplicate_window_stats

    return duplicate_window_stats(_docs(spark, sf_dir), k=8)


_SQL_GRAMS8 = """
tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term,
         generate_subscripts(string_split(text,' '), 1) AS pos
  FROM documents),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term || ' ' ||
         e.term || ' ' || f.term || ' ' || g.term || ' ' || h.term AS gram
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN tok d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
  JOIN tok e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
  JOIN tok f ON f.doc_id = a.doc_id AND f.pos = a.pos + 5
  JOIN tok g ON g.doc_id = a.doc_id AND g.pos = a.pos + 6
  JOIN tok h ON h.doc_id = a.doc_id AND h.pos = a.pos + 7)
"""

SQL_REPEATED_SPANS = f"""
WITH {_SQL_GRAMS8},
dfs AS (SELECT gram, count(*) AS df FROM sh GROUP BY gram)
SELECT CAST(sum(df) AS BIGINT) AS doc_windows,
       count(*) AS distinct_windows,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_windows,
       max(df) AS max_df,
       (SELECT count(DISTINCT doc_id) FROM sh
        WHERE gram IN (SELECT gram FROM dfs WHERE df >= 2))
         AS docs_with_dup_span
FROM dfs
"""


def q_dup_span_frac(spark, sf_dir):
    """Per-doc duplicated-window fraction (the substring-dedup filter
    signal): 20 most-duplicated docs."""
    from .pipeline.decontam import duplicate_window_fraction

    out = duplicate_window_fraction(_docs(spark, sf_dir), k=8)
    return out.orderBy(
        F.desc("dup_frac"), F.asc("doc_id")
    ).limit(20)


SQL_DUP_SPAN_FRAC = f"""
WITH {_SQL_GRAMS8},
dfs AS (SELECT gram, count(*) AS df FROM sh GROUP BY gram),
per AS (
  SELECT s.doc_id, count(*) AS windows,
         CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_windows
  FROM sh s JOIN dfs d ON d.gram = s.gram GROUP BY s.doc_id)
SELECT doc_id, windows, dup_windows,
       ROUND(CAST(dup_windows AS DOUBLE) / windows, 4) AS dup_frac
FROM per ORDER BY dup_frac DESC, doc_id LIMIT 20
"""


REGISTRY_PIPELINE.update(
    {
        "web_url_canonical": (q_url_canonical, SQL_URL_CANONICAL),
        "web_url_dedup_hosts": (q_url_dedup_hosts, SQL_URL_DEDUP_HOSTS),
        "decontaminate_ngram": (q_decontaminate, SQL_DECONTAMINATE),
        "dedup_repeated_spans": (q_repeated_spans, SQL_REPEATED_SPANS),
        "dedup_dup_span_frac": (q_dup_span_frac, SQL_DUP_SPAN_FRAC),
    }
)


# ---------------------------------------------------------------------------
# product quantization ANN (pipeline/pq.py) + multi-language ID (textqc.py)
# ---------------------------------------------------------------------------

def q_ann_pq_adc(spark, sf_dir):
    """PQ-coded ANN: train m=16 x ksub=16 codebooks on a sample, encode the
    corpus to 8-byte codes, ADC top-10 via literal lookup tables (pure JVM
    scan). KMeans codebooks are not ANSI-SQL-expressible -> rows-only entry;
    recall vs brute-force cosine is asserted in tests/test_pipeline_scale.py."""
    from .pipeline import pq as PQ

    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    return PQ.pq_topk(e, qv, k=10)


_LANG_SAMPLES = {
    1: "der hund und die katze laufen nicht in das haus von dem mann",
    2: "le chat et les chiens sont dans la maison pour que il dort",
    3: "el perro y la casa de los gatos es una cosa que se ve con el sol",
    0: "zzz qqq xyzzy plugh foobar quux grault garply waldo fred corge",
}


def q_lang_id_multi(spark, sf_dir):
    """Multi-language ID over function-word density profiles. The testdata
    corpus is English, so rows are steered into each profile's path with
    fixed literal sentences keyed off doc_id (same derivation restated in
    the oracle — the operator under test is the classifier expression)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
    t = F.col("text")
    for k, s in _LANG_SAMPLES.items():
        t = F.when(F.col("doc_id") % 5 == k, F.lit(s)).otherwise(t)
    return TQ.lang_id_multi(docs.withColumn("text", t)).orderBy("doc_id")


def _profile_sql(words):
    return ", ".join(f"'{w}'" for w in words)


_LANG_CASE_SQL = """
      CASE WHEN doc_id % 5 = 1 THEN '{s1}'
           WHEN doc_id % 5 = 2 THEN '{s2}'
           WHEN doc_id % 5 = 3 THEN '{s3}'
           WHEN doc_id % 5 = 0 THEN '{s0}'
           ELSE text END
""".format(s1=_LANG_SAMPLES[1], s2=_LANG_SAMPLES[2], s3=_LANG_SAMPLES[3],
           s0=_LANG_SAMPLES[0])

SQL_LANG_ID_MULTI = f"""
WITH d AS (
  SELECT doc_id, {_LANG_CASE_SQL} AS text
  FROM documents WHERE doc_id < 60),
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     t -> t <> '') AS t
  FROM d),
c AS (
  SELECT doc_id, len(t) AS n,
    len(list_filter(t, x -> x IN ({_profile_sql(TQ.LANG_PROFILES['en'])}))) AS c_en,
    len(list_filter(t, x -> x IN ({_profile_sql(TQ.LANG_PROFILES['de'])}))) AS c_de,
    len(list_filter(t, x -> x IN ({_profile_sql(TQ.LANG_PROFILES['fr'])}))) AS c_fr,
    len(list_filter(t, x -> x IN ({_profile_sql(TQ.LANG_PROFILES['es'])}))) AS c_es
  FROM tok)
SELECT doc_id,
  CASE WHEN n = 0 OR greatest(c_en, c_de, c_fr, c_es) / CAST(n AS DOUBLE) < 0.02
         THEN 'und'
       WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
       WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
       WHEN c_fr >= c_es THEN 'fr'
       ELSE 'es' END AS pred_lang,
  CASE WHEN n > 0
       THEN ROUND(greatest(c_en, c_de, c_fr, c_es) / CAST(n AS DOUBLE), 4)
       ELSE 0.0 END AS top_density
FROM c ORDER BY doc_id
"""


REGISTRY_PIPELINE.update(
    {
        "ann_pq_adc": (q_ann_pq_adc, None),
        "text_lang_id_multi": (q_lang_id_multi, SQL_LANG_ID_MULTI),
    }
)


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized ANN (closed-form quantizer -> full SQL oracle) and
# C4/Dolma-style line-level exact dedup
# ---------------------------------------------------------------------------

def q_ann_sq8(spark, sf_dir):
    """int8 scalar-quantized cosine top-10: exact per-dim min/max stats,
    floor(+0.5) affine encode, dequantized cosine scan. The whole pipeline
    is closed-form, so the oracle restates stats+encode+scan exactly."""
    from .pipeline import pq as PQ

    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    return PQ.sq8_search(e, qv, k=10)


SQL_ANN_SQ8 = """
WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0),
stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM v GROUP BY i),
codes AS (SELECT v.vec_id, v.i, s.mn, s.mx,
            least(255, greatest(0, CAST(floor(
              CASE WHEN s.mx > s.mn
                   THEN (v.x - s.mn) * 255.0 / (s.mx - s.mn)
                   ELSE 0.0 END + 0.5) AS INT))) AS c
          FROM v JOIN stats s USING (i)),
deq AS (SELECT vec_id, i, mn + c * (mx - mn) / 255.0 AS xh FROM codes),
dots AS (SELECT d.vec_id, sum(d.xh * q.x) AS dot,
                sum(d.xh * d.xh) AS n2, sum(q.x * q.x) AS q2
         FROM deq d JOIN q USING (i) GROUP BY d.vec_id)
SELECT vec_id, ROUND(cosine, 4) AS sq_cosine FROM (
  SELECT vec_id, dot / (sqrt(n2) * sqrt(q2) + 1e-12) AS cosine FROM dots
  ORDER BY cosine DESC, vec_id LIMIT 10) t
"""


_BOILER_A = "Subscribe to our newsletter for weekly updates and offers"
_BOILER_B = "All rights reserved  copyright two thousand twenty four"


def q_dedup_lines(spark, sf_dir):
    """Line/sentence-level exact dedup: boilerplate units repeated across
    documents. The testdata corpus has no sentence separators, so each doc
    is given a deterministic sentence structure keyed off doc_id (two text
    slices + boilerplate sentences on doc_id%3==0 / %4==1 — restated in the
    oracle, as with web_url_canonical's derived urls): the operator under
    test is the unit-dedup aggregation. Top 100 by spread, deterministic
    tie order via unit_md5."""
    from .pipeline import dedup as DD

    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.substring("text", 1, 60),
            F.when(F.col("doc_id") % 3 == 0, ". " + _BOILER_A).otherwise(""),
            F.when(F.col("doc_id") % 4 == 1, ". " + _BOILER_B).otherwise(""),
            F.lit(". "),
            F.substring("text", 61, 60),
        ),
    )
    return DD.line_dedup_stats(d).limit(100)


SQL_DEDUP_LINES = f"""
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 60)
         || (CASE WHEN doc_id % 3 = 0 THEN '. {_BOILER_A}' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 1 THEN '. {_BOILER_B}' ELSE '' END)
         || '. ' || substr(text, 61, 60) AS text
  FROM documents),
units AS (
  SELECT doc_id,
         lower(trim(regexp_replace(u, '\\s+', ' ', 'g'))) AS unit
  FROM (SELECT doc_id, unnest(string_split(text, '.')) AS u FROM d)),
f AS (SELECT * FROM units WHERE length(unit) >= 20),
g AS (SELECT unit, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
      FROM f GROUP BY unit HAVING count(DISTINCT doc_id) > 1)
SELECT md5(unit) AS unit_md5, n_docs, n_occurrences
FROM g
ORDER BY n_docs DESC, n_occurrences DESC, unit_md5
LIMIT 100
"""


REGISTRY_PIPELINE.update(
    {
        "ann_sq8_topk": (q_ann_sq8, SQL_ANN_SQ8),
        "dedup_lines": (q_dedup_lines, SQL_DEDUP_LINES),
    }
)


# ---------------------------------------------------------------------------
# training-data mixing + LM-quality scoring (pipeline/sampling.py)
# ---------------------------------------------------------------------------

_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
_MIX_DEFAULT = 0.1


def q_sample_mix(spark, sf_dir):
    """Deterministic data mixing: per-source keep rates via md5-hash
    Bernoulli on doc_id (rerunnable — same subset every run). Reports kept
    rows per source; the oracle recomputes the identical hash decision."""
    from .pipeline import sampling as SP

    kept = SP.sample_mix(
        _docs(spark, sf_dir), _MIX_RATES, default_rate=_MIX_DEFAULT
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("source")
    )


def _sql_sample_mix() -> str:
    rate = f"{_MIX_DEFAULT}"
    for src, r in sorted(_MIX_RATES.items(), reverse=True):
        rate = f"CASE WHEN source = '{src}' THEN {float(r)} ELSE {rate} END"
    return f"""
WITH u AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS unit
  FROM documents)
SELECT source, count(*) AS n_kept
FROM u WHERE unit < {rate}
GROUP BY source ORDER BY source
"""


SQL_SAMPLE_MIX = _sql_sample_mix()


def q_unigram_logprob(spark, sf_dir):
    """Per-doc mean unigram log-prob under the corpus' own smoothed
    unigram LM (the CCNet-style perplexity-filter stand-in)."""
    from .pipeline import sampling as SP

    out = SP.unigram_logprob(_docs(spark, sf_dir))
    return out.filter(F.col("doc_id") < 20).orderBy("doc_id")


SQL_UNIGRAM_LOGPROB = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n_tok,
               CAST(count(*) AS DOUBLE) AS n_vocab FROM tf),
lm AS (SELECT term, ln((tf + 0.5) / (tot.n_tok + 0.5 * tot.n_vocab)) AS logp
       FROM tf, tot)
SELECT doc_id, ROUND(avg(logp), 4) AS mean_logprob
FROM tok JOIN lm USING (term)
WHERE doc_id < 20 GROUP BY doc_id ORDER BY doc_id
"""


REGISTRY_PIPELINE.update(
    {
        "pipeline_sample_mix": (q_sample_mix, SQL_SAMPLE_MIX),
        "text_unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    }
)


def q_incremental_dedup(spark, sf_dir):
    """Snapshot-incremental MinHash dedup (pipeline/dedup.py
    incremental_band_filter): band the NEW snapshot (doc_id % 7 == 0) and
    semi-join its band keys against the EXISTING corpus's persisted band
    table — never re-pairing the corpus with itself."""
    tok = _tok_pos(spark, sf_dir)
    corpus_sig = D.minhash_signature(
        tok.filter(F.col("doc_id") % 7 != 0), num_hashes=4
    )
    batch_sig = D.minhash_signature(
        tok.filter(F.col("doc_id") % 7 == 0), num_hashes=4
    )
    out = D.incremental_band_filter(
        corpus_sig, batch_sig, bands=2, rows_per_band=2
    )
    return out.orderBy("doc_id")


SQL_INCREMENTAL_DEDUP = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term
  FROM documents),
sig AS (
  SELECT doc_id,
         min(md5(term || '#0')) AS mh_0, min(md5(term || '#1')) AS mh_1,
         min(md5(term || '#2')) AS mh_2, min(md5(term || '#3')) AS mh_3
  FROM tok GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh_0 || '|' || mh_1) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh_2 || '|' || mh_3) AS band_key FROM sig),
corpus AS (
  SELECT DISTINCT band, band_key FROM bands WHERE doc_id % 7 <> 0),
hits AS (
  SELECT b.doc_id, count(*) AS n_hit_bands
  FROM bands b
  WHERE b.doc_id % 7 = 0
    AND EXISTS (SELECT 1 FROM corpus c
                WHERE c.band = b.band AND c.band_key = b.band_key)
  GROUP BY b.doc_id)
SELECT s.doc_id,
       CAST(COALESCE(h.n_hit_bands, 0) AS INT) AS n_hit_bands,
       COALESCE(h.n_hit_bands, 0) > 0 AS is_candidate_dup
FROM sig s LEFT JOIN hits h ON h.doc_id = s.doc_id
WHERE s.doc_id % 7 = 0
ORDER BY s.doc_id
"""


def q_host_cap(spark, sf_dir):
    """Per-host document cap (webprep.py host_cap_sample): keep at most 3
    docs per canonical host, preferring longer documents (n_chars), with
    canonical-url + doc_id tie-breaks for full determinism."""
    from .pipeline.webprep import host_cap_sample

    d = _with_urls(_docs(spark, sf_dir))
    out = host_cap_sample(d, cap=3, order_col="n_chars", tiebreak=["doc_id"])
    return out.select("doc_id", "host").orderBy("host", "doc_id")


SQL_HOST_CAP = f"""
WITH {_SQL_URLS}, {_SQL_CANON},
ranked AS (
  SELECT d.doc_id, cu.host,
         row_number() OVER (
           PARTITION BY cu.host
           ORDER BY d.n_chars DESC, cu.canonical_url ASC, d.doc_id ASC
         ) AS rk
  FROM cu JOIN documents d ON d.doc_id = cu.doc_id)
SELECT doc_id, host FROM ranked WHERE rk <= 3 ORDER BY host, doc_id
"""


def q_check_index(spark, sf_dir):
    """CheckIndex (checkindex.py; lucene CheckIndex.java ≈L400): the
    cross-table integrity audit over the engine index built from
    documents. The oracle states the expected verdicts — every check must
    hold on a fresh build."""
    _engine_searcher(spark, sf_dir)  # ensure the index exists
    from .checkindex import check_index

    return check_index(spark, _ENGINE_TABLES[sf_dir]).select("check", "ok")


SQL_CHECK_INDEX = """
SELECT * FROM (VALUES
  ('bucket_hash', true), ('doc_count', true), ('norms_recompute', true),
  ('packed_df_ttf', true), ('sum_ttf', true), ('term_stats_df_ttf', true),
  ('tf_positions', true)) AS t("check", ok)
ORDER BY "check"
"""


REGISTRY_PIPELINE.update(
    {
        "dedup_incremental": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
        "web_host_cap": (q_host_cap, SQL_HOST_CAP),
        "check_index": (q_check_index, SQL_CHECK_INDEX),
    }
)


# ---------------------------------------------------------------------------
# BPE tokenizer train + encode (pipeline/bpe.py) — the tokenization stage
# of the training-data tier. Iterative merge learning / ordered merge
# replay are not ANSI-SQL-expressible -> rows-only entries; the algorithm
# is pinned by tests/test_bpe.py (paper example, naive-reference
# differential on randomized corpora, lossless round-trip, determinism).
# ---------------------------------------------------------------------------

def q_bpe_train_merges(spark, sf_dir):
    """Sennrich et al. 2016 BPE training: one vocabulary-bounded word-count
    aggregation + driver-side merge loop. Returns the learned merge table
    (deterministic: count desc, lexicographic tie-break)."""
    from .pipeline.bpe import merges_df, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, num_merges=30)
    return merges_df(spark, merges).orderBy("rank")


def q_bpe_encode_pieces(spark, sf_dir):
    """BPE encode as a zero-shuffle Arrow-batched narrow map with
    per-batch word memoization; per-doc word/piece counts for the first
    20 docs (GPT-2-style lowest-rank-first merge replay)."""
    from pyspark.sql import functions as F

    from .pipeline.bpe import encode_bpe, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, num_merges=50)
    return (
        encode_bpe(docs, merges)
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "n_words", "n_pieces")
        .orderBy("doc_id")
    )


REGISTRY_PIPELINE.update(
    {
        "bpe_train_merges": (q_bpe_train_merges, None),
        "text_bpe_pieces": (q_bpe_encode_pieces, None),
    }
)


# ---------------------------------------------------------------------------
# filtered kNN + semantic decontamination (round 3b)
# ---------------------------------------------------------------------------

def q_ann_filtered(spark, sf_dir):
    """KnnFloatVectorQuery with a filter (lucene/core/.../search/
    KnnFloatVectorQuery.java, Lucene 9): top-k nearest AMONG docs passing
    the metadata filter (label = 3). With a selective filter Lucene falls
    back to exact search over the filtered subset — which is exactly this
    plan: pushed-down filter scan -> cosine -> TakeOrderedAndProject."""
    qv, _ = _query_vec(spark, sf_dir, 0)
    e = _emb(spark, sf_dir).filter(
        (F.col("vec_id") != 0) & (F.col("label") == 3)
    )
    return SIM.cosine_topk(e, qv, k=10)


SQL_ANN_FILTERED = """
WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0 AND label = 3),
dots AS (SELECT v.vec_id, sum(v.x * q.x) AS dot,
                sum(v.x * v.x) AS n2, sum(q.x * q.x) AS q2
         FROM v JOIN q USING (i) GROUP BY v.vec_id)
SELECT vec_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT vec_id, dot / (sqrt(n2) * sqrt(q2)) AS cosine FROM dots
  ORDER BY cosine DESC, vec_id LIMIT 10) t
"""


def q_decontaminate_semantic(spark, sf_dir):
    """Embedding-space decontamination: eval set = vec_id % 50 == 0
    (broadcast); per corpus vector the max cosine vs any eval vector;
    top 20 most contaminated."""
    from .pipeline.decontam import semantic_contamination

    e = _emb(spark, sf_dir)
    ev = e.filter(F.col("vec_id") % 50 == 0)
    corpus = e.filter(F.col("vec_id") % 50 != 0)
    r = semantic_contamination(corpus, ev, threshold=0.99)
    return r.orderBy(F.desc("max_cos"), F.asc("vec_id")).limit(20)


SQL_DECONTAMINATE_SEMANTIC = """
WITH ev AS (SELECT vec_id AS eid, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id % 50 = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id % 50 <> 0),
dots AS (SELECT v.vec_id, ev.eid,
                sum(v.x * ev.x) AS dot,
                sum(v.x * v.x) AS n2, sum(ev.x * ev.x) AS e2
         FROM v JOIN ev USING (i) GROUP BY v.vec_id, ev.eid),
mx AS (SELECT vec_id, max(dot / (sqrt(n2) * sqrt(e2))) AS max_cos
       FROM dots GROUP BY vec_id)
SELECT vec_id, ROUND(max_cos, 4) AS max_cos, max_cos >= 0.99 AS contaminated
FROM mx ORDER BY ROUND(max_cos, 4) DESC, vec_id LIMIT 20
"""

REGISTRY_PIPELINE.update(
    {
        "ann_filtered_topk": (q_ann_filtered, SQL_ANN_FILTERED),
        "decontaminate_semantic": (q_decontaminate_semantic, SQL_DECONTAMINATE_SEMANTIC),
    }
)


def q_shard_pack(spark, sf_dir):
    """Token-budget shard packing: greedy serial packing at budget=1000
    tokens via the distributed two-pass prefix sum (no global window)."""
    from .pipeline.sampling import pack_shards

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    return pack_shards(d, "n_tok", 1000.0).select(
        "doc_id", F.col("shard").cast("long").alias("shard")
    )


SQL_SHARD_PACK = """
WITH w AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
c AS (
  SELECT doc_id,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM w)
SELECT doc_id, CAST(floor(cum / 1000.0) AS BIGINT) AS shard FROM c
"""

REGISTRY_PIPELINE.update(
    {"pipeline_shard_pack": (q_shard_pack, SQL_SHARD_PACK)}
)


# ---------------------------------------------------------------------------
# vector field stored IN the index (vectors.py — KnnVectorsFormat parity)
# ---------------------------------------------------------------------------

_VF: dict = {}


def _vf_engine(spark, sf_dir):
    """Once per sf_dir: an index dir with a hyperplane-IVF vector field
    (doc_id := vec_id) and soft deletes on doc_id % 13 == 0."""
    if sf_dir in _VF:
        return _VF[sf_dir]
    import atexit
    import shutil
    import tempfile

    from .docvalues import soft_delete
    from .vectors import add_vector_field

    out = tempfile.mkdtemp(prefix="lss_vf_idx_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    add_vector_field(
        spark,
        out,
        e.select(F.col("vec_id").alias("doc_id"), "embedding"),
        field="vec",
        quantizer="hyperplane",
        n_planes=_IVF_PLANES,
        seed=_IVF_SEED,
        vec_col="embedding",
    )
    soft_delete(
        spark, out,
        e.filter(F.col("vec_id") % 13 == 0).select(
            F.col("vec_id").alias("doc_id")
        ),
    )
    _VF[sf_dir] = out
    return out


def q_engine_knn_field(spark, sf_dir):
    """KnnFloatVectorQuery over a vector field stored IN the index dir:
    partition-pruned IVF probe (own cell + single-bit multiprobe) over
    the partitionBy(cell) parquet layout, soft-deleted docs masked
    (liveDocs), exact cosine within the probed cells."""
    from .vectors import knn_field_search

    out = _vf_engine(spark, sf_dir)
    qv, _ = _query_vec(spark, sf_dir, 0)
    r = knn_field_search(
        spark, out, "vec", qv, k=10, nprobe=_IVF_PLANES + 1, live=True
    )
    return r.withColumnRenamed("doc_id", "vec_id")


def _sql_knn_field() -> str:
    planes = SIM.hyperplane_planes(_IVF_PLANES, _IVF_DIM, _IVF_SEED)
    vals = ",\n    ".join(
        f"({pl}, {i + 1}, {planes[pl][i]!r})"
        for pl in range(_IVF_PLANES)
        for i in range(_IVF_DIM)
    )
    return f"""
WITH planes(pl, i, p) AS (VALUES
    {vals}),
q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id != 0 AND vec_id % 13 <> 0),
qb AS (SELECT CAST(sum(CASE WHEN dot > 0 THEN 1 << pl ELSE 0 END) AS INT) AS b
       FROM (SELECT pl, sum(q.x * planes.p) AS dot
             FROM q JOIN planes ON q.i = planes.i GROUP BY pl) t),
probes AS (SELECT b FROM qb
           UNION SELECT xor(b, 1) FROM qb
           UNION SELECT xor(b, 2) FROM qb
           UNION SELECT xor(b, 4) FROM qb),
vb AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << pl ELSE 0 END) AS INT) AS b
       FROM (SELECT v.vec_id, pl, sum(v.x * planes.p) AS dot
             FROM v JOIN planes ON v.i = planes.i GROUP BY v.vec_id, pl) t
       GROUP BY vec_id),
cand AS (SELECT vec_id FROM vb WHERE b IN (SELECT b FROM probes)),
dots AS (SELECT v.vec_id, sum(v.x * q.x) AS dot,
                sum(v.x * v.x) AS n2, sum(q.x * q.x) AS q2
         FROM v JOIN q USING (i)
         WHERE v.vec_id IN (SELECT vec_id FROM cand)
         GROUP BY v.vec_id)
SELECT vec_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT vec_id, dot / (sqrt(n2) * sqrt(q2)) AS cosine FROM dots
  ORDER BY cosine DESC, vec_id LIMIT 10) t
"""


SQL_ENGINE_KNN_FIELD = _sql_knn_field()

REGISTRY_PIPELINE.update(
    {"engine_knn_field_sql": (q_engine_knn_field, SQL_ENGINE_KNN_FIELD)}
)
