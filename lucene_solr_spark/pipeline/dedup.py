"""Deduplication family for web-scale corpora.

All hashes are md5-based so the Spark plan and the DuckDB oracle share the
exact same hash function (both expose md5 as lowercase hex).

Scale notes (10^12 docs):
  * exact dedup: one shuffle on the content hash — use the hash, never the
    raw text, as the shuffle key (bounded key size, uniform distribution).
  * MinHash/LSH: signature computation is a narrow map; banding turns the
    O(n^2) pair problem into groupBy(band_key) — candidate pairs only form
    inside buckets. Band count/width trade recall vs shuffle volume.
  * SimHash: one 64-bit (here 16-bit for SQL parity) fingerprint per doc;
    near-dups = equal fingerprints or small Hamming distance within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate statistics via content-hash groupBy."""
    h = df.select(F.md5(F.col(text_col)).alias("fp"))
    g = h.groupBy("fp").agg(F.count("*").alias("n"))
    return g.agg(
        F.count("*").alias("unique_docs"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("dup_docs"),
        F.max("n").alias("max_group"),
    )


def exact_dedup(df: DataFrame, text_col: str, keep_by: str) -> DataFrame:
    """Keep one row per exact content hash (first by keep_by)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.asc(keep_by))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature(tok: DataFrame, num_hashes: int = 4) -> DataFrame:
    """MinHash over a doc's distinct term set: h_i(doc) = min over terms of
    md5(term || '#i'). tok: (doc_id, term) -> (doc_id, mh_0..mh_{n-1})."""
    d = tok.select("doc_id", "term").distinct()
    aggs = [
        F.min(F.md5(F.concat(F.col("term"), F.lit(f"#{i}")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return d.groupBy("doc_id").agg(*aggs)


def minhash_lsh_buckets(tok: DataFrame, num_hashes: int = 4) -> DataFrame:
    """LSH banding with one band of `num_hashes` rows: the band key is the
    concatenated signature; docs sharing a bucket are near-dup candidates.
    Returns (band_key, n_docs) for buckets with >= 2 docs."""
    sig = minhash_signature(tok, num_hashes)
    band = F.md5(F.concat(*[F.col(f"mh_{i}") for i in range(num_hashes)]))
    return (
        sig.groupBy(band.alias("band_key"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("band_key"))
    )


def simhash16(tok: DataFrame) -> DataFrame:
    """16-bit SimHash per doc: bit b set iff sum over (term, tf) of
    (+tf if bit b of md5(term) else -tf) > 0. (64-bit at scale; 16 bits here
    keep the DuckDB oracle expressible.) tok: (doc_id, term)."""
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # bit b of md5: use hex nibble b (16 nibbles = 16 bits via & 1)
    cols = []
    for b in range(16):
        nib = F.conv(F.substring(F.md5(F.col("term")), b + 1, 1), 16, 10).cast("int")
        contrib = F.when(nib % 2 == 1, F.col("tf")).otherwise(-F.col("tf"))
        cols.append(F.sum(contrib).alias(f"_b{b}"))
    agg = tf.groupBy("doc_id").agg(*cols)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def ngram_jaccard_vs_doc(
    tok: DataFrame, ref_doc: int, n: int = 3, k: int = 10
) -> DataFrame:
    """n-gram (shingle) Jaccard similarity of every doc vs a reference doc.
    tok: (doc_id, term, pos). Shingles built by positional self-joins —
    the same trick as the phrase scorer."""
    t = tok
    sh = t.alias("a")
    for i in range(1, n):
        sh = sh.join(
            t.alias(f"t{i}"),
            (F.col("a.doc_id") == F.col(f"t{i}.doc_id"))
            & (F.col(f"t{i}.pos") == F.col("a.pos") + i),
        )
    gram = F.concat_ws(
        " ", F.col("a.term"), *[F.col(f"t{i}.term") for i in range(1, n)]
    )
    shingles = sh.select(
        F.col("a.doc_id").alias("doc_id"), gram.alias("gram")
    ).distinct()
    ref = shingles.filter(F.col("doc_id") == ref_doc).select("gram")
    ref_n = ref.count()
    inter = (
        shingles.join(F.broadcast(ref), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("inter"))
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    j = inter.join(sizes, "doc_id").filter(F.col("doc_id") != ref_doc)
    jac = F.col("inter") / (F.col("sz") + F.lit(ref_n) - F.col("inter"))
    return (
        j.select("doc_id", F.round(jac, 4).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("doc_id"))
        .limit(k)
    )
