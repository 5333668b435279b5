"""Index build: pages -> docmeta + postings (flat & packed) + term_stats.

This is the Spark restatement of Lucene's write path (SURVEY.md §4.1):

  IndexWriter.addDocument / DWPT inversion  ->  per-partition Arrow UDF
      (analysis chain, DefaultIndexingChain#processField)
  FreqProxTermsWriter flush (sort terms, walk postings)
      ->  groupBy(term, doc) / groupBy(term, block) shuffle aggregation
  Lucene84PostingsWriter 128-doc delta+PFOR blocks + impacts
      ->  codec.py delta+varint packed binary blocks with (max_tf, min_dlq)
          block-max metadata, keyed by (term, doc-range block)
  segments_N commit  ->  atomic parquet/Iceberg snapshot directory + manifest

Partitioning strategy (designed for 10^12 docs / 1000 executors):
  * the build shuffles ONCE by (term, doc-range block): block key is derived
    from doc_id arithmetic, NOT from a global per-term rank, so head terms
    (Zipf skew) spread across many blocks/tasks instead of funnelling into
    one reducer — this is the explicit skew answer the north_rule asks for
    (plus optional salting in the flat-tf aggregation, see `salt`).
  * postings are written bucketed by hash(term) so a query's term lookups
    prune to a few buckets (Iceberg: `bucket(term, B)`; parquet fallback:
    a `bucket` partition column).
  * docmeta is range-partitioned by doc_id (late-materialization joins).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BM25_K1  # noqa: F401  (re-exported for callers)
from .ids import assign_dense_ids
from .udfs import make_analyze_udf, norm_byte_udf, quantized_len_udf

DEFAULT_BUCKETS = 16
BLOCK_SPAN = 4096  # doc-range width per packed posting block


def analyzed_docs(pages: DataFrame, profile: str = "en") -> DataFrame:
    """pages -> (doc_id, url, lang, field_len, norm info, toks).

    One analysis pass feeds both docmeta and postings (the reference also
    inverts exactly once per doc — DefaultIndexingChain#processDocument).
    Kept for tests/small corpora; the build hot path is `analyzed_flat`.
    """
    analyze_udf = make_analyze_udf(profile)
    toks = pages.select(
        "url", "lang", analyze_udf(F.col("text")).alias("toks")
    ).withColumn("field_len", F.size("toks"))
    with_ids = assign_dense_ids(toks, "url")
    return (
        with_ids.withColumn("norm_byte", norm_byte_udf("field_len"))
        .withColumn("dlq", quantized_len_udf("field_len"))
    )


_FLAT_SCHEMA = (
    "doc_id long, url string, lang string, field_len int, norm_byte int, "
    "dlq int, term string, pos int"
)


def analyzed_flat(
    pages: DataFrame, profile: str = "en", doc_base: int = 0
) -> DataFrame:
    """The vectorized write path: pages -> ONE flat columnar pass.

    Emits, per Arrow batch, a doc-header row per document (term IS NULL,
    carrying url/lang/field_len/norm_byte/dlq — the docmeta) plus one row
    per emitted token (doc_id, dlq, term, pos). This keeps analysis fully
    columnar (analysis.analyze_flat: unique-token chain + numpy scatter;
    no per-row Python) and needs NO doc-level join afterwards — the header
    rows ARE docmeta, filtered not shuffled.

    doc_ids are assigned on a slim url-only projection first (scalable
    dense-rank, ids.assign_dense_ids), then joined back doc-level — at
    10^12 rows that join is hash-partitioned by url on both sides.
    """
    import pandas as pd

    from .analysis import analyze_flat
    from .norms import LENGTH_TABLE, int_to_byte4

    ids = assign_dense_ids(pages.select("url"), "url")
    if doc_base:
        ids = ids.withColumn("doc_id", F.col("doc_id") + F.lit(doc_base))
    with_ids = pages.select("url", "lang", "text").join(ids, "url")

    def gen(batches):
        for pdf in batches:
            row_idx, terms, pos, field_len = analyze_flat(
                pdf["text"].to_numpy(), profile
            )
            doc_ids = pdf["doc_id"].to_numpy()
            nb = int_to_byte4(field_len)
            dlq = LENGTH_TABLE[nb]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "url": pdf["url"].to_numpy(),
                    "lang": pdf["lang"].to_numpy(),
                    "field_len": field_len,
                    "norm_byte": nb,
                    "dlq": dlq,
                    "term": None,
                    "pos": None,
                }
            )
            if len(row_idx):
                yield pd.DataFrame(
                    {
                        "doc_id": doc_ids[row_idx],
                        "url": None,
                        "lang": None,
                        "field_len": None,
                        "norm_byte": None,
                        "dlq": dlq[row_idx],
                        "term": terms,
                        "pos": pos,  # 0-based, same as analyze()
                    }
                )

    return with_ids.mapInPandas(gen, _FLAT_SCHEMA)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    profile: str = "en",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: int = 0,
    packed: bool = True,
    doc_base: int = 0,
) -> dict:
    """Build the full index under `out_dir` (docmeta/, postings/, term_stats/,
    stats/). Returns collection stats. Idempotent overwrite per table.
    """
    from pyspark import StorageLevel

    stream = analyzed_flat(pages, profile, doc_base).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    docmeta = stream.filter(F.col("term").isNull()).select(
        "doc_id", "url", "lang", "field_len", "norm_byte", "dlq"
    )
    docmeta.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 1), "doc_id"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "docmeta"))

    # dlq (SmallFloat-decoded quantized doc length) is DENORMALIZED into each
    # posting row — the Spark analog of Lucene's doc-local norms array read:
    # it turns the per-query docmeta join (a shuffle) into a column read.
    tok = stream.filter(F.col("term").isNotNull()).select(
        "doc_id", "dlq", "term", "pos"
    )

    if salt > 1:
        # two-stage salted aggregation for extreme head-term skew:
        # partial (term, salt) combine, then final combine — the classic
        # map-side-combine answer to Zipf keys (SURVEY.md §5.3 item 6).
        partial = tok.groupBy(
            "term", "doc_id", (F.pmod(F.col("pos"), F.lit(salt))).alias("_s")
        ).agg(
            F.count("*").alias("tf"),
            F.first("dlq").alias("dlq"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        perdoc = partial.groupBy("term", "doc_id").agg(
            F.sum("tf").alias("tf"),
            F.first("dlq").alias("dlq"),
            F.sort_array(F.flatten(F.collect_list("positions"))).alias("positions"),
        )
    else:
        perdoc = tok.groupBy("term", "doc_id").agg(
            F.count("*").alias("tf"),
            F.first("dlq").alias("dlq"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )

    perdoc = perdoc.persist(StorageLevel.MEMORY_AND_DISK)
    postings = perdoc.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    )
    postings.repartition(num_buckets, "bucket").sortWithinPartitions(
        "term", "doc_id"
    ).write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "postings")
    )

    if packed:
        write_packed_postings(perdoc, out_dir, num_buckets)

    term_stats = (
        perdoc.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int"))
    )
    term_stats.repartition(num_buckets, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, "term_stats"))

    agg = docmeta.agg(
        F.count("*").alias("N"), F.sum("field_len").alias("sum_ttf")
    ).collect()[0]
    n_docs, sum_ttf = int(agg["N"]), int(agg["sum_ttf"] or 0)
    stats = {
        "doc_count": n_docs,
        "sum_total_term_freq": sum_ttf,
        "avgdl": (sum_ttf / n_docs) if n_docs else 0.0,
        "profile": profile,
        "num_buckets": num_buckets,
    }
    spark.createDataFrame([stats]).coalesce(1).write.mode("overwrite").json(
        os.path.join(out_dir, "stats")
    )
    stream.unpersist()
    perdoc.unpersist()
    return stats


PACKED_SCHEMA = (
    "term string, blk long, n int, docs binary, tfs binary, dlqs binary, "
    "max_tf int, min_dlq int"
)


def write_packed_postings(
    perdoc: DataFrame, out_dir: str, num_buckets: int
) -> None:
    """Per-(term, doc) postings -> packed binary blocks with impacts.

    Spark restatement of Lucene84PostingsWriter blocks + impacts
    (SURVEY.md §4.1 step 4; ForUtil.java ≈L80, CompetitiveImpactAccumulator
    ≈L30): each (term, blk) group packs its sorted doc_ids (delta+varint),
    tfs and dlqs, and records the block-max impact pair (max_tf, min_dlq)
    that upper-bounds BM25 for any (k1, b).

    Block key = doc_id // BLOCK_SPAN — a doc-RANGE, not a per-term rank, so
    (a) head terms spread over many groups (Zipf skew answer) and (b) blocks
    ALIGN across terms: every posting for one doc lands in the same blk for
    every term, which turns block-max WAND into a per-blk kernel (wand.py).
    """
    import pandas as pd

    from .codec import pack_postings_block, varint_encode

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf["doc_id"].to_numpy().argsort(kind="stable")
        docs = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order]
        dlqs = pdf["dlq"].to_numpy()[order]
        docs_blob, tfs_blob = pack_postings_block(docs, tfs)
        import numpy as np

        dlqs_blob = varint_encode(dlqs.astype(np.uint64))
        return pd.DataFrame(
            {
                "term": [key[0]],
                "blk": [key[1]],
                "n": [len(docs)],
                "docs": [docs_blob],
                "tfs": [tfs_blob],
                "dlqs": [dlqs_blob],
                "max_tf": [int(tfs.max())],
                "min_dlq": [int(dlqs.min())],
            }
        )

    blocked = perdoc.groupBy(
        "term", (F.col("doc_id") / BLOCK_SPAN).cast("long").alias("blk")
    )
    packed = blocked.applyInPandas(pack, PACKED_SCHEMA).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    )
    packed.repartition("bucket").sortWithinPartitions(
        "term", "blk"
    ).write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "packed")
    )


def read_index(spark: SparkSession, index_dir: str) -> dict:
    """Open an index directory -> dict of DataFrames + collection stats."""
    import json
    import glob

    stats_files = glob.glob(os.path.join(index_dir, "stats", "part-*"))
    with open(stats_files[0]) as f:
        stats = json.loads(f.readline())
    out = {
        "docmeta": spark.read.parquet(os.path.join(index_dir, "docmeta")),
        "postings": spark.read.parquet(os.path.join(index_dir, "postings")),
        "term_stats": spark.read.parquet(os.path.join(index_dir, "term_stats")),
        "stats": stats,
    }
    packed_dir = os.path.join(index_dir, "packed")
    if os.path.isdir(packed_dir):
        out["packed"] = spark.read.parquet(packed_dir)
    return out


def bucket_of(term: str, num_buckets: int, spark: SparkSession) -> int:
    """Driver-side bucket id for a term (matches F.xxhash64 pmod)."""
    row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(term)), F.lit(num_buckets)).cast("int").alias("b")
    ).collect()[0]
    return int(row["b"])
