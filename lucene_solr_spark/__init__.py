"""lucene_solr_spark — a from-scratch, PySpark-native full-text index + BM25
query engine with the query/data-processing capabilities of the reference
``01user/lucene-solr`` (apache/lucene-solr 8.x-era fork), re-expressed
Spark-first (DataFrame/SQL/Catalyst), NOT a port.

Architecture (SURVEY.md §8): three derived tables

    pages(url, warc_ts, html, text, lang)          -- input (Common-Crawl-style)
      -> docmeta(doc_id, url, lang, field_len, norm_byte)
      -> postings(term, doc_id, tf, positions)     -- flat layout (joins/phrases)
      -> postings_packed(term, block_*, bin)       -- 128-doc delta+varint blocks
      -> term_stats(term, df, ttf)                 -- global exact stats

plus a query layer that compiles a parsed query AST into a DataFrame plan
ending in ``orderBy(desc(score), asc(doc_id)).limit(k)``.

Reference parity citations use the convention of SURVEY.md §0: paths are
repo-relative to the lucene-solr monorepo (mounted read-only at
/root/reference once present), symbols are the durable anchor.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy temporaries on the persistent brk heap.

    glibc hands every allocation >= MMAP_THRESHOLD (128 KB default) its
    own mmap and munmaps it on free, so each vectorized numpy op over a
    multi-MB batch re-faults all of its temp pages. On bare metal that's
    noise; on virtualized hosts page faults can cost ~1000x more
    (measured ~2 ms/page on this sandbox — a 2.4M-row int64 multiply took
    10 s cold vs 14 ms warm), which made the analyzer kernel 20-50x
    slower than its arithmetic. Raising the mmap+trim thresholds keeps
    those buffers in the arena: one warmup per long-lived Python worker
    (spark.python.worker.reuse=true default), then zero fault traffic.
    Trade-off: worker RSS stays at its per-batch peak (hundreds of MB),
    which is the norm for executor-side workers anyway. No-op off glibc;
    set SPARK_GRAFT_NO_MALLOC_TUNE=1 to disable."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()

BM25_K1 = 1.2
BM25_B = 0.75

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — the 33-word default stop set
# (ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
#  EnglishAnalyzer.java ≈L45). Pinned verbatim per FIXTURES.md §3.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)
