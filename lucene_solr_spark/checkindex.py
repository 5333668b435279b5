"""CheckIndex — index-integrity audit over a built index directory.

Spark restatement of lucene/core/src/java/org/apache/lucene/index/
CheckIndex.java (≈L400 term/postings cross-checks, ≈L900 norms check):
verify that the four written tables (docmeta, postings, packed,
term_stats) and the stats row agree with each other. Lucene walks the
segment files sequentially on one box; here every cross-check is a
distributed aggregation over the same parquet the queries read, so the
audit scales with the cluster exactly like a query does — and doubles
as a lineage/quality gate after builds, merges and resumes
(north_rule: per-partition lineage + metrics).

Checks (each one row: check, expected, actual, ok):
  doc_count            stats.doc_count == count(docmeta)
  sum_ttf              stats.sum_total_term_freq == sum(docmeta.field_len)
  tf_positions         every flat posting has size(positions) == tf
  bucket_hash          every posting row sits in pmod(xxhash64(term), B)
  term_stats_df_ttf    term_stats (df, ttf) == flat postings recount
  packed_df_ttf        packed (sum n, sum sum_tf) per term == term_stats
  norms_recompute      docmeta.norm_byte == SmallFloat(field_len) recomputed
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row(spark, check: str, expected, actual) -> DataFrame:
    return spark.createDataFrame(
        [(check, int(expected), int(actual))], "check string, expected long, actual long"
    )


def check_index(spark, index: dict) -> DataFrame:
    """Run all integrity checks -> DataFrame(check, expected, actual, ok).

    Eager by design (CheckIndex is a batch audit, not a query operator):
    each check is one aggregation job; the returned frame is a local
    7-row relation. `index` is read_index()'s dict.
    """
    docmeta, postings = index["docmeta"], index["postings"]
    term_stats, stats = index["term_stats"], index["stats"]
    nb = int(stats.get("num_buckets", 16))

    rows = []

    dm = docmeta.agg(
        F.count("*").alias("n"), F.sum("field_len").alias("ttf")
    ).collect()[0]
    rows.append(("doc_count", stats["doc_count"], int(dm["n"])))
    rows.append(("sum_ttf", stats["sum_total_term_freq"], int(dm["ttf"] or 0)))

    p = postings.agg(
        F.sum(
            F.when(F.size("positions") != F.col("tf"), 1).otherwise(0)
        ).alias("bad_pos"),
        F.sum(
            F.when(
                F.col("bucket")
                != F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int"),
                1,
            ).otherwise(0)
        ).alias("bad_bucket"),
    ).collect()[0]
    rows.append(("tf_positions", 0, int(p["bad_pos"] or 0)))
    rows.append(("bucket_hash", 0, int(p["bad_bucket"] or 0)))

    flat = postings.groupBy("term").agg(
        F.count("*").alias("df2"), F.sum("tf").alias("ttf2")
    )
    bad_ts = (
        term_stats.select("term", "df", "ttf")
        .join(flat, "term", "full")
        .filter(
            F.col("df").isNull()
            | F.col("df2").isNull()
            | (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
        )
        .count()
    )
    rows.append(("term_stats_df_ttf", 0, bad_ts))

    if "packed" in index:
        pk = index["packed"].groupBy("term").agg(
            F.sum("n").alias("df3"), F.sum("sum_tf").alias("ttf3")
        )
        bad_pk = (
            term_stats.select("term", "df", "ttf")
            .join(pk, "term", "full")
            .filter(
                F.col("df").isNull()
                | F.col("df3").isNull()
                | (F.col("df") != F.col("df3"))
                | (F.col("ttf") != F.col("ttf3"))
            )
            .count()
        )
        rows.append(("packed_df_ttf", 0, bad_pk))

    from .udfs import norm_byte_udf

    bad_norm = docmeta.filter(
        F.col("norm_byte") != norm_byte_udf("field_len")
    ).count()
    rows.append(("norms_recompute", 0, bad_norm))

    out = spark.createDataFrame(
        [(c, int(e), int(a)) for c, e, a in rows],
        "check string, expected long, actual long",
    )
    return out.withColumn("ok", F.col("expected") == F.col("actual")).orderBy(
        "check"
    )
