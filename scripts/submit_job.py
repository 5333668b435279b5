"""spark-submit entry point (north_rule deployment shape):

    zip -r /tmp/lucene_solr_spark.zip lucene_solr_spark
    spark-submit --master local[8] \
        --py-files /tmp/lucene_solr_spark.zip \
        scripts/submit_job.py --sf 0.001 --out /tmp/submit_idx

Builds the index from a freshly generated pages corpus and runs a BM25
top-10 — the same code path a 1000-executor cluster would run, with the
package shipped via --py-files instead of a local checkout.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lss-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.wand import WandSearcher

    pages_pq = tempfile.mktemp(suffix=".parquet", prefix="submit_pages_")
    n = write_pages(args.sf, pages_pq)
    out = args.out or tempfile.mkdtemp(prefix="submit_idx_")

    t0 = time.perf_counter()
    stats = build_index(
        spark, spark.read.parquet(pages_pq), out, profile="en", num_buckets=4
    )
    build_s = time.perf_counter() - t0

    idx = read_index(spark, out)
    top = [
        (r["doc_id"], round(r["score"], 4))
        for r in Searcher(idx).search("search engine", 10, with_fields=False).collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 4))
        for r in WandSearcher(idx).search(["search", "engin"], 10).collect()
    ]
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "n_docs": n,
                "build_s": round(build_s, 2),
                "doc_count": stats["doc_count"],
                "top1": top[0] if top else None,
                "wand_top1": wand[0] if wand else None,
                "rank_identical": top == wand
                or [t[0] for t in top] == [w[0] for w in wand],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
