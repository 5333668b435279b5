"""Round-3 breadth operators: BFS level table, DrillSideways facets,
per-host caps, snapshot-incremental MinHash dedup, CheckIndex audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bfs_levels
# ---------------------------------------------------------------------------

def test_bfs_levels_min_depth_and_cycle(spark):
    """Diamond + cycle: depth is the MINIMUM hop count; cycles terminate."""
    from lucene_solr_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"),
         ("d", "e"), ("x", "y")],
        ["src", "dst"],
    )
    src = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_levels(
        edges, "src", "dst", src, max_depth=10
    ).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}
    # x/y unreachable -> absent


def test_bfs_levels_max_depth_truncates(spark):
    from lucene_solr_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n3")], ["src", "dst"]
    )
    src = spark.createDataFrame([("n0",)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_levels(
        edges, "src", "dst", src, max_depth=2
    ).collect()}
    assert got == {"n0": 0, "n1": 1, "n2": 2}


# ---------------------------------------------------------------------------
# drill_sideways
# ---------------------------------------------------------------------------

def test_drill_sideways_excludes_own_filter(spark):
    from lucene_solr_spark.operators.facets import drill_sideways

    df = spark.createDataFrame(
        [("b1", "t1"), ("b1", "t2"), ("b2", "t1"), ("b2", "t1"), ("b3", "t2")],
        ["brand", "typ"],
    )
    out = drill_sideways(df, {"brand": "b1", "typ": "t1"}, limit=10)
    rows = {(r["dim"], r["facet_value"]): r["count"] for r in out.collect()}
    # brand counts under typ=t1 only (own brand filter excluded)
    assert rows[("brand", "b1")] == 1
    assert rows[("brand", "b2")] == 2
    assert ("brand", "b3") not in rows  # b3 has no t1 rows
    # typ counts under brand=b1 only
    assert rows[("typ", "t1")] == 1
    assert rows[("typ", "t2")] == 1


def test_drill_sideways_none_selection_means_unfiltered(spark):
    from lucene_solr_spark.operators.facets import drill_sideways

    df = spark.createDataFrame(
        [("b1", "t1"), ("b2", "t2"), ("b2", "t2")], ["brand", "typ"]
    )
    out = drill_sideways(df, {"brand": "b1", "typ": None}, limit=10)
    rows = {(r["dim"], r["facet_value"]): r["count"] for r in out.collect()}
    # typ not drilled -> brand facet sees the whole corpus
    assert rows[("brand", "b1")] == 1 and rows[("brand", "b2")] == 2
    # typ facet still applies brand=b1
    assert rows[("typ", "t1")] == 1 and ("typ", "t2") not in rows


# ---------------------------------------------------------------------------
# host_cap_sample
# ---------------------------------------------------------------------------

def test_host_cap_keeps_top_by_order_col(spark):
    from lucene_solr_spark.pipeline.webprep import host_cap_sample

    rows = [
        (1, "http://a.com/p1", 10),
        (2, "https://WWW.A.com/p2", 30),
        (3, "http://a.com:80/p3", 20),
        (4, "http://b.com/only", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "quality"])
    kept = host_cap_sample(
        df, cap=2, order_col="quality", tiebreak=["doc_id"]
    ).select("doc_id", "host").collect()
    got = {(r["doc_id"], r["host"]) for r in kept}
    # a.com appears under 3 surface forms -> one host; top-2 by quality
    assert got == {(2, "a.com"), (3, "a.com"), (4, "b.com")}


def test_host_cap_deterministic_tiebreak(spark):
    from lucene_solr_spark.pipeline.webprep import host_cap_sample

    rows = [(i, "http://t.com/same", 7) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "url", "quality"])
    kept = sorted(
        r["doc_id"]
        for r in host_cap_sample(
            df, cap=3, order_col="quality", tiebreak=["doc_id"]
        ).collect()
    )
    assert kept == [0, 1, 2]  # identical url+quality -> lowest ids win


# ---------------------------------------------------------------------------
# incremental_band_filter
# ---------------------------------------------------------------------------

def test_incremental_band_filter_flags_near_dups(spark):
    from lucene_solr_spark.pipeline.dedup import (
        incremental_band_filter, minhash_signature,
    )

    corpus_txt = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six"),
    ]
    batch_txt = [
        (10, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0
        (11, "totally different words here now ok"),   # new
    ]

    def tok(rows):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )

    corpus_sig = minhash_signature(tok(corpus_txt), num_hashes=4)
    batch_sig = minhash_signature(tok(batch_txt), num_hashes=4)
    out = {
        r["doc_id"]: (r["n_hit_bands"], r["is_candidate_dup"])
        for r in incremental_band_filter(
            corpus_sig, batch_sig, bands=2, rows_per_band=2
        ).collect()
    }
    assert out[10] == (2, True)   # identical text -> both bands collide
    assert out[11] == (0, False)  # fresh content passes through


def test_incremental_band_filter_corpus_scale_shape(spark):
    """The probe side only carries batch rows: output row count == batch
    size regardless of corpus size (the persisted-band-table contract)."""
    from lucene_solr_spark.pipeline.dedup import (
        incremental_band_filter, minhash_signature,
    )

    corpus = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.explode(
            F.array(*[F.concat(F.lit(f"w{j}_"), F.col("id")) for j in range(6)])
        ).alias("term"),
    )
    batch = spark.range(3).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.explode(
            F.array(*[F.concat(F.lit(f"b{j}_"), F.col("id")) for j in range(6)])
        ).alias("term"),
    )
    out = incremental_band_filter(
        minhash_signature(corpus, 4), minhash_signature(batch, 4), 2, 2
    )
    assert out.count() == 3
    assert out.filter(F.col("is_candidate_dup")).count() == 0


# ---------------------------------------------------------------------------
# check_index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index

    out = str(tmp_path_factory.mktemp("chkidx"))
    pages = str(tmp_path_factory.mktemp("chkpages") / "pages.parquet")
    write_pages(0.0003, pages)
    build_index(spark, spark.read.parquet(pages), out, num_buckets=4)
    return out, read_index(spark, out)


def test_check_index_clean_build_all_ok(spark, small_index):
    from lucene_solr_spark.checkindex import check_index

    _, idx = small_index
    rows = check_index(spark, idx).collect()
    assert len(rows) == 7
    assert all(r["ok"] for r in rows), [tuple(r) for r in rows]


def test_check_index_detects_corruption(spark, small_index):
    """Tamper with term_stats (df+1 on one term) -> the audit must flag
    term_stats_df_ttf and packed_df_ttf, and only those."""
    from lucene_solr_spark.checkindex import check_index

    _, idx = small_index
    bad = dict(idx)
    bad["term_stats"] = idx["term_stats"].withColumn(
        "df",
        F.when(
            F.col("term")
            == idx["term_stats"].orderBy("term").limit(1).collect()[0]["term"],
            F.col("df") + 1,
        ).otherwise(F.col("df")),
    )
    got = {r["check"]: r["ok"] for r in check_index(spark, bad).collect()}
    assert got["term_stats_df_ttf"] is False
    assert got["packed_df_ttf"] is False
    assert got["doc_count"] and got["tf_positions"] and got["bucket_hash"]
