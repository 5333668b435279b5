"""Round-4 ADVICE regression tests: pack_shards exchange persistence,
free_text_suggest empty input, DisMax synonym expansion, latest_dv
dup-within-generation dedupe, multiprobe flip ordering, and the
"no silent caps" truncation counters (VERDICT item 3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.metrics import CAP_METRICS


def test_pack_shards_persists_exchange_and_matches_serial(spark):
    from lucene_solr_spark.pipeline.sampling import pack_shards

    n = 5_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).cast("double").alias("n_tokens"),
    )
    reg: list = []
    out = pack_shards(docs, "n_tokens", budget=500.0, partitions=8,
                      cache_registry=reg)
    rows = out.orderBy("doc_id").collect()
    # the exchange must be pinned so both passes share one partitioning
    assert len(reg) == 1 and reg[0].is_cached
    # serial greedy oracle
    acc, exp = 0.0, []
    for i in range(n):
        w = float(i % 97 + 1)
        exp.append(int(acc // 500.0))
        acc += w
    got = [int(r["shard"]) for r in rows]
    assert got == exp
    assert CAP_METRICS["pack_shards.offsets"]["dropped"] == 0
    for h in reg:
        h.unpersist()


def test_free_text_suggest_empty_and_whitespace(spark):
    from lucene_solr_spark.operators.search_features import free_text_suggest

    tokens = spark.createDataFrame(
        [(1, "merge", 0), (1, "sort", 1), (2, "merge", 0), (2, "merge", 1)],
        "doc_id long, term string, pos int",
    )
    for typed in ("", "   "):
        got = free_text_suggest(tokens, typed, k=2).collect()
        # unigram top-k fallback: most frequent term first
        assert [r["term"] for r in got] == ["merge", "sort"]


def test_expand_synonyms_recurses_dismax():
    from lucene_solr_spark.query import DisMax, Synonym, Term
    from lucene_solr_spark.query_parser import expand_synonyms

    syn = {"fast": ["quick"]}
    q = DisMax(children=[Term("fast"), Term("join")], tie_breaker=0.3)
    out = expand_synonyms(q, syn)
    assert isinstance(out, DisMax) and out.tie_breaker == 0.3
    assert out.children[0] == Synonym(terms=("fast", "quick"))
    assert out.children[1] == Term("join")


def test_latest_dv_dedupes_within_generation(spark, tmp_path):
    from lucene_solr_spark.docvalues import (
        latest_dv,
        resolve_docvalues,
        update_numeric_docvalues,
    )

    out = str(tmp_path / "idx")
    # one generation containing TWO rows for doc 7 (shared seq)
    upd = spark.createDataFrame(
        [(7, 1.0), (7, 3.0), (8, 5.0)], "doc_id long, value double"
    )
    update_numeric_docvalues(spark, out, upd, "rank")
    lat = latest_dv(spark, out, "rank").orderBy("doc_id").collect()
    assert [(r["doc_id"], r["value"]) for r in lat] == [(7, 3.0), (8, 5.0)]
    base = spark.createDataFrame([(7,), (8,), (9,)], "doc_id long")
    res = resolve_docvalues(spark, out, base, "rank")
    # no fan-out: one output row per base row
    assert res.count() == 3


def test_probe_cells_orders_flips_by_margin():
    from lucene_solr_spark.vectors import _probe_cells

    # 3 hyperplanes; query nearly ON plane 2, far from planes 0 and 1
    planes = [[1.0, 0.0], [0.0, 1.0], [0.7071, -0.7071]]
    meta = {"quantizer": "hyperplane", "planes": planes}
    q = [1.0, 0.99]  # margins: |1.0|, |0.99|, |0.00707| -> flip 2 first
    cells = _probe_cells(meta, q, nprobe=2)
    own = cells[0]
    assert cells[1] == own ^ (1 << 2)
    # full expansion still yields own + all single-bit flips
    assert len(_probe_cells(meta, q, nprobe=4)) == 4


def test_cap_metric_pq_train(spark):
    import lucene_solr_spark.pipeline.pq as PQ

    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    PQ.pq_train(emb, m=4, ksub=4, sample_rows=32, iters=2)
    m = CAP_METRICS["pq_train.sample"]
    assert m["kept"] == 32 and m["dropped"] == 28


def test_cap_metric_train_bpe(spark):
    from lucene_solr_spark.pipeline.bpe import train_bpe

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"), (2, "aa bb cc ii jj kk")],
        "doc_id long, text string",
    )
    train_bpe(docs, num_merges=3, max_words=5)
    m = CAP_METRICS["train_bpe.vocab"]
    assert m["kept"] == 5 and m["dropped"] == 6  # 11 distinct words total
