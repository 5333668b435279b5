"""Codec round-trips, flat-analyzer parity, and the WAND differential
oracle (the TestWANDScorer pattern, SURVEY.md §6.1): pruned top-k must be
rank- and score-identical to the exhaustive scorer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_varint_roundtrip_random():
    from lucene_solr_spark.codec import varint_decode, varint_encode

    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(0, 400))
        bits = int(rng.integers(1, 50))
        vals = rng.integers(0, 1 << bits, size=n).astype(np.uint64)
        enc = varint_encode(vals)
        dec, off = varint_decode(enc)
        assert off == len(enc)
        assert np.array_equal(dec, vals)


def test_varint_edges():
    from lucene_solr_spark.codec import varint_decode, varint_encode

    for arr in (
        np.empty(0, dtype=np.uint64),
        np.zeros(7, dtype=np.uint64),
        np.array([127, 128, 129, (1 << 35) - 1], dtype=np.uint64),
    ):
        dec, _ = varint_decode(varint_encode(arr))
        assert np.array_equal(dec, arr)


def test_postings_block_roundtrip_and_compression():
    from lucene_solr_spark.codec import (
        pack_postings_block,
        unpack_postings_block,
    )

    rng = np.random.default_rng(11)
    docs = np.sort(rng.choice(1_000_000, size=5000, replace=False))
    tfs = rng.integers(1, 50, size=5000)
    db, tb = pack_postings_block(docs, tfs)
    d2, t2 = unpack_postings_block(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    # delta+varint must beat raw int64+int64 representation comfortably
    assert len(db) + len(tb) < 5000 * 16 / 3


# ---------------------------------------------------------------------------
# flat analyzer parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("profile", ["en", "standard", "simple"])
def test_analyze_flat_matches_analyze(profile):
    from lucene_solr_spark.analysis import analyze, analyze_flat
    from lucene_solr_spark.fixtures import generate_pages

    texts = generate_pages(300).column("text").to_pylist()
    texts += ["", "the a of", "Engine's O'Neil 中文日本 3.14 x" + "y" * 600]
    row_idx, terms, pos, field_len = analyze_flat(texts, profile)
    per_row: dict[int, list] = {}
    for r, t, p in zip(row_idx, terms, pos):
        per_row.setdefault(int(r), []).append((t, int(p)))
    for i, txt in enumerate(texts):
        expect = analyze(txt, profile)
        assert per_row.get(i, []) == expect, f"row {i} ({profile})"
        assert field_len[i] == len(expect)


# ---------------------------------------------------------------------------
# WAND differential oracle — multi-block via shrunken BLOCK_SPAN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wand_index(spark, pages_small, tmp_path_factory, request):
    import lucene_solr_spark.indexer as indexer
    from lucene_solr_spark.indexer import build_index, read_index

    old_span = indexer.BLOCK_SPAN
    indexer.BLOCK_SPAN = 64  # 1000 docs -> ~16 blocks: pruning is real
    try:
        out = str(tmp_path_factory.mktemp("wandidx") / "idx")
        pages = spark.read.parquet(pages_small)
        build_index(spark, pages, out, profile="en", num_buckets=4)
        yield read_index(spark, out)
    finally:
        indexer.BLOCK_SPAN = old_span


@pytest.fixture(scope="module")
def small_span():
    import lucene_solr_spark.indexer as indexer

    old = indexer.BLOCK_SPAN
    indexer.BLOCK_SPAN = 64
    yield
    indexer.BLOCK_SPAN = old


QUERIES = [
    (["search"], "or"),
    (["search", "engin"], "or"),
    (["search", "engin"], "and"),
    (["the"], "or"),  # stopword: not in index -> empty
    (["w000001", "w000002", "w000003"], "or"),
    (["nosuchterm"], "or"),
    (["search", "nosuchterm"], "and"),
]


@pytest.mark.parametrize("terms,mode", QUERIES)
def test_wand_equals_exhaustive(spark, wand_index, small_span, terms, mode):
    from lucene_solr_spark.query import Boolean, Term
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.wand import WandSearcher

    s = Searcher(wand_index)
    w = WandSearcher(wand_index)
    clauses = [Term(t) for t in terms]
    bq = Boolean(must=clauses) if mode == "and" else Boolean(should=clauses)
    exact = [
        (r["doc_id"], round(r["score"], 8))
        for r in s.score_all(bq)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 8))
        for r in w.search(terms, 10, mode).collect()
    ]
    assert wand == exact


@pytest.mark.parametrize(
    "terms",
    [
        ["search"],
        ["search", "engin"],
        ["w000001", "w000002", "w000003"],
        ["search", "nosuchterm"],
        ["nosuchterm"],
        ["search", "search", "engin"],  # repeated clause: multiplicity
    ],
)
def test_maxscore_equals_wand_and_exhaustive(spark, wand_index, small_span, terms):
    from lucene_solr_spark.query import Boolean, Term
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.wand import WandSearcher

    s = Searcher(wand_index)
    w = WandSearcher(wand_index)
    w.probe_threshold = 4  # force the θ-probe/partition path
    exact = [
        (r["doc_id"], round(r["score"], 8))
        for r in s.score_all(Boolean(should=[Term(t) for t in terms]))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    ]
    ms = [
        (r["doc_id"], round(r["score"], 8))
        for r in w.search_maxscore(terms, 10).collect()
    ]
    assert ms == exact


def test_maxscore_partitions_terms(spark, wand_index, small_span):
    """A high-idf rare term + a low-impact term: the low one must land in
    the non-essential set once θ is known, and results stay exact."""
    from lucene_solr_spark.wand import WandSearcher

    w = WandSearcher(wand_index)
    w.probe_threshold = 4
    info: dict = {}
    got = w.search_maxscore(["w000001", "search"], 10, prune_info=info).collect()
    assert len(got) > 0
    assert info["essential"], info
    # partition is a disjoint cover of the query terms
    assert set(info["essential"]) | set(info["non_essential"]) <= {
        "w000001", "search"
    }
    assert not (set(info["essential"]) & set(info["non_essential"]))


def test_wand_prunes_blocks(spark, wand_index, small_span):
    from lucene_solr_spark.wand import WandSearcher

    w = WandSearcher(wand_index)
    w.probe_threshold = 4  # force the θ-probe path on this small index
    st = w.pruning_stats(["search", "engin"], 5)
    assert st["total_blocks"] > 4
    assert st["kept_blocks"] < st["total_blocks"], st


def test_packed_blocks_align_and_sorted(wand_index):
    """CheckIndex-style invariants on the packed table (SURVEY.md §6.2.6)."""
    from lucene_solr_spark.codec import unpack_postings_block

    rows = wand_index["packed"].limit(200).collect()
    assert rows
    for r in rows:
        docs, tfs = unpack_postings_block(bytes(r["docs"]), bytes(r["tfs"]))
        assert len(docs) == r["n"]
        assert (np.diff(docs) > 0).all()  # strictly increasing doc_ids
        assert (tfs >= 1).all()
        assert tfs.max() == r["max_tf"]
        assert (docs // 64 == r["blk"]).all()  # doc-range alignment


# ---------------------------------------------------------------------------
# driver-side xxhash64 must match Spark's (bucket-pruning soundness)
# ---------------------------------------------------------------------------

def test_xxhash64_matches_spark(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.xxhash import xxhash64

    words = (
        ["", "a", "ab", "abc", "abcd", "search", "engine's", "café", "中文"]
        + ["x" * n for n in (5, 7, 8, 9, 15, 16, 31, 32, 33, 64, 100)]
        + [f"w{i:06d}" for i in range(50)]
    )
    df = spark.createDataFrame([(w,) for w in words], "t string").select(
        "t", F.xxhash64("t").alias("h")
    )
    for r in df.collect():
        assert xxhash64(r["t"]) == r["h"], r["t"]


def test_bucket_pruning_in_plan(index_small):
    """The term postings scan must touch only the term's bucket partition
    (PartitionFilters in the FileSourceScan)."""
    from lucene_solr_spark.search import Searcher

    s = Searcher(index_small)
    plan = s._term_postings("search")._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


# ---------------------------------------------------------------------------
# arrow-native packer (no Spark: drives the mapInArrow generator directly)
# ---------------------------------------------------------------------------

def _capture_packer():
    """Grab write_packed_postings' partition generator without a session."""
    import lucene_solr_spark.indexer as ix

    captured = {}

    class _Stub:
        columns = ["term", "doc_id", "tf", "dlq", "bucket"]

        def select(self, *a):
            return self

        def mapInArrow(self, fn, schema):
            captured["fn"] = fn
            raise RuntimeError("captured")

    with pytest.raises(RuntimeError, match="captured"):
        ix.write_packed_postings(_Stub(), "/tmp/_x", 4, pre_partitioned=True)
    return captured["fn"]


def _synthetic_stream(n_terms=40, docs_per_term=50, seed=7):
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    terms = np.repeat([f"t{i:03d}" for i in range(n_terms)], docs_per_term)
    docs = np.concatenate(
        [
            np.sort(rng.choice(20000, docs_per_term, replace=False))
            for _ in range(n_terms)
        ]
    ).astype(np.int64)
    tf = rng.randint(1, 9, len(terms)).astype(np.int32)
    dlq = rng.randint(1, 200, len(terms)).astype(np.int32)
    bk = np.full(len(terms), 1, np.int32)
    rb = pa.RecordBatch.from_arrays(
        [pa.array(terms), pa.array(docs), pa.array(tf), pa.array(dlq), pa.array(bk)],
        names=["term", "doc_id", "tf", "dlq", "bucket"],
    )
    return rb, terms, docs, tf, dlq


def test_arrow_packer_wire_format_and_groups():
    """Framed blobs decode back to the exact per-(term, blk) input slices;
    impacts are the true per-group max_tf / min_dlq / sum_tf."""
    import collections

    import pyarrow as pa

    import lucene_solr_spark.indexer as ix
    from lucene_solr_spark.codec import varint_decode

    fn = _capture_packer()
    rb, terms, docs, tf, dlq = _synthetic_stream()
    out = pa.Table.from_batches(list(fn(iter([rb])))).to_pydict()

    exp = collections.defaultdict(lambda: {"docs": [], "tf": [], "dlq": []})
    for t, d, f_, q in zip(terms, docs, tf, dlq):
        g = exp[(t, int(d) // ix.BLOCK_SPAN)]
        g["docs"].append(int(d))
        g["tf"].append(int(f_))
        g["dlq"].append(int(q))
    assert len(out["term"]) == len(exp)
    for i in range(len(out["term"])):
        g = exp[(out["term"][i], out["blk"][i])]
        dv, _ = varint_decode(out["docs"][i])
        assert list(np.cumsum(dv.astype(np.int64))) == g["docs"]
        tv, _ = varint_decode(out["tfs"][i])
        qv, _ = varint_decode(out["dlqs"][i])
        assert list(tv.astype(int)) == g["tf"]
        assert list(qv.astype(int)) == g["dlq"]
        assert out["n"][i] == len(g["docs"])
        assert out["max_tf"][i] == max(g["tf"])
        assert out["min_dlq"][i] == min(g["dlq"])
        assert out["sum_tf"][i] == sum(g["tf"])


def test_arrow_packer_chunked_emit_matches_single(monkeypatch):
    """int32-offset safety valve: a tiny per-batch byte cap must split the
    emit into many RecordBatches with byte-identical content."""
    import pyarrow as pa

    import lucene_solr_spark.indexer as ix

    fn = _capture_packer()
    rb, *_ = _synthetic_stream(seed=11)
    single = pa.Table.from_batches(list(fn(iter([rb])))).to_pydict()
    monkeypatch.setattr(ix, "_PACK_EMIT_CAP", 64)
    chunks = list(fn(iter([rb])))
    assert len(chunks) > 10
    assert pa.Table.from_batches(chunks).to_pydict() == single


def test_arrow_packer_empty_partition():
    import pyarrow as pa

    fn = _capture_packer()
    assert list(fn(iter([]))) == []
    empty = pa.RecordBatch.from_arrays(
        [
            pa.array([], "string"),
            pa.array([], "int64"),
            pa.array([], "int32"),
            pa.array([], "int32"),
            pa.array([], "int32"),
        ],
        names=["term", "doc_id", "tf", "dlq", "bucket"],
    )
    assert list(fn(iter([empty]))) == []
