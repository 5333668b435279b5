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
# per-RecordBatch byte cap for the packer's framed binary streams: Arrow
# BinaryArray offsets are int32, so one emitted batch must stay well under
# 2 GiB per stream (a production partition's framed payload can exceed it)
_PACK_EMIT_CAP = 1 << 30


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
    "dlq int, term string, tf int, positions array<int>"
)


def write_pages_with_ids(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    doc_base: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Materialize (doc_id, url, lang, text), url-sorted with stable dense
    ids, as a splittable parquet staging table — the disk-backed form of
    ids.assign_dense_ids (one range exchange + per-partition offsets; the
    written parquet replaces any in-memory persist so every later pass is
    a plain parallel columnar scan)."""
    p = partitions or max(pages.sparkSession.sparkContext.defaultParallelism * 2, 8)
    reg: list = []
    with_ids = assign_dense_ids(
        pages.select("url", "lang", "text"),
        "url",
        partitions=p,
        persist_exchange=True,
        cache_registry=reg,
    )
    if doc_base:
        with_ids = with_ids.withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        )
    with_ids.write.mode("overwrite").parquet(out_path)
    for h in reg:  # the written parquet is the durable form; drop the cache
        h.unpersist()
    return spark.read.parquet(out_path)


def _analyzer_gen(profile: str, quantize: bool, emit: str):
    """mapInArrow generator factory over (doc_id, url, lang, text) batches.

    emit="perdoc":  one row per (doc, term) — doc_id, dlq, term, tf,
                    sorted positions (zero-copy ListArray). The inverted
                    stream; analysis.analyze_flat_grouped is the DWPT
                    in-RAM inversion (TermsHashPerField#add).
    emit="docmeta": one row per doc — doc_id, url, lang, field_len,
                    norm_byte, dlq (PerField#invert norm computation).
    """
    import pyarrow as pa

    from .analysis import analyze_flat_grouped
    from .norms import LENGTH_TABLE, int_to_byte4

    perdoc_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("dlq", pa.int32()),
            ("term", pa.string()),
            ("tf", pa.int32()),
            ("positions", pa.list_(pa.int32())),
        ]
    )
    docmeta_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("url", pa.string()),
            ("lang", pa.string()),
            ("field_len", pa.int32()),
            ("norm_byte", pa.int32()),
            ("dlq", pa.int32()),
        ]
    )

    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("url", pa.string()),
            ("lang", pa.string()),
            ("field_len", pa.int32()),
            ("norm_byte", pa.int32()),
            ("dlq", pa.int32()),
            ("term", pa.string()),
            ("tf", pa.int32()),
            ("positions", pa.list_(pa.int32())),
        ]
    )

    def gen(batches):
        import numpy as np

        for rb in batches:
            idx = {n: i for i, n in enumerate(rb.schema.names)}
            texts = rb.column(idx["text"]).to_pandas()
            grp_row, grp_term, grp_tf, pos_vals, pos_off, field_len = (
                analyze_flat_grouped(texts, profile)
            )
            doc_ids = rb.column(idx["doc_id"]).to_numpy()
            nb = int_to_byte4(field_len)
            # quantize=False keeps exact lengths (norms "no loss" mode —
            # the ANSI-SQL-expressible twin used by the DuckDB oracle)
            dlq = LENGTH_TABLE[nb] if quantize else field_len
            if emit == "union":
                n = len(texts)
                g = len(grp_row)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(doc_ids, pa.int64()),
                        rb.column(idx["url"]),
                        rb.column(idx["lang"]),
                        pa.array(field_len.astype(np.int32)),
                        pa.array(nb.astype(np.int32)),
                        pa.array(dlq.astype(np.int32)),
                        pa.nulls(n, pa.string()),
                        pa.nulls(n, pa.int32()),
                        pa.nulls(n, pa.list_(pa.int32())),
                    ],
                    schema=union_schema,
                )
                if g:
                    positions = pa.ListArray.from_arrays(
                        pa.array(pos_off.astype(np.int32)),
                        pa.array(pos_vals.astype(np.int32)),
                    )
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(doc_ids[grp_row], pa.int64()),
                            pa.nulls(g, pa.string()),
                            pa.nulls(g, pa.string()),
                            pa.nulls(g, pa.int32()),
                            pa.nulls(g, pa.int32()),
                            pa.array(dlq[grp_row].astype(np.int32)),
                            pa.array(grp_term, pa.string()),
                            pa.array(grp_tf.astype(np.int32)),
                            positions,
                        ],
                        schema=union_schema,
                    )
            elif emit == "docmeta":
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(doc_ids, pa.int64()),
                        rb.column(idx["url"]),
                        rb.column(idx["lang"]),
                        pa.array(field_len.astype(np.int32)),
                        pa.array(nb.astype(np.int32)),
                        pa.array(dlq.astype(np.int32)),
                    ],
                    schema=docmeta_schema,
                )
            elif len(grp_row):
                positions = pa.ListArray.from_arrays(
                    pa.array(pos_off.astype(np.int32)),
                    pa.array(pos_vals.astype(np.int32)),
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(doc_ids[grp_row], pa.int64()),
                        pa.array(dlq[grp_row].astype(np.int32)),
                        pa.array(grp_term, pa.string()),
                        pa.array(grp_tf.astype(np.int32)),
                        positions,
                    ],
                    schema=perdoc_schema,
                )

    return gen


PERDOC_SCHEMA = "doc_id long, dlq int, term string, tf int, positions array<int>"
DOCMETA_SCHEMA = (
    "doc_id long, url string, lang string, field_len int, norm_byte int, dlq int"
)

# one row per (term, doc-range block) partial group: entry e of the group is
# (doc_id = blk*BLOCK_SPAN + doc_offs[e], tf = tfs[e], dlq = dlqs[e]) and its
# positions are the next tfs[e] values of the group-concatenated `poss`
GROUPED_SCHEMA = (
    "term string, blk long, doc_offs array<int>, tfs array<int>, "
    "dlqs array<int>, poss array<int>"
)


def _analyzer_grouped_gen(profile: str, quantize: bool, span: int):
    """mapInArrow generator: (doc_id, url, lang, text) batches -> ONE row
    per (term, doc-range block) seen in the batch, postings packed into
    arrays (GROUPED_SCHEMA).

    WHY (round-4 headline): the per-(term, doc) stream paid ~86 B of
    UnsafeRow/shuffle overhead per ~25 B posting through the build's one
    wide exchange — 133.8M rows at sf1.0, where exchange + JVM sort had
    become the binding constraint (BENCH.md decomposition). Grouping
    map-side by (term, blk) is the block-granularity combiner: on
    doc-contiguous batches it collapses the stream ~50x (measured on the
    fixture corpus at blk=4096), so the exchange moves packed array
    payloads instead of per-posting row overhead and the JVM sorts ~50x
    fewer rows. This is Lucene's own layering: the DWPT inversion already
    happens map-side (analyze_flat_grouped); this extends it to the
    postings-block granularity of Lucene84PostingsWriter BEFORE the
    shuffle instead of after.

    A (term, blk) group MAY span batches or input partitions (partial
    groups). The fused writer merges partials after the exchange
    (_explode_grouped) — map-side grouping is a pure combiner, never a
    correctness assumption. Collapse quality depends on batch
    doc-locality, which build_index guarantees with a doc_id range
    exchange ahead of the analyzer.

    The regroup runs in integer code space: the kernel returns per-batch
    term codes (analyze_flat_grouped(return_codes=True)), the (code, blk)
    key is one int64, and term strings materialize once per OUTPUT group.
    """
    import pyarrow as pa

    from .analysis import analyze_flat_grouped
    from .norms import LENGTH_TABLE, int_to_byte4

    schema = pa.schema(
        [
            ("term", pa.string()),
            ("blk", pa.int64()),
            ("doc_offs", pa.list_(pa.int32())),
            ("tfs", pa.list_(pa.int32())),
            ("dlqs", pa.list_(pa.int32())),
            ("poss", pa.list_(pa.int32())),
        ]
    )

    def gen(batches):
        import numpy as np

        for rb in batches:
            idx = {n: i for i, n in enumerate(rb.schema.names)}
            texts = rb.column(idx["text"]).to_pandas()
            grp_row, gcode, tdict, tf, pos_vals, pos_off, field_len = (
                analyze_flat_grouped(texts, profile, return_codes=True)
            )
            g = len(grp_row)
            if g == 0:
                continue
            doc_ids = rb.column(idx["doc_id"]).to_numpy()
            nb = int_to_byte4(field_len)
            dlq_row = LENGTH_TABLE[nb] if quantize else field_len
            doc = doc_ids[grp_row]
            blkv = doc // span
            # regroup (row, term) -> (term code, blk) on one int64 key;
            # secondary doc sort makes each group's entries doc-ascending
            ublk, blk_inv = np.unique(blkv, return_inverse=True)
            key = gcode * np.int64(len(ublk)) + blk_inv
            order = np.lexsort((doc, key))
            ko = key[order]
            boundary = np.empty(g, dtype=bool)
            boundary[0] = True
            np.not_equal(ko[1:], ko[:-1], out=boundary[1:])
            starts = np.flatnonzero(boundary)
            sizes = np.diff(np.append(starts, g))
            loff = pa.array(
                np.concatenate(([0], np.cumsum(sizes))).astype(np.int32)
            )
            # gather each entry's positions into the new entry order
            # (entry e's positions = pos_vals[pos_off[e] : pos_off[e+1]],
            # and len == tf[e] by construction)
            lens = tf[order]
            src = pos_off[:-1][order]
            total_p = int(lens.sum())
            out_excl = np.concatenate(([0], np.cumsum(lens)[:-1]))
            idxp = np.repeat(src - out_excl, lens) + np.arange(total_p)
            poff = pa.array(
                np.concatenate(
                    ([0], np.cumsum(np.add.reduceat(lens, starts)))
                ).astype(np.int32)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(tdict[gcode[order][starts]], pa.string()),
                    pa.array(ublk[blk_inv[order][starts]], pa.int64()),
                    pa.ListArray.from_arrays(
                        loff,
                        pa.array((doc - blkv * span).astype(np.int32)[order]),
                    ),
                    pa.ListArray.from_arrays(
                        loff, pa.array(tf[order].astype(np.int32))
                    ),
                    pa.ListArray.from_arrays(
                        loff,
                        pa.array(dlq_row[grp_row][order].astype(np.int32)),
                    ),
                    pa.ListArray.from_arrays(
                        poff, pa.array(pos_vals[idxp].astype(np.int32))
                    ),
                ],
                schema=schema,
            )

    return gen


def _explode_grouped(sub, span: int):
    """One sorted (term, blk) run of GROUPED rows (a single bucket's slice
    of a fused-writer partition) -> entry-level numpy arrays sorted by
    (term, doc_id). Merges partial (term, blk) groups that arrived from
    different map partitions/batches (the JVM sort makes equal (term, blk)
    keys adjacent but interleaves their entries in arbitrary partial
    order) and re-gathers each entry's positions.

    Returns (terms_dict, code_ent, doc, tf, dlq, pos_lens, pos_vals):
    terms_dict is the run's distinct-term dictionary (pa.StringArray),
    code_ent int indexes entries into it, pos_vals is the concatenated
    positions in entry order with per-entry lengths pos_lens (== tf)."""
    import numpy as np

    denc = sub["term"].chunk(0).dictionary_encode()
    codes_g = denc.indices.to_numpy()
    tdict = denc.dictionary
    blk_g = sub["blk"].to_numpy()
    dl = sub["doc_offs"].chunk(0)
    sizes = dl.value_lengths().to_numpy().astype(np.int64)
    offs_flat = dl.flatten().to_numpy().astype(np.int64)
    tf_flat = sub["tfs"].chunk(0).flatten().to_numpy()
    dlq_flat = sub["dlqs"].chunk(0).flatten().to_numpy()
    poss_flat = sub["poss"].chunk(0).flatten().to_numpy()
    n_grp = len(blk_g)
    ent_gid = np.repeat(np.arange(n_grp, dtype=np.int64), sizes)
    doc = blk_g[ent_gid] * span + offs_flat
    # run id over (term, blk) equality — partials of one group share a run
    run_b = np.empty(n_grp, dtype=bool)
    run_b[0] = True
    run_b[1:] = (codes_g[1:] != codes_g[:-1]) | (blk_g[1:] != blk_g[:-1])
    runid = np.cumsum(run_b) - 1
    order = np.lexsort((doc, runid[ent_gid]))
    # positions: groups (and entries within a group) are stored in order,
    # so the global exclusive cumsum of tf IS each entry's source offset
    csum = np.concatenate(([0], np.cumsum(tf_flat.astype(np.int64))))
    lens = tf_flat[order].astype(np.int64)
    src = csum[:-1][order]
    total_p = int(csum[-1])
    out_excl = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idxp = np.repeat(src - out_excl, lens) + np.arange(total_p)
    return (
        tdict,
        codes_g[ent_gid][order],
        doc[order],
        tf_flat[order],
        dlq_flat[order],
        lens,
        poss_flat[idxp],
    )


def analyzed_flat(
    pages: DataFrame,
    profile: str = "en",
    doc_base: int = 0,
    quantize: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Back-compat single-stream view (docmeta header rows with term NULL +
    perdoc rows) — tests and small corpora; build_index uses the two slim
    passes directly."""
    p = max(pages.sparkSession.sparkContext.defaultParallelism * 2, 8)
    with_ids = assign_dense_ids(
        pages.select("url", "lang", "text"),
        "url",
        partitions=p,
        persist_exchange=True,
        cache_registry=cache_registry,
    )
    if doc_base:
        with_ids = with_ids.withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        )
    meta = with_ids.mapInArrow(
        _analyzer_gen(profile, quantize, "docmeta"), DOCMETA_SCHEMA
    ).select(
        "doc_id", "url", "lang", "field_len", "norm_byte", "dlq",
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast("int").alias("tf"),
        F.lit(None).cast("array<int>").alias("positions"),
    )
    perdoc = with_ids.mapInArrow(
        _analyzer_gen(profile, quantize, "perdoc"), PERDOC_SCHEMA
    ).select(
        "doc_id",
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("int").alias("field_len"),
        F.lit(None).cast("int").alias("norm_byte"),
        "dlq", "term", "tf", "positions",
    )
    return meta.unionByName(perdoc)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    profile: str = "en",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: int = 0,
    packed: bool = True,
    doc_base: int = 0,
    quantize: bool = True,
    fused: bool = True,
    sort_by: list[tuple[str, str]] | None = None,
) -> dict:
    """Build the full index under `out_dir` (docmeta/, postings/, term_stats/,
    stats/). Returns collection stats. Idempotent overwrite per table.

    Materialization strategy (round-3 rework — the corpus text is NEVER
    shuffled or staged; round 2 range-exchanged the full corpus, wrote it
    to a `_pages_ids` staging table, and re-shuffled + re-sorted the full
    posting stream a second time for the packed table):

      1. dense ids: rank the URL COLUMN ONLY (parquet prunes the scan to
         one string column) via ids.assign_dense_ids' pinned range
         exchange, then map ids onto the corpus scan with a join —
         broadcast when the url table is small enough, shuffled hash/SMJ
         beyond that (at 10^12 docs ids are co-partitioned by url; the
         text side moves once, which round 2 paid anyway, PLUS a staging
         write it no longer pays).
      2. ONE fused analyzer pass: corpus scan -> broadcast id join ->
         analyzer (map-side inversion, no token shuffle) -> slim stream ->
         the build's ONE wide exchange ((bucket, salt) + (term, doc_id)
         sort) -> sorted postings write.
      3. `fused=True` (default): the task holding each sorted partition
         writes BOTH durable forms itself — the flat-postings part-file
         and the packed-blocks part-file — via pyarrow's C++ parquet
         writer, then the driver manifest-commits the file set from the
         collected per-partition lineage rows (`_fused_postings_writer` /
         `_commit_fused`; atomic-rename protocol, object-store caveat in
         the writer docstring). The flat stream is encoded exactly once
         and never re-read. `fused=False` keeps the committer-backed
         two-pass path: Spark writes flat postings, then packed blocks
         re-read the WRITTEN bucket files with an order-preserving
         whole-file scan (maxPartitionBytes raised so no file splits
         mid-(term, blk)-group) — still no second shuffle and no sort.
      4. docmeta aggregates field_len from the written postings
         (2-column scan); term_stats aggregates the ~50x-smaller packed
         block metadata.

    `sort_by=[("field", "asc"|"desc"), ...]` is the index sort
    (IndexWriterConfig#setIndexSort, lucene/core/.../index/IndexWriterConfig
    ≈L500 / LUCENE-6766): dense doc ids are assigned in (fields..., url)
    order instead of url order, so doc_id order IS the sort order and
    sorted top-k queries can early-terminate (operators/sorted_index.py —
    the TopFieldCollector-on-a-sorted-index analog). The sort fields must
    be `pages` columns; the sort spec is recorded in stats["index_sort"].
    Costs nothing extra at build time: it reuses the id-assignment range
    exchange with different sort keys.
    """
    import shutil
    import time

    from pyspark import StorageLevel

    phase_s: dict[str, float] = {}
    _t0 = time.perf_counter()

    def _phase(name: str) -> None:
        nonlocal _t0
        now = time.perf_counter()
        phase_s[name] = round(now - _t0, 3)
        _t0 = now

    reg: list = []
    p = max(spark.sparkContext.defaultParallelism * 2, 8)
    n_pages = pages.count()  # parquet footer metadata — no data scan
    # url is the document key (input contract); duplicate urls would fan
    # out the id join — require_unique fails loudly INSIDE the counting
    # pass (which also materializes the pinned exchange, the ids.py
    # determinism requirement) rather than paying a separate full agg job
    if sort_by:
        _sort_names = [n for n, _ in sort_by]
        _sort_order = [
            F.col(n).desc() if str(d).lower().startswith("d") else F.col(n).asc()
            for n, d in sort_by
        ] + [F.col("url").asc()]  # total order: url is the unique tiebreak
        _ids_in = pages.select("url", *_sort_names)
    else:
        _sort_order = None
        _ids_in = pages.select("url")
    # assign_dense_ids(persist_exchange=True) caches its single
    # (url, _pid, _rank) pass; ids_small is a pure projection of that
    # cache, so a second persist here would only double the cached bytes
    ids_small = assign_dense_ids(
        _ids_in,
        "url",
        partitions=p,
        persist_exchange=True,
        cache_registry=reg,
        require_unique=True,
        order_by=_sort_order,
    ).select("url", "doc_id")
    if doc_base:
        ids_small = ids_small.withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        )
    id_side = F.broadcast(ids_small) if n_pages <= 20_000_000 else ids_small
    with_ids = pages.select("url", "lang", "text").join(id_side, "url")
    _phase("ids")

    # ---- ONE analyzer pass, fused straight into the postings exchange -----
    # narrow pipeline: parquet scan -> analyzer (map-side DWPT inversion +
    # block-granularity combiner) -> slim grouped stream -> bucket exchange
    # -> sorted postings write. No intermediate staging table: the WRITTEN
    # postings are the durable form of the analyzer output, and the one
    # other consumer (docmeta's field_len = sum(tf) per doc) reads them
    # back as a 2-column columnar scan.
    #
    # Skew note: the remaining skew surface is the bucket exchange (a
    # bucket holding several Zipf head terms); salting splits each
    # bucket's stream by doc-range — block-aligned, so packed (term, blk)
    # groups land in one partition (SURVEY.md §5.3 item 6). salt=0
    # auto-sizes to keep every core busy.
    par = max(spark.sparkContext.defaultParallelism, 1)
    if salt == 0:
        salt = max(1, (2 * par) // max(num_buckets, 1))
    bucket_col = F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    commit_info = None
    if packed and fused:
        # Block-locality exchange: the map-side (term, blk) combiner in
        # _analyzer_grouped_gen collapses ~50x ONLY when an analyzer batch
        # sees doc-contiguous rows; the raw corpus scan order is
        # uncorrelated with url rank (doc_id), so range-partition the
        # corpus by doc_id first. Cost: one text shuffle (~corpus bytes,
        # 2.5 GB at sf1.0) + the range sampling pass; gain: the wide
        # postings exchange + JVM sort shrink ~50x (15 GB of UnsafeRow
        # traffic at sf1.0 -> array-packed group rows). At 100 TB the
        # trade improves further: text bytes grow linearly while the
        # postings exchange's per-row overhead was the superlinear-cost
        # term (sort is O(n log n) in ROWS).
        grouped = with_ids.repartitionByRange(p, "doc_id").mapInArrow(
            _analyzer_grouped_gen(profile, quantize, BLOCK_SPAN),
            GROUPED_SCHEMA,
        ).withColumn("bucket", bucket_col)
        g_keys = [F.col("bucket")]
        n_parts = num_buckets
        if salt > 1:
            g_keys.append(F.pmod(F.col("blk"), F.lit(salt)))
            n_parts = num_buckets * salt
        # THE one wide exchange of the build: (bucket, salt-of-blk)
        # partition + (term, blk) GROUP-level sort — ~50x fewer rows than
        # the per-posting sort this replaces. Partial groups of one
        # (term, blk) land adjacent; the writer merges them
        # (_explode_grouped) and writes both durable forms per bucket run.
        sorted_groups = grouped.repartition(n_parts, *g_keys).sortWithinPartitions(
            "bucket", "term", "blk"
        )
        for t in ("postings", "packed"):
            shutil.rmtree(os.path.join(out_dir, t), ignore_errors=True)
        lineage = [
            r.asDict()
            for r in sorted_groups.mapInArrow(
                _fused_postings_writer(out_dir, BLOCK_SPAN), _LINEAGE_SCHEMA
            ).collect()
        ]
        if all(r["n_rows"] == 0 for r in lineage):
            # degenerate empty stream: pyarrow wrote no files; fall back to
            # the empty-table write below so readers still find a
            # schema-bearing table
            fused = False
        else:
            commit_info = _commit_fused(out_dir, lineage)
            _phase("analyze_postings_packed")
    if not (packed and fused):
        # committer-backed two-pass path (object stores / packed=False):
        # per-(term, doc) rows through the exchange, exactly the round-3
        # layout. Small corpora can land on a handful of parquet row
        # groups; one cheap exchange restores analyzer fan-out.
        src = with_ids
        if pages.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
            src = src.repartition(p)
        perdoc = src.mapInArrow(
            _analyzer_gen(profile, quantize, "perdoc"), PERDOC_SCHEMA
        )
        # dlq (SmallFloat-decoded quantized doc length) is DENORMALIZED
        # into each posting row — the Spark analog of Lucene's doc-local
        # norms array read. (term, doc) aggregation already happened
        # MAP-SIDE inside the analyzer, so no token-level shuffle exists.
        postings = perdoc.withColumn("bucket", bucket_col)
        part_keys = [F.col("bucket")]
        n_parts = num_buckets
        if salt > 1:
            # exact integer division: `/` is double division and disagrees
            # with floor at doc_id >= 2^53 block boundaries (streaming
            # doc_base is (1<<20 + epoch) * 2^33), which would split a
            # (term, blk) group across salt partitions -> duplicate packed
            # rows
            part_keys.append(
                F.pmod(F.expr(f"doc_id DIV {BLOCK_SPAN}"), F.lit(salt))
            )
            n_parts = num_buckets * salt
        # (bucket, salt) partition + (term, doc_id) sort, written straight
        # to the postings table. `bucket` leads the sort so the child
        # ordering already satisfies the dynamic-partition write's required
        # ordering — otherwise FileFormatWriter inserts its own sort on the
        # partition columns, whose stability over the (term, doc_id) order
        # is not a contract the packed read-back may rely on. Parquet v2
        # data pages turn on DELTA_BINARY_PACKED for the sorted int
        # columns: doc_id alone is ~60% of flat-postings bytes as plain
        # int64, and v2 cuts the whole index ~29% (1.4G -> 988M at sf1.0)
        # with build time and query p50 unchanged (measured both ways,
        # BENCH.md). Per-write option — the user's session conf untouched.
        sorted_stream = postings.repartition(
            n_parts, *part_keys
        ).sortWithinPartitions("bucket", "term", "doc_id")
        if n_pages == 0:
            # partitionBy on 0 rows writes NO files (unreadable table);
            # an unpartitioned empty write keeps the schema — `bucket`
            # becomes a regular (empty) column, which readers filter the
            # same way they'd prune the partition directory
            sorted_stream.write.mode("overwrite").parquet(
                os.path.join(out_dir, "postings")
            )
        else:
            sorted_stream.write.mode("overwrite").option(
                "parquet.writer.version", "v2"
            ).option("parquet.block.size", str(8 << 20)).partitionBy(
                "bucket"
            ).parquet(os.path.join(out_dir, "postings"))
        _phase("analyze_postings")

    postings_w = spark.read.parquet(os.path.join(out_dir, "postings"))

    # ---- docmeta WITHOUT a second analysis: the BM25 norm length is the
    # emitted-token count, which is exactly sum(tf) over the doc's posting
    # rows (PerField#invert / discountOverlaps) — a 2-column columnar scan
    # of the just-written postings. Map-side partial agg shrinks the
    # shuffle to ~one row per doc; zero-token docs come back via the left
    # join on the ids frame; SmallFloat quantization re-applied on the
    # 1-row-per-doc frame (norms.py bit-exact kernels).
    from .udfs import norm_byte_udf, quantized_len_udf

    fl = postings_w.groupBy("doc_id").agg(F.sum("tf").alias("field_len"))
    docmeta = (
        with_ids.select("doc_id", "url", "lang")
        .join(fl, "doc_id", "left")
        .withColumn("field_len", F.coalesce("field_len", F.lit(0)).cast("int"))
        .withColumn("norm_byte", norm_byte_udf("field_len"))
        .withColumn(
            "dlq",
            quantized_len_udf("field_len") if quantize else F.col("field_len"),
        )
    )
    docmeta.write.mode("overwrite").option(
        "parquet.writer.version", "v2"
    ).parquet(os.path.join(out_dir, "docmeta"))
    docmeta_w = spark.read.parquet(os.path.join(out_dir, "docmeta"))
    if sort_by:
        # Lucene's setIndexSort requires the sort field to be a docvalues
        # field — the sort values STAY readable in the index. Persist them
        # as a slim (doc_id, sort fields) sidecar so sorted-index fast
        # paths (early termination, contiguous-run range counts) never
        # re-join the source corpus. Columnar 2-col scan, range-
        # partitioned by doc_id like docmeta.
        sortvals = (
            pages.select("url", *[n for n, _ in sort_by])
            .join(id_side, "url")
            .select("doc_id", *[n for n, _ in sort_by])
        )
        sortvals.write.mode("overwrite").option(
            "parquet.writer.version", "v2"
        ).parquet(os.path.join(out_dir, "sortvals"))
    _phase("docmeta")

    if packed and not fused:
        # Order-preserving whole-file read of the just-written postings:
        # every bucket file is one complete (bucket, salt) shuffle
        # partition sorted by (term, doc_id), and a (term, blk) group
        # lives in exactly one file — so as long as no FILE is split
        # mid-read, any bin-packing of whole files per task keeps groups
        # contiguous and packing stays a partition-local map: NO second
        # shuffle, NO sort, a 4-narrow-column columnar scan (positions
        # pruned). Splitting is governed by maxSplitBytes =
        # min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores)):
        # BOTH maxPartitionBytes and openCostInBytes must be raised, or a
        # small total still splits files at totalBytes/cores boundaries.
        # The huge open cost also stops bin-packing, so parallelism = one
        # task per written file = the build's n_parts. Restored after.
        _split_confs = (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
        saved = {}
        for c in _split_confs:
            try:
                saved[c] = spark.conf.get(c)
            except Exception:
                saved[c] = None
        try:
            for c in _split_confs:
                spark.conf.set(c, str(64 << 30))
            pack_src = spark.read.parquet(
                os.path.join(out_dir, "postings")
            ).select("term", "doc_id", "tf", "dlq", "bucket")
            if n_pages == 0:
                # schema-bearing empty packed table (partitionBy would
                # write no files; the packer maps 0 rows to 0 rows anyway)
                pack_src.limit(0).selectExpr(
                    "term", "cast(0 as long) blk", "cast(0 as int) n",
                    "cast(null as binary) docs", "cast(null as binary) tfs",
                    "cast(null as binary) dlqs", "cast(0 as int) max_tf",
                    "cast(0 as int) min_dlq", "cast(0 as long) sum_tf",
                    "bucket",
                ).write.mode("overwrite").parquet(
                    os.path.join(out_dir, "packed")
                )
            else:
                write_packed_postings(
                    pack_src, out_dir, num_buckets, salt=salt,
                    pre_partitioned=True,
                )
        finally:
            for c in _split_confs:
                if saved[c] is None:
                    spark.conf.unset(c)
                else:
                    spark.conf.set(c, saved[c])
        _phase("packed")

    # df/ttf are additive over packed blocks (n, sum_tf) — aggregating the
    # ~/4096x-smaller block metadata instead of the 40M posting rows
    ts_src = (
        spark.read.parquet(os.path.join(out_dir, "packed")).groupBy("term").agg(
            F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")
        )
        if packed
        else postings_w.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ttf")
        )
    )
    term_stats = ts_src.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    )
    ts_writer = term_stats.repartition(num_buckets, "bucket").write.mode(
        "overwrite"
    ).option("parquet.writer.version", "v2")
    if n_pages == 0:  # partitionBy writes no files on 0 rows (see postings)
        ts_writer.parquet(os.path.join(out_dir, "term_stats"))
    else:
        ts_writer.partitionBy("bucket").parquet(
            os.path.join(out_dir, "term_stats")
        )
    _phase("term_stats")

    agg = docmeta_w.agg(
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
    if sort_by:
        stats["index_sort"] = [[n, d] for n, d in sort_by]
    # stats is ONE row: write it driver-side in the same part-file layout
    # read_index globs (a single-row createDataFrame().write.json() costs a
    # full Spark job — measured ~5s of pure scheduling/committer overhead)
    import json as _json

    stats_dir = os.path.join(out_dir, "stats")
    shutil.rmtree(stats_dir, ignore_errors=True)
    os.makedirs(stats_dir, exist_ok=True)
    with open(os.path.join(stats_dir, "part-00000.json"), "w") as f:
        f.write(_json.dumps(stats) + "\n")
    for h in reg:  # all tables are written: drop the pinned exchanges
        h.unpersist()
    _phase("stats")
    # per-phase wall seconds: build metrics for lineage/observability,
    # written driver-side next to the stats table (not part of the stats
    # contract read_index consumers rely on)
    with open(os.path.join(out_dir, "build_metrics.json"), "w") as f:
        _json.dump({"phase_s": phase_s, "fused_commit": commit_info}, f)
    stats["phase_s"] = phase_s
    return stats


PACKED_SCHEMA = (
    "term string, blk long, n int, docs binary, tfs binary, dlqs binary, "
    "max_tf int, min_dlq int, sum_tf long"
)


def write_packed_postings(
    perdoc: DataFrame,
    out_dir: str,
    num_buckets: int,
    salt: int = 0,
    pre_partitioned: bool = False,
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

    Execution: ONE exchange (repartition by term bucket + sort by
    (term, doc_id)), then a partition-level vectorized packer — the whole
    partition is varint-encoded in a handful of numpy passes and the
    per-block framed blobs are assembled as raw Arrow BinaryArray buffers
    (offsets + one contiguous values buffer), so NO per-group Python
    object is ever created and no pandas round-trip happens
    (FreqProxTermsWriter#flush: sort terms once, walk postings once).
    The scatter trick: the payload bytes of consecutive (term, blk)
    groups are already adjacent in the partition-wide varint buffer, so
    the framed stream is the payload buffer with each group's varint(n)
    header spliced in — two `np.repeat` index computations, O(bytes).
    """
    span = BLOCK_SPAN

    def pack_partition(batches):
        import pyarrow as pa

        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        yield from _pack_table_batches(tbl, span)

    src = perdoc
    if "bucket" not in src.columns:
        src = src.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        )
    if pre_partitioned:
        # caller guarantees (bucket, salted doc-range) partitioning with
        # (term, doc_id) order — the build passes its one persisted
        # exchange here, so packing is a pure partition-local map (the
        # round-2 path re-shuffled + re-sorted the full stream)
        staged = src.select("term", "doc_id", "tf", "dlq", "bucket")
    else:
        part_keys = [F.col("bucket")]
        n_parts = num_buckets
        if salt > 1:
            # skew split by doc-range: a (term, blk) group maps to ONE
            # partition (blk determines the salt key), so packing stays
            # partition-local. DIV (exact integer division) — double `/`
            # rounds wrong past 2^53.
            part_keys.append(
                F.pmod(F.expr(f"doc_id DIV {BLOCK_SPAN}"), F.lit(salt))
            )
            n_parts = num_buckets * salt
        staged = (
            src.select("term", "doc_id", "tf", "dlq", "bucket")
            .repartition(n_parts, *part_keys)
            .sortWithinPartitions("term", "doc_id")
        )
    packed = staged.mapInArrow(pack_partition, PACKED_SCHEMA + ", bucket int")
    # small row groups = the terms-dict seek granularity (see
    # _PACKED_ROW_GROUP): term-sorted files prune to 1-2 RGs per query term
    packed.write.mode("overwrite").option(
        "parquet.writer.version", "v2"
    ).option("parquet.block.size", str(4 << 20)).partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, "packed"))


def _pack_table_batches(tbl, span: int):
    """Core packer: one sorted (term, doc_id) partition as a pa.Table with
    columns (term, doc_id, tf, dlq, bucket) -> RecordBatches of packed
    blocks (PACKED_SCHEMA + bucket). Used by the two-pass path
    (write_packed_postings); the fused writer calls the shared array-level
    kernel (_pack_sorted_arrays) directly — it already holds the exploded
    arrays. The whole partition is varint-encoded in a handful of numpy
    passes, no per-group Python objects (see write_packed_postings
    docstring)."""
    import numpy as np

    if tbl.num_rows == 0:
        return
    docs = tbl["doc_id"].to_numpy()
    tfs = tbl["tf"].to_numpy().astype(np.int64, copy=False)
    dlqs = tbl["dlq"].to_numpy().astype(np.int64, copy=False)
    buckets = tbl["bucket"].to_numpy()
    dict_enc = tbl["term"].chunk(0).dictionary_encode()
    codes = dict_enc.indices.to_numpy()
    terms_dict = dict_enc.dictionary
    yield from _pack_sorted_arrays(
        terms_dict, codes, docs, tfs, dlqs, buckets, span
    )


def _pack_sorted_arrays(terms_dict, codes, docs, tfs, dlqs, buckets, span: int):
    """Array-level packer kernel: entry arrays sorted by (term, doc_id)
    (term given as codes into terms_dict) -> PACKED_SCHEMA + bucket
    RecordBatches. See _pack_table_batches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .codec import varint_encode_raw

    if len(docs) == 0:
        return
    blk = docs // span
    # group boundaries on the (term, blk) sorted stream
    boundary = np.empty(len(docs), dtype=bool)
    boundary[0] = True
    np.not_equal(codes[1:], codes[:-1], out=boundary[1:])
    boundary[1:] |= blk[1:] != blk[:-1]
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.append(starts, len(docs)))
    # delta-encode doc ids with a reset at every group start
    deltas = np.empty_like(docs)
    deltas[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    deltas[starts] = docs[starts]
    # one vectorized varint pass over the whole partition per stream,
    # plus one over the per-group counts (the frame headers)
    fbuf, flen = varint_encode_raw(counts.astype(np.uint64))
    fcum = np.cumsum(flen)  # frame bytes through group g, inclusive

    def framed(buf: np.ndarray, blen: np.ndarray):
        """Splice per-group varint(n) headers into the contiguous
        payload buffer -> (values uint8[], group offsets int64[G+1])."""
        plen = np.add.reduceat(blen, starts)
        goff = np.empty(len(starts) + 1, dtype=np.int64)
        goff[0] = 0
        np.cumsum(flen + plen, out=goff[1:])
        out = np.empty(int(goff[-1]), dtype=np.uint8)
        # frame header bytes: group g's header starts at goff[g]
        foff = fcum - flen  # frame bytes before group g
        out[np.repeat(goff[:-1] - foff, flen) + np.arange(len(fbuf))] = fbuf
        # payload bytes: shift each byte right by the headers at/before
        # its group (payloads are contiguous in group order already)
        out[np.repeat(fcum, plen) + np.arange(len(buf))] = buf
        return out, goff

    d_out, d_off = framed(*varint_encode_raw(deltas.astype(np.uint64)))
    t_out, t_off = framed(*varint_encode_raw(tfs.astype(np.uint64)))
    q_out, q_off = framed(*varint_encode_raw(dlqs.astype(np.uint64)))
    max_tf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    min_dlq = np.minimum.reduceat(dlqs, starts).astype(np.int32)
    sum_tf = np.add.reduceat(tfs, starts)
    term_col = pc.take(terms_dict, pa.array(codes[starts]))
    if term_col.type != pa.string():  # e.g. useLargeVarTypes sessions
        term_col = term_col.cast(pa.string())
    blk_col = blk[starts]
    bucket_col = buckets[starts].astype(np.int32, copy=False)

    def bin_col(out: np.ndarray, goff: np.ndarray, g0: int, g1: int):
        off32 = (goff[g0 : g1 + 1] - goff[g0]).astype(np.int32)
        vals = np.ascontiguousarray(out[goff[g0] : goff[g1]])
        return pa.Array.from_buffers(
            pa.binary(), g1 - g0,
            [None, pa.py_buffer(off32), pa.py_buffer(vals)],
        )

    # chunk the emit so every BinaryArray stays under int32 offsets
    # (a partition's framed stream can pass 2 GiB at production scale)
    ngroups = len(starts)
    cap = _PACK_EMIT_CAP
    g0 = 0
    while g0 < ngroups:
        g1 = ngroups
        for off in (d_off, t_off, q_off):
            if off[g1] - off[g0] > cap:
                g1 = min(
                    g1, int(np.searchsorted(off, off[g0] + cap) - 1)
                )
        g1 = max(g1, g0 + 1)
        yield pa.RecordBatch.from_arrays(
            [
                term_col.slice(g0, g1 - g0),
                pa.array(blk_col[g0:g1], type=pa.int64()),
                pa.array(counts[g0:g1].astype(np.int32), type=pa.int32()),
                bin_col(d_out, d_off, g0, g1),
                bin_col(t_out, t_off, g0, g1),
                bin_col(q_out, q_off, g0, g1),
                pa.array(max_tf[g0:g1], type=pa.int32()),
                pa.array(min_dlq[g0:g1], type=pa.int32()),
                pa.array(sum_tf[g0:g1], type=pa.int64()),
                pa.array(bucket_col[g0:g1], type=pa.int32()),
            ],
            names=[
                "term", "blk", "n", "docs", "tfs", "dlqs",
                "max_tf", "min_dlq", "sum_tf", "bucket",
            ],
        )
        g0 = g1


_LINEAGE_SCHEMA = (
    "part_id int, bucket int, n_rows long, n_groups long, flat_bytes long, "
    "packed_bytes long, flat_file string, packed_file string, secs double"
)

# parquet column encodings for the fused pyarrow writer — the same layout
# Spark's v2 writer picks (measured: DELTA_BINARY_PACKED on the sorted int
# columns is the 29% index-size win documented in BENCH.md); `term` keeps
# dictionary encoding (few distinct values per sorted run).
_FLAT_ENCODINGS = {
    "doc_id": "DELTA_BINARY_PACKED",
    "tf": "DELTA_BINARY_PACKED",
    "dlq": "DELTA_BINARY_PACKED",
    "positions.list.element": "DELTA_BINARY_PACKED",
}
_PACKED_ENCODINGS = {
    "blk": "DELTA_BINARY_PACKED",
    "n": "DELTA_BINARY_PACKED",
    "max_tf": "DELTA_BINARY_PACKED",
    "min_dlq": "DELTA_BINARY_PACKED",
    "sum_tf": "DELTA_BINARY_PACKED",
}

# Row-group sizing for the fused writer (Lucene analog: the terms-dict
# block/skip structure INSIDE a segment file). Both tables are sorted by
# term within a part-file; a single jumbo row group (pyarrow's default
# lands the whole file in one) makes every `term IN (...)` scan decode
# the file's ENTIRE binary/positions columns because the reader's only
# pruning unit is the row group. Small term-sorted row groups turn the
# parquet footer's per-RG min/max into a terms-dict seek: a query term
# touches the 1-2 row groups whose [min_term, max_term] straddle it and
# skips the rest — measured 3-6x on WAND/boolean latency at sf1.0, the
# dominant per-query cost at 10^12 docs where a bucket file is ~65 GB.
# write_page_index adds parquet ColumnIndexes so Spark's reader
# (parquet-mr >= 1.12) also prunes at PAGE granularity within a group.
_FLAT_ROW_GROUP = 131_072
_PACKED_ROW_GROUP = 8_192


def _fused_postings_writer(out_dir: str, span: int):
    """mapInArrow generator: consume ONE sorted (bucket | term, blk)
    partition of GROUPED_SCHEMA rows (block-granularity partial groups
    from _analyzer_grouped_gen) and write BOTH of its durable forms — the
    flat-postings part-file and the packed-blocks part-file — directly
    with pyarrow's C++ parquet writer, emitting a single per-partition
    lineage row. Partial (term, blk) groups are merged and exploded to
    entry level in numpy (_explode_grouped); the flat file's row order
    and byte layout are IDENTICAL to the two-pass per-(term, doc) path
    (pinned by tests/test_fused_build.py's table-equality oracle).

    Why: the two-pass build paid (a) a JVM parquet encode of the full flat
    stream, then (b) a second job that re-read + re-decoded that table
    just to pack it. Fusing both writes into the one pass that already
    holds the sorted stream removes the entire re-read and one full
    columnar encode/decode cycle of the build's biggest table. The
    round-4 grouped input additionally moves the explode from the JVM
    exchange (where each posting was an 86-B-overhead UnsafeRow) to a
    numpy repeat inside this writer.

    The exchange hash-partitions on (bucket, salt), so one task partition
    can hold SEVERAL buckets (hash collisions are expected, not an
    error); the partition is sorted bucket-first, so each bucket is one
    contiguous run — the writer slices per run and emits one flat/packed
    file pair + one lineage row per (partition, bucket), never assuming
    a single bucket per task.

    Commit protocol (Iceberg-shaped, SURVEY.md §4.1 segments_N analog):
    files are written to dot-prefixed temp names (invisible to Spark's
    reader) and atomically `os.replace`d to DETERMINISTIC final names
    (`part-{partitionId:05d}` inside `bucket=N/`, unique because a
    partition writes at most one file per bucket). A retried/speculative
    attempt re-derives
    byte-identical content from the same sorted partition, so any winner
    of the rename race is correct. The driver then reconciles the
    directory tree against the collected lineage rows (`_commit_fused`):
    leftover temp files from dead attempts are removed, missing files
    fail the build loudly, and the file list is committed as
    `_manifest.json` (underscore-prefixed — ignored by Spark's reader).
    NOTE: atomic rename is a POSIX/HDFS property; on object stores run
    `build_index(..., fused=False)` (the committer-backed two-pass path).

    Memory: one partition's batches are held (the packer is
    partition-level already); size n_parts so a partition fits a worker,
    exactly as the two-pass packer required.
    """

    def run(batches):
        import time as _time
        import uuid

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        t0 = _time.perf_counter()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        acc = []
        n_rows = 0
        for rb in batches:
            if rb.num_rows:
                acc.append(rb)
                n_rows += rb.num_rows

        def lineage(bucket, b_rows, n_groups, fb, pb, ff, pf):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([pid], pa.int32()),
                    pa.array([bucket], pa.int32()),
                    pa.array([b_rows], pa.int64()),
                    pa.array([n_groups], pa.int64()),
                    pa.array([fb], pa.int64()),
                    pa.array([pb], pa.int64()),
                    pa.array([ff], pa.string()),
                    pa.array([pf], pa.string()),
                    pa.array(
                        [round(_time.perf_counter() - t0, 3)], pa.float64()
                    ),
                ],
                names=[
                    "part_id", "bucket", "n_rows", "n_groups", "flat_bytes",
                    "packed_bytes", "flat_file", "packed_file", "secs",
                ],
            )

        if n_rows == 0:
            yield lineage(None, 0, 0, 0, 0, None, None)
            return

        tbl = pa.Table.from_batches(acc).combine_chunks()
        del acc

        def write_one(table_dir, bucket, out_tbl, encodings, row_group):
            d = os.path.join(out_dir, table_dir, f"bucket={bucket}")
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"part-{pid:05d}.snappy.parquet")
            tmp = os.path.join(d, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
            pq.write_table(
                out_tbl, tmp, compression="snappy", version="2.6",
                data_page_version="2.0", use_dictionary=["term"],
                column_encoding=encodings,
                row_group_size=row_group, write_page_index=True,
            )
            os.replace(tmp, final)
            return final, os.path.getsize(final)

        # one contiguous run per bucket (partition is sorted bucket-first)
        bkt = tbl["bucket"].to_numpy()
        run_starts = np.flatnonzero(np.r_[True, bkt[1:] != bkt[:-1]])
        run_ends = np.r_[run_starts[1:], len(bkt)]
        for s, e in zip(run_starts, run_ends):
            bucket = int(bkt[s])
            sub = tbl.slice(int(s), int(e - s))
            tdict, code_e, doc_e, tf_e, dlq_e, plen_e, pos_e = (
                _explode_grouped(sub, span)
            )
            n_ent = len(doc_e)
            # flat batches, chunked so every ListArray/BinaryArray stays
            # under int32 offsets (same cap discipline as the packer)
            p_off = np.concatenate(([0], np.cumsum(plen_e)))
            flat_batches = []
            e0 = 0
            while e0 < n_ent:
                e1 = n_ent
                if p_off[e1] - p_off[e0] > _PACK_EMIT_CAP // 4:
                    e1 = max(
                        e0 + 1,
                        int(
                            np.searchsorted(
                                p_off, p_off[e0] + _PACK_EMIT_CAP // 4
                            )
                            - 1
                        ),
                    )
                positions = pa.ListArray.from_arrays(
                    pa.array((p_off[e0 : e1 + 1] - p_off[e0]).astype("int32")),
                    pa.array(pos_e[int(p_off[e0]) : int(p_off[e1])]),
                )
                flat_batches.append(
                    pa.RecordBatch.from_arrays(
                        [
                            pa.array(doc_e[e0:e1], pa.int64()),
                            pa.array(dlq_e[e0:e1].astype("int32")),
                            pc.take(tdict, pa.array(code_e[e0:e1])),
                            pa.array(tf_e[e0:e1].astype("int32")),
                            positions,
                        ],
                        names=["doc_id", "dlq", "term", "tf", "positions"],
                    )
                )
                e0 = e1
            flat_file, flat_bytes = write_one(
                "postings", bucket,
                pa.Table.from_batches(
                    flat_batches,
                    schema=pa.schema(
                        [
                            ("doc_id", pa.int64()),
                            ("dlq", pa.int32()),
                            ("term", pa.string()),
                            ("tf", pa.int32()),
                            ("positions", pa.list_(pa.int32())),
                        ]
                    ),
                ),
                _FLAT_ENCODINGS,
                _FLAT_ROW_GROUP,
            )
            pk = pa.Table.from_batches(
                list(
                    _pack_sorted_arrays(
                        tdict,
                        code_e,
                        doc_e,
                        tf_e.astype(np.int64),
                        dlq_e.astype(np.int64),
                        np.full(n_ent, bucket, dtype=np.int32),
                        span,
                    )
                )
            ).drop_columns(["bucket"])
            packed_file, packed_bytes = write_one(
                "packed", bucket, pk, _PACKED_ENCODINGS,
                _PACKED_ROW_GROUP,
            )
            yield lineage(
                bucket, n_ent, pk.num_rows, flat_bytes, packed_bytes,
                flat_file, packed_file,
            )

    return run


def _commit_fused(out_dir: str, lineage_rows: list) -> dict:
    """Reconcile postings/ + packed/ trees against the fused job's lineage
    rows, delete dead-attempt temp files, and write `_manifest.json` per
    table (file list + per-partition rows). Raises if a manifest file is
    missing — the fused write is only committed once this passes."""
    import json

    expected = {"postings": set(), "packed": set()}
    for r in lineage_rows:
        if r["flat_file"]:
            expected["postings"].add(os.path.abspath(r["flat_file"]))
        if r["packed_file"]:
            expected["packed"].add(os.path.abspath(r["packed_file"]))
    for table, exp in expected.items():
        troot = os.path.join(out_dir, table)
        found = set()
        for dirpath, _dirs, files in os.walk(troot):
            for fn in files:
                p = os.path.abspath(os.path.join(dirpath, fn))
                if fn.endswith(".tmp") or fn.startswith("."):
                    os.remove(p)  # dead task attempt — never committed
                elif fn.startswith("_"):
                    continue
                else:
                    found.add(p)
        missing = exp - found
        if missing:
            raise RuntimeError(
                f"fused build commit failed: {table} is missing "
                f"{sorted(missing)[:3]} (+{max(0, len(missing) - 3)} more)"
            )
        orphans = found - exp
        for p in orphans:  # files no lineage row claims: remove pre-commit
            os.remove(p)
        with open(os.path.join(troot, "_manifest.json"), "w") as f:
            json.dump(
                {
                    "files": sorted(os.path.relpath(p, troot) for p in exp),
                    "partitions": [
                        {
                            "part_id": r["part_id"],
                            "bucket": r["bucket"],
                            "n_rows": r["n_rows"],
                            "n_groups": r["n_groups"],
                            "bytes": r[
                                "flat_bytes"
                                if table == "postings"
                                else "packed_bytes"
                            ],
                            "secs": r["secs"],
                        }
                        for r in lineage_rows
                    ],
                },
                f,
            )
    return {
        "n_partitions": len(lineage_rows),
        "n_rows": sum(r["n_rows"] for r in lineage_rows),
        "flat_bytes": sum(r["flat_bytes"] for r in lineage_rows),
        "packed_bytes": sum(r["packed_bytes"] for r in lineage_rows),
    }


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
        "path": index_dir,
    }
    packed_dir = os.path.join(index_dir, "packed")
    if os.path.isdir(packed_dir):
        out["packed"] = spark.read.parquet(packed_dir)
    sortvals_dir = os.path.join(index_dir, "sortvals")
    if os.path.isdir(sortvals_dir):
        out["sortvals"] = spark.read.parquet(sortvals_dir)
    return out


def bucket_of(term: str, num_buckets: int, spark: SparkSession) -> int:
    """Driver-side bucket id for a term (matches F.xxhash64 pmod)."""
    row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(term)), F.lit(num_buckets)).cast("int").alias("b")
    ).collect()[0]
    return int(row["b"])
