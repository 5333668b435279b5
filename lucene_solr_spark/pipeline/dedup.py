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


def shingle_grams(
    docs: DataFrame, n: int = 3, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, gram): distinct word n-gram shingles per doc, built with a
    JVM-side array transform over split(text) — a narrow O(tokens) map, no
    join, no shuffle (replaces the old positional 3-way self-join, which
    cost two exchanges per extra gram word)."""
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than n tokens must produce an empty array explicitly
    grams = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
        f" ELSE array() END"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .distinct()
    )


def ngram_jaccard_vs_doc(
    docs: DataFrame, ref_doc: int, n: int = 3, k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """n-gram (shingle) Jaccard similarity of every doc vs a reference doc.
    Shingles are a vectorized array transform (shingle_grams); the only
    shuffles are the broadcast semi-join on the ref doc's grams and the
    per-doc count aggregation."""
    shingles = shingle_grams(docs, n, text_col)
    # persist the ref gram set: the count action and the broadcast join
    # below would otherwise each recompute the shingle transform on the
    # ref doc's partition (round-4 advice-pattern fix, as pack_shards)
    ref = (
        shingles.filter(F.col("doc_id") == ref_doc).select("gram").persist()
    )
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


# ---------------------------------------------------------------------------
# Full LSH dedup: b×r banding -> candidate pairs -> exact-Jaccard verify ->
# connected components -> cluster keep-one. The part that actually dedups:
# single-band bucket COUNTS (minhash_lsh_buckets above) only locate
# collisions; these stages resolve them into clusters at bucket-join cost,
# never all-pairs.
# ---------------------------------------------------------------------------

def minhash_over(keys: DataFrame, num_hashes: int, key_col: str = "gram") -> DataFrame:
    """Generic MinHash: (doc_id, key) -> (doc_id, mh_0..mh_{n-1}) with
    h_i(doc) = min over keys of md5(key || '#i'). One groupBy(doc_id) — the
    signature build is a narrow map + single agg regardless of num_hashes."""
    aggs = [
        F.min(F.md5(F.concat(F.col(key_col), F.lit(f"#{i}")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return keys.groupBy("doc_id").agg(*aggs)


def _capped_bucket_pairs(
    keys: DataFrame, bucket_cols: list[str], max_bucket: int
) -> DataFrame:
    """Within-bucket pair generation with a hot-bucket guard.

    The naive within-bucket self-join is quadratic in bucket size; real web
    corpora have degenerate buckets (boilerplate / near-empty pages) where
    one 10^6-doc bucket would emit 5x10^11 pairs and kill the stage. Buckets
    with <= max_bucket members get the full all-pairs join; oversized
    buckets degrade to STAR pairs (every member linked to the bucket's
    minimum doc_id) — O(n) pairs per bucket, which still preserves
    connected-component connectivity for true-duplicate buckets while the
    downstream exact verify rejects coincidental collisions. `keys` must
    have a doc_id column plus `bucket_cols`."""
    sz = keys.groupBy(*bucket_cols).agg(
        F.count("*").alias("_bn"), F.min("doc_id").alias("_bmin")
    )
    keyed = keys.join(sz, bucket_cols)
    small = keyed.filter(F.col("_bn") <= max_bucket).drop("_bn", "_bmin")
    a, b = small.alias("a"), small.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    all_pairs = a.join(b, cond).select(
        F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
    )
    star = (
        keyed.filter(F.col("_bn") > max_bucket)
        .filter(F.col("doc_id") != F.col("_bmin"))
        .select(F.col("_bmin").alias("a"), F.col("doc_id").alias("b"))
    )
    return all_pairs.unionByName(star).distinct()


def lsh_bucket_stats(
    sig: DataFrame, bands: int, rows_per_band: int, max_bucket: int = 5000
) -> DataFrame:
    """Observability for the hot-bucket guard: one row per OVERSIZED
    (band, band_key) bucket with its member count — the `dropped_buckets`
    metric a production dedup job should alert on."""
    keys = _band_keys(sig, bands, rows_per_band)
    return (
        keys.groupBy("band", "band_key")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
        .orderBy(F.desc("n_docs"), "band", "band_key")
    )


def _band_keys(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    keys = band_rows[0]
    for br in band_rows[1:]:
        keys = keys.unionByName(br)
    return keys


def lsh_candidate_pairs(
    sig: DataFrame, bands: int, rows_per_band: int, max_bucket: int = 5000
) -> DataFrame:
    """b×r banding -> distinct candidate (a, b) pairs, a < b.

    Shuffle shape at 10^12 docs: one explode to (doc, band, band_key) rows
    (b per doc), one self-join keyed on (band, band_key) — the join only
    materializes pairs WITHIN buckets (never all-pairs), and the final
    distinct dedups pairs colliding in several bands. Buckets larger than
    `max_bucket` degrade to star pairs (see _capped_bucket_pairs) instead
    of a quadratic blowup; `lsh_bucket_stats` surfaces which buckets were
    capped."""
    keys = _band_keys(sig, bands, rows_per_band)
    return _capped_bucket_pairs(keys, ["band", "band_key"], max_bucket)


def verify_jaccard(
    shingles: DataFrame, pairs: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs only -> (a, b, jaccard)
    with jaccard >= threshold. Joins are keyed on gram (bucketable); the
    candidate set — not the corpus — bounds the pair-side volume."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("a"), "gram")
    sb = shingles.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "gram"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 5
) -> DataFrame:
    """(a, b) edges -> (doc_id, cluster) where cluster = min doc_id in the
    connected component. Iterative min-label propagation (the Pregel shape:
    each round one join + one min-agg, converging in O(log diameter) rounds
    for typical dup chains; `max_iter` bounds pathological paths). The
    per-round convergence check is a count() — one scalar to the driver.

    persist/unpersist bounds recompute per round, but the LOGICAL plan still
    deepens each iteration; at 10^9 edges a 25-round worst case would blow
    analyzer/optimizer time and executor deserialization. localCheckpoint()
    every `checkpoint_every` rounds truncates the lineage to the
    materialized blocks (at true cluster scale use reliable checkpoint() to
    HDFS, or GraphFrames' connectedComponents which implements the same
    large-star/small-star contraction with built-in checkpointing)."""
    # normalize column ORDER first: union() is positional, and upstream
    # using-column joins (e.g. left_semi on "b") reorder columns to
    # ['b','a'] — without this select the swapped branch would align
    # positionally with the original and the symmetrization silently
    # collapses (found by the dbscan differential test)
    edges = edges.select("a", "b")
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
    )
    for it in range(max_iter):
        labels = labels.persist()
        prop = (
            sym.join(labels, sym["a"] == labels["doc_id"])
            .select(F.col("b").alias("doc_id"), "cluster")
        )
        new = (
            labels.select("doc_id", "cluster")
            .unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster").alias("cluster"))
        )
        if (it + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        else:
            new = new.persist()
        changed = (
            new.join(labels.withColumnRenamed("cluster", "old"), "doc_id")
            .filter(F.col("cluster") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    return labels


def lsh_dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup clustering: shingle -> MinHash(b×r) -> banded
    candidate pairs -> exact-Jaccard verify -> connected components.
    Returns (doc_id, cluster); keep-one policy = keep doc_id == cluster
    (the minimum id in each component)."""
    shingles = shingle_grams(docs, n, text_col)
    sig = minhash_over(shingles, bands * rows_per_band)
    pairs = lsh_candidate_pairs(sig, bands, rows_per_band)
    verified = verify_jaccard(shingles, pairs, threshold)
    return connected_components(verified.select("a", "b"))


def winnowing_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    the MOSS algorithm): hash every k-gram, slide a w-gram window, keep
    each window's MINIMUM hash; the distinct selected minima are the doc's
    fingerprint set. Guarantees: any shared substring of length >= k+w-1
    yields at least one shared fingerprint (the winnowing theorem), while
    storing ~2/(w+1) of all k-gram hashes.

    Pure window functions over the positional k-gram stream: one
    min-over-following-rows window + distinct — the same expression is
    restated in the SQL oracle. Hash = first 60 bits of md5 (portable
    across engines). Returns (doc_id, fp)."""
    from pyspark.sql import Window

    grams = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {k} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k})))"
        f" ELSE array() END"
    )
    g = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "gram")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # the window min is only a VALID window at starts 0..m-w; later starts
    # see a truncated window — drop them via the max start position
    counts = g.groupBy("doc_id").agg(F.max("pos").alias("_maxpos"))
    mins = (
        g.withColumn("fp", F.min("h").over(win))
        .join(counts, "doc_id")
        .filter(F.col("pos") <= F.col("_maxpos") - (w - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    return mins


def winnowing_shared_with(
    docs: DataFrame, ref_doc: int, k: int = 3, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Docs sharing winnowing fingerprints with a reference doc ->
    (doc_id, shared) — the MOSS plagiarism/near-dup detector shape.
    At corpus scale the pair generation is a fingerprint equi-join
    (bucketable), never all-pairs."""
    fps = winnowing_fingerprints(docs, k, w, text_col, id_col)
    ref = fps.filter(F.col("doc_id") == ref_doc).select("fp")
    return (
        fps.filter(F.col("doc_id") != ref_doc)
        .join(F.broadcast(ref), "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared"))
        .orderBy(F.desc("shared"), F.asc("doc_id"))
    )


def simhash64(tok: DataFrame) -> DataFrame:
    """64-bit SimHash per doc (bit b from nibble b//4 of md5(term), bit
    position b%4), tf-weighted. 64 bits keep the collision rate meaningful
    at 10^9+ docs — the 16-bit variant above exists only for the compact
    SQL-parity demo. tok: (doc_id, term)."""
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cols = []
    for b in range(64):
        nib = F.conv(
            F.substring(F.md5(F.col("term")), b // 4 + 1, 1), 16, 10
        ).cast("int")
        bit = F.shiftright(nib, b % 4) % 2
        contrib = F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))
        cols.append(F.sum(contrib).alias(f"_b{b}"))
    agg = tf.groupBy("doc_id").agg(*cols)
    # bit 63 is the two's-complement sign: encoded as LONG_MIN instead of a
    # 1<<63 shift (which overflows in ANSI SQL) — identical bit pattern
    sim = F.when(F.col("_b63") > 0, F.lit(-(1 << 63))).otherwise(F.lit(0))
    for b in range(63):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        sim = sim + F.shiftleft(bit, b)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_manku_candidates(
    sim: DataFrame,
    max_hamming: int = 3,
    blocks: int = 6,
    max_bucket: int = 5000,
) -> DataFrame:
    """Near-dup candidates via the Manku et al. 2007 multi-table block
    scheme ("Detecting Near-Duplicates for Web Crawling", WWW'07 §3) —
    the 10^9+ replacement for 16-bit chunk bucketing.

    Split the 64-bit simhash into `blocks` (m) blocks; for Hamming
    distance <= k, any pair's <= k differing bits fall into at most k
    blocks, so SOME choice of m-k blocks matches exactly (pigeonhole).
    One table per C(m, m-k) combination, keyed by the CONCATENATION of
    that combination's block values — with m=6, k=3 that is 20 tables
    keyed on ~32 bits (vs 4 tables on 16 bits): bucket count rises from
    2^16 to ~2^32, so expected bucket occupancy at 10^9 docs drops from
    ~15k to <1, at the cost of 20 emitted rows per doc. The emission is
    ONE scan (explode over a per-row array of (table, key) structs), the
    join is bucket-keyed with the same hot-bucket cap, and pairs sharing
    several tables dedup in the final distinct.
    """
    import itertools

    m, k = blocks, max_hamming
    assert m > k >= 1
    base, extra = divmod(64, m)
    widths = [base + (1 if i < extra else 0) for i in range(m)]
    starts = [sum(widths[:i]) for i in range(m)]

    def block_col(i):
        return F.shiftrightunsigned("simhash", starts[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    entries = []
    for ti, combo in enumerate(itertools.combinations(range(m), m - k)):
        key = F.lit(0).cast("long")
        for i in combo:
            key = F.shiftleft(key, widths[i]).bitwiseOR(block_col(i))
        entries.append(
            F.struct(F.lit(ti).alias("table"), key.alias("key"))
        )
    keys = sim.select(
        "doc_id", F.explode(F.array(*entries)).alias("_e")
    ).select("doc_id", F.col("_e.table").alias("table"), F.col("_e.key").alias("key"))
    hashes = sim.select("doc_id", "simhash")
    cand = _capped_bucket_pairs(keys, ["table", "key"], max_bucket)
    cand = cand.join(
        hashes.withColumnRenamed("doc_id", "a").withColumnRenamed(
            "simhash", "ha"
        ),
        "a",
    ).join(
        hashes.withColumnRenamed("doc_id", "b").withColumnRenamed(
            "simhash", "hb"
        ),
        "b",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    # pairs are already distinct from _capped_bucket_pairs
    return cand.select("a", "b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_hamming_candidates(
    sim: DataFrame, max_hamming: int = 3, chunks: int = 4,
    max_bucket: int = 5000,
) -> DataFrame:
    """Near-dup candidates from 64-bit SimHashes via chunk bucketing: split
    the hash into `chunks` 16-bit pieces; by pigeonhole any pair within
    Hamming distance <= chunks-1 shares at least one exact chunk, so the
    candidate join is keyed on (chunk_idx, chunk_value) — never all-pairs.
    Returns (a, b, hamming) pairs with hamming <= max_hamming.

    Chunk extraction is sign-safe: bitwiseAND(mask) rather than `%`, which
    in Spark keeps the dividend's sign and would give negative chunk-0 keys
    for negative simhashes, silently splitting mixed-sign pairs into
    different buckets. Buckets over `max_bucket` degrade to star pairs
    (still Hamming-filtered) instead of a quadratic self-join.

    Scale note (10^9+ docs): 16-bit chunks give <=65,536 buckets per chunk
    index, ~15k docs/bucket at 10^9 docs — at that scale use Manku et al.
    2007's sorted multi-permutation tables (wider effective prefixes);
    this chunk scheme is exact and bucket-bounded up to ~10^8 docs."""
    width = 64 // chunks
    mask = (1 << width) - 1
    pieces = []
    for c in range(chunks):
        pieces.append(
            sim.select(
                "doc_id",
                "simhash",
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("simhash", c * width)
                .bitwiseAND(F.lit(mask))
                .alias("piece"),
            )
        )
    keys = pieces[0]
    for p in pieces[1:]:
        keys = keys.unionByName(p)
    hashes = sim.select("doc_id", "simhash")
    cand = _capped_bucket_pairs(keys, ["chunk", "piece"], max_bucket)
    cand = (
        cand.join(hashes.withColumnRenamed("doc_id", "a").withColumnRenamed("simhash", "ha"), "a")
        .join(hashes.withColumnRenamed("doc_id", "b").withColumnRenamed("simhash", "hb"), "b")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def line_dedup_stats(
    df: DataFrame, text_col: str = "text", min_len: int = 20
) -> DataFrame:
    """Line/sentence-level exact dedup (the C4 / Dolma pattern: drop or
    count text UNITS repeated across documents — boilerplate sentences,
    nav text, cookie banners — rather than whole-doc dups).

    Splits each doc on sentence boundaries, normalizes (trim + lower +
    whitespace collapse), drops units under `min_len` chars, and reports
    each unit that appears in more than one document with its document
    and occurrence counts. Shape at 100 TB: explode is a narrow map (rows
    grow ~20x but bytes stay ~flat), then ONE hash-keyed aggregation on
    the unit hash — the same shuffle profile as exact whole-doc dedup.
    The md5 key (not the raw text) would be the shuffle key at scale; the
    output keeps the text for the report."""
    unit = F.explode(F.split(F.col(text_col), r"\.")).alias("u")
    norm = F.lower(F.trim(F.regexp_replace(F.col("u"), r"\s+", " ")))
    units = (
        df.select("doc_id", unit)
        .select("doc_id", norm.alias("unit"))
        .filter(F.length("unit") >= min_len)
    )
    return (
        units.groupBy("unit")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.md5(F.col("unit")).alias("unit_md5"),
            "n_docs",
            "n_occurrences",
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "unit_md5")
    )


def incremental_band_filter(
    corpus_sig: DataFrame,
    batch_sig: DataFrame,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """Snapshot-incremental MinHash dedup: flag each NEW-batch document
    whose LSH band key collides with the EXISTING corpus, without ever
    re-pairing the corpus against itself.

    This is the shape a 100 TB crawl pipeline actually runs: the corpus's
    (band, band_key) table is a persisted artifact that only GROWS as
    snapshots land; each new snapshot is banded (narrow map over the new
    docs only) and LEFT SEMI-joined against the stored band table. Cost
    per snapshot is O(new_docs x bands) join rows — independent of corpus
    size on the probe side (the join is hash-keyed on band_key; with the
    band table bucketed by band_key it's a co-located join, no corpus
    shuffle at all). Docs that collide in >= 1 band are candidate dups
    (same guarantee as lsh_candidate_pairs within one corpus); the rest
    are certified new at the banding threshold and appended.

    Inputs are minhash signature frames (doc_id, mh_0..mh_{b*r-1}).
    Output: (doc_id, n_hit_bands, is_candidate_dup) for every batch doc.
    """
    corpus_keys = _band_keys(corpus_sig, bands, rows_per_band).select(
        "band", "band_key"
    ).distinct()
    batch_keys = _band_keys(batch_sig, bands, rows_per_band)
    hits = (
        batch_keys.join(corpus_keys, ["band", "band_key"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_bands"))
    )
    return (
        batch_sig.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_bands", F.lit(0)).cast("int").alias("n_hit_bands"),
            (F.coalesce("n_hit_bands", F.lit(0)) > 0).alias("is_candidate_dup"),
        )
    )
