"""Training-data mixing & LM-quality scoring — the last two stages of a
web-corpus pipeline before tokenization.

Both operators are pure Column expressions (zero Python, zero extra
shuffle beyond one stats aggregation), and both are closed-form so their
SQL oracles restate them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic per-row uniform in [0, 1): first 8 hex chars of
# md5(doc_id) -> 32-bit int / 2^32. md5 exists verbatim in every SQL
# engine, so engine and oracle compute the IDENTICAL value (Spark's
# xxhash64 does not match DuckDB's hash()); 32 bits of the digest is
# plenty for a sampling decision.
def _unit_hash(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 32))


def sample_mix(
    df: DataFrame, rates: dict[str, float], source_col: str = "source",
    id_col: str = "doc_id", default_rate: float = 0.0,
) -> DataFrame:
    """Data mixing: keep each row with its source's target rate,
    deterministically (hash-Bernoulli on the row id — re-running the
    pipeline reproduces the same subset; the standard way training mixes
    pin upsample/downsample weights per source).

    At 100 TB this is a narrow map: no shuffle, no sampling state, and
    the filter pushes into the scan alongside any partition pruning on
    source. Rows whose source has no configured rate get default_rate."""
    u = _unit_hash(F.col(id_col))
    rate = F.lit(default_rate)
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", min_prob_scale: float = 0.5,
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus' own unigram
    LM — the cheap stand-in for a KenLM perplexity quality filter
    (cf. CCNet, Wenzek et al. 2020: rank documents by LM score, keep the
    head). Add-0.5 smoothing over the corpus vocabulary.

    Two aggregations total: one (term -> count) table for the LM (at
    100 TB: map-side combined, ~vocab-sized result, broadcast back), one
    per-doc mean over the exploded tokens. Higher (less negative) score =
    more typical text; boilerplate of rare tokens scores low."""
    tok = docs.select("doc_id", F.explode(F.split(text_col, " ")).alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("tf"))
    totals = tf.agg(
        F.sum("tf").alias("n_tokens"), F.count("*").alias("n_vocab")
    ).collect()[0]
    n_tok, n_vocab = float(totals["n_tokens"]), float(totals["n_vocab"])
    denom = n_tok + min_prob_scale * n_vocab
    logp = F.log((F.col("tf") + F.lit(min_prob_scale)) / F.lit(denom))
    lm = tf.select("term", logp.alias("logp"))
    return (
        tok.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(F.round(F.avg("logp"), 4).alias("mean_logprob"))
    )


def pack_shards(
    docs: DataFrame,
    weight_col: str,
    budget: float,
    id_col: str = "doc_id",
    partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Token-budget shard packing for training export: walk docs in
    ``id_col`` order and open a new shard whenever the running token
    count would exceed ``budget`` — deterministic, identical to the
    serial greedy packing (shard = floor(exclusive-prefix-sum / budget);
    a doc larger than the budget gets its own shard(s) naturally).

    Scale shape (10^12 docs): NO global single-partition window. Same
    two-pass device as ids.assign_dense_ids — range-partition by id,
    one O(p) driver-side offsets collect (per-partition weight totals),
    then a partition-local cumulative-sum window. Adds column ``shard``.

    CORRECTNESS — the offsets pass and the window pass must observe the
    SAME physical range partitioning (repartitionByRange re-samples its
    boundaries on each execution; see ids.py module note). The exchange
    is therefore persisted (MEMORY_AND_DISK) before the totals collect;
    the handle is appended to ``cache_registry`` (if given) so the caller
    can unpersist after materializing the result — otherwise it stays
    pinned until session end, which is safe but holds memory.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    ranged = (
        docs.repartitionByRange(p, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_registry is not None:
        cache_registry.append(ranged)
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(weight_col).alias("w"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = [], 0.0
    for r in totals:
        offsets.append((int(r["_pid"]), float(acc)))
        acc += float(r["w"] or 0.0)
    # "no silent caps": this collect is O(partitions) by construction —
    # record its size (dropped is structurally 0) so a 100 TB run's log
    # shows the driver-side footprint of the manifest.
    from .metrics import record_cap

    record_cap("pack_shards.offsets", kept=len(offsets), dropped=0, partitions=p)
    off = spark.createDataFrame(offsets or [(0, 0.0)], "_pid int, _off double")
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_incl = F.sum(weight_col).over(w)
    cum_excl = F.col("_off") + cum_incl - F.col(weight_col)
    return (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn("shard", F.floor(cum_excl / F.lit(float(budget))).cast("long"))
        .drop("_pid", "_off")
    )


def temperature_mix_rates(
    counts: dict[str, int], alpha: float, target_total: int
) -> dict[str, float]:
    """Temperature-based multilingual/source mixing (the multilingual-LM
    sampling rule: q_i ∝ p_i^alpha): convert observed per-source counts
    into per-source Bernoulli keep rates that realize the tempered
    distribution at ~target_total rows. alpha < 1 upsamples the tail
    relative to the head; alpha = 1 is proportional (no reweighting).
    rate_i = min(1, (n_i^alpha / Σ n_j^alpha) · target_total / n_i);
    feed the result to sample_mix for the deterministic hash-Bernoulli
    realization."""
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    sw = sum(weights[s] for s in sorted(weights))
    return {
        s: min(1.0, (weights[s] / sw) * float(target_total) / counts[s])
        for s in counts
    }
