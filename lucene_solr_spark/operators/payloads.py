"""Payloads: per-position float metadata and payload-driven scoring.

Reference parity:
  * DelimitedPayloadTokenFilter — lucene/analysis/common/.../payloads/
    DelimitedPayloadTokenFilter.java (+ FloatEncoder): at analysis time a
    token like ``term|2.5`` is split on the delimiter; the suffix becomes
    the position's payload, the term keeps only the prefix.
  * PayloadScoreQuery — lucene/queries/.../payloads/PayloadScoreQuery.java
    with PayloadFunction (Min/Max/Avg/SumPayloadFunction): score(doc) =
    fn(payloads of all matched positions), optionally multiplied by the
    wrapped span query's score (includeSpanScore).
  * SpanPayloadCheck — lucene/queries/.../payloads/SpanPayloadCheckQuery
    .java: an ordered adjacent span matches only if each position's
    payload equals the required value.

Spark restatement: the token table (doc_id, term, pos) used by the spans
algebra (operators/spans.py) gains a ``payload`` float column.
``delimited_payload_tokens`` is a zero-shuffle narrow map (split +
posexplode + split, all JVM Column expressions); the scoring operators
are one filter + one hash aggregation each — bucket/partition pruning and
map-side combine come free from Catalyst. At 10^12 docs the payload
column rides the same postings layout as positions (one more parallel
array), adding no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FNS = {"min": F.min, "max": F.max, "avg": F.avg, "sum": F.sum}


def delimited_payload_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "|",
    default: float = 1.0,
) -> DataFrame:
    """(id, text with ``term|payload`` tokens) -> (doc_id, term, pos,
    payload). Tokens without a delimiter get ``default`` (Lucene leaves
    the payload unset; a reader-side default of 1.0 is the
    PayloadFunction's no-payload behavior). Pure Column expressions."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "raw"),
    )
    parts = F.split(F.col("raw"), "\\" + delimiter, 2)
    # F.get is null-safe on out-of-range (tokens without a delimiter);
    # element_at throws under ANSI mode
    payload = F.get(parts, 1).cast("double")
    return tok.select(
        "doc_id",
        F.get(parts, 0).alias("term"),
        "pos",
        F.coalesce(payload, F.lit(float(default))).alias("payload"),
    )


def payload_score(
    tokens: DataFrame,
    term: str,
    fn: str = "avg",
    span_scores: DataFrame | None = None,
) -> DataFrame:
    """PayloadScoreQuery over a single-term span: score(doc) =
    fn(payloads at the term's positions). ``span_scores`` (doc_id, score)
    — e.g. a Searcher BM25 frame — multiplies in when given
    (includeSpanScore=true)."""
    agg = _FNS[fn]
    g = (
        tokens.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(agg("payload").alias("score"))
    )
    if span_scores is not None:
        g = g.join(
            span_scores.withColumnRenamed("score", "_span"), "doc_id"
        ).select("doc_id", (F.col("score") * F.col("_span")).alias("score"))
    return g


def span_payload_check(
    tokens: DataFrame, terms: list, payloads: list
) -> DataFrame:
    """SpanPayloadCheck over an ordered adjacent span (phrase): the span
    at positions p..p+n-1 matches only if position i's payload equals
    ``payloads[i]`` (None = don't care). Returns (doc_id, n_matches)."""
    assert len(terms) == len(payloads) and terms
    base = tokens.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p0"), F.col("payload").alias("y0")
    )
    j = base
    for i, t in enumerate(terms[1:], start=1):
        nxt = tokens.filter(F.col("term") == t).select(
            "doc_id",
            F.col("pos").alias(f"p{i}"),
            F.col("payload").alias(f"y{i}"),
        )
        j = j.join(nxt, "doc_id").filter(
            F.col(f"p{i}") == F.col("p0") + i
        )
    cond = F.lit(True)
    for i, want in enumerate(payloads):
        if want is not None:
            cond = cond & (F.col(f"y{i}") == float(want))
    return (
        j.filter(cond)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )
