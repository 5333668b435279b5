"""Spans positional algebra as position-array joins (SURVEY.md §3.3).

Reference parity:
  * SpanNearQuery ordered/unordered — lucene/core/src/java/org/apache/
    lucene/search/spans/SpanNearQuery.java (≈L40): two (or more) terms
    within `slop` intervening positions, optionally in order.
  * SpanFirstQuery — SpanFirstQuery.java: term within the first `end`
    positions.
  * Sloppy phrase — SloppyPhraseMatcher.java (≈L50): phrase matches with
    edit distance <= slop; each match contributes sloppyWeight =
    1/(1 + matchLength) to the phrase freq. `sloppy_phrase_freq`
    implements Lucene's GREEDY matcher (the SloppyPhraseScorer.phraseFreq
    priority-queue walk: advance the minimum phrase position, minimizing
    matchLength, emit a match each time it overtakes the next pointer) —
    positions are consumed once, so overlapping repeats score differently
    from the naive all-pairs form, which is retained as
    `sloppy_phrase_freq_allpairs` (the purely-relational simplification).
    Repeated terms within the phrase (Lucene's hasRpts path) are out of
    scope — distinct phrase terms only, asserted.

All operators take a token table (doc_id, term, pos) — the exploded
positions view of the inverted index — and return DataFrames; everything
is equi-joins + range predicates (Catalyst: broadcast/SMJ + codegen).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(tokens: DataFrame, term: str, alias: str) -> DataFrame:
    return tokens.filter(F.col("term") == term).select(
        "doc_id", F.col("pos").alias(alias)
    )


def span_near(
    tokens: DataFrame,
    term_a: str,
    term_b: str,
    slop: int,
    in_order: bool = True,
) -> DataFrame:
    """Docs (with match count) where term_a..term_b occur within `slop`
    intervening positions; ordered or unordered."""
    pa_ = _positions(tokens, term_a, "pa")
    pb = _positions(tokens, term_b, "pb")
    j = pa_.join(pb, "doc_id")
    if in_order:
        dist = F.col("pb") - F.col("pa") - 1
        cond = (F.col("pb") > F.col("pa")) & (dist <= slop)
    else:
        dist = F.abs(F.col("pb") - F.col("pa")) - 1
        cond = (F.col("pa") != F.col("pb")) & (dist <= slop)
    return (
        j.filter(cond)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


def span_first(tokens: DataFrame, term: str, end: int) -> DataFrame:
    """Docs where `term` occurs within the first `end` positions
    (positions are 0-based here; end is exclusive)."""
    return (
        tokens.filter((F.col("term") == term) & (F.col("pos") < end))
        .select("doc_id")
        .distinct()
    )


def span_position_range(
    tokens: DataFrame, term: str, start: int, end: int
) -> DataFrame:
    """SpanPositionRangeQuery (lucene/core/.../spans/
    SpanPositionRangeQuery.java ≈L35): spans of `term` whose position lies
    in [start, end); span_first is the start=0 special case
    (SpanFirstQuery extends SpanPositionRangeQuery). Returns per-doc count
    of in-range spans."""
    return (
        tokens.filter(
            (F.col("term") == term)
            & (F.col("pos") >= start)
            & (F.col("pos") < end)
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )


def span_or(tokens: DataFrame, terms: list[str]) -> DataFrame:
    """SpanOrQuery (SpanOrQuery.java ≈L40): union of sub-spans — here the
    merged position stream of several terms; returns per-doc span count
    (distinct matching positions)."""
    return (
        tokens.filter(F.col("term").isin(list(terms)))
        .select("doc_id", "pos")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )


def span_not(
    tokens: DataFrame, include: str, exclude: str, dist: int = 0
) -> DataFrame:
    """SpanNotQuery (SpanNotQuery.java ≈L40): spans of `include` that do
    NOT overlap (within `dist` positions) any span of `exclude`. Single-term
    spans: an include position survives unless an exclude position lies in
    [pos-dist, pos+dist]. Anti-join on the proximity predicate."""
    inc = _positions(tokens, include, "pa")
    exc = _positions(tokens, exclude, "pb")
    survivors = inc.join(
        exc,
        (inc["doc_id"] == exc["doc_id"])
        & (F.abs(F.col("pb") - F.col("pa")) <= dist),
        "left_anti",
    )
    return survivors.groupBy("doc_id").agg(F.count("*").alias("n_spans"))


def _near_spans(
    tokens: DataFrame, term_a: str, term_b: str, slop: int
) -> DataFrame:
    """Ordered near spans of (term_a, term_b) within `slop` as explicit
    (doc_id, s, e) rows — the span enumeration shared by the containing /
    within algebra (start = pa, end = pb inclusive)."""
    pa_ = _positions(tokens, term_a, "s")
    pb = _positions(tokens, term_b, "e")
    return (
        pa_.join(pb, "doc_id")
        .filter((F.col("e") > F.col("s")) & (F.col("e") - F.col("s") - 1 <= slop))
        .select("doc_id", "s", "e")
    )


def span_containing(
    tokens: DataFrame,
    big: tuple[str, str, int],
    little: str,
) -> DataFrame:
    """SpanContainingQuery (lucene/core/.../search/spans/
    SpanContainingQuery.java ≈L30): spans from `big` that fully enclose a
    match of `little`. Big spans are ordered-near pairs (a, b, slop);
    little spans are single-term positions. A big span is emitted at most
    once no matter how many little spans it encloses (ContainSpans
    advances big after each emit), hence the semi-join + distinct-span
    count. All equi-join + range predicates — Catalyst broadcasts the
    little side when small."""
    a, b, slop = big
    bigs = _near_spans(tokens, a, b, slop)
    lit = _positions(tokens, little, "p")
    hit = bigs.join(
        lit,
        (bigs["doc_id"] == lit["doc_id"])
        & (F.col("p") >= F.col("s"))
        & (F.col("p") <= F.col("e")),
        "left_semi",
    )
    return hit.groupBy("doc_id").agg(F.count("*").alias("n_spans"))


def span_within(
    tokens: DataFrame,
    big: tuple[str, str, int],
    little: str,
) -> DataFrame:
    """SpanWithinQuery (SpanWithinQuery.java ≈L30): spans from `little`
    that lie within some span of `big` — the mirror of span_containing
    (little drives, big filters). Returns per-doc count of distinct little
    positions enclosed by at least one big span."""
    a, b, slop = big
    bigs = _near_spans(tokens, a, b, slop)
    lit = _positions(tokens, little, "p")
    hit = lit.join(
        bigs,
        (lit["doc_id"] == bigs["doc_id"])
        & (F.col("p") >= F.col("s"))
        & (F.col("p") <= F.col("e")),
        "left_semi",
    )
    return hit.groupBy("doc_id").agg(F.count("*").alias("n_spans"))


def sloppy_phrase_freq_allpairs(
    tokens: DataFrame, term_a: str, term_b: str, slop: int
) -> DataFrame:
    """All-pairs sloppy phrase frequency: sum of 1/(1+matchLength) over ALL
    position pairs with matchLength = |pb - pa - 1| <= slop. A purely
    relational simplification of Lucene's greedy matcher — kept for plans
    that must stay join-expressible; deviates from Lucene's sloppyFreq on
    overlapping repeats (use sloppy_phrase_freq for reference parity)."""
    pa_ = _positions(tokens, term_a, "pa")
    pb = _positions(tokens, term_b, "pb")
    j = pa_.join(pb, "doc_id")
    ml = F.abs(F.col("pb") - F.col("pa") - 1)
    return (
        j.filter((F.col("pa") != F.col("pb")) & (ml <= slop))
        .groupBy("doc_id")
        .agg(F.sum(1.0 / (1.0 + ml)).alias("sloppy_freq"))
    )


def greedy_sloppy_freq_lists(pls: list[list[int]], slop: int) -> float:
    """Lucene SloppyPhraseScorer.phraseFreq over OFFSET-ADJUSTED position
    lists (pls[i] = sorted positions of phrase slot i minus i). The
    priority-queue walk: pop the minimum phrase position, advance it while
    it has not overtaken the next pointer (minimizing matchLength = end -
    min position); each overtake emits one match worth 1/(1+matchLength).
    Each position is consumed exactly once — greedy, non-overlapping.
    Pure-Python kernel shared by the Spark operator and its tests."""
    import heapq

    iters = [iter(p) for p in pls]
    first = []
    for it in iters:
        v = next(it, None)
        if v is None:
            return 0.0  # conjunction: a missing term means freq 0
        first.append(v)
    end = max(first)
    # tie-break (position, offset): Lucene's PhrasePositionsQueue order
    heap = [(first[off], off) for off in range(len(pls))]
    heapq.heapify(heap)
    pos, off = heapq.heappop(heap)
    match_len = end - pos
    nxt = heap[0][0]
    freq = 0.0
    while True:
        v = next(iters[off], None)
        if v is None:
            break
        pos = v
        if pos > end:
            end = pos
        if pos > nxt:  # done minimizing the current match length
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            heapq.heappush(heap, (pos, off))
            pos, off = heapq.heappop(heap)
            nxt = heap[0][0]
            match_len = end - pos
        else:
            ml2 = end - pos
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq += 1.0 / (1.0 + match_len)
    return freq


def sloppy_phrase_freq_greedy(
    tokens: DataFrame, terms: list[str], slop: int
) -> DataFrame:
    """Per-doc Lucene-greedy sloppy phrase frequency for an n-term phrase
    of DISTINCT terms (SloppyPhraseMatcher.java without the hasRpts path).

    Spark shape: one filter + one groupBy(doc_id) building per-slot sorted
    adjusted position arrays (collect_list skips the nulls of non-matching
    slots), then an Arrow-batched pandas UDF running the per-doc
    state machine — inherently sequential semantics, so this is the
    documented custom-operator path; the shuffle is a single doc_id-keyed
    exchange and the UDF input is k small int arrays per doc."""
    assert len(set(terms)) == len(terms), "repeated phrase terms unsupported"
    from pyspark.sql.functions import pandas_udf

    k = len(terms)
    per_slot = [
        F.sort_array(
            F.collect_list(
                F.when(F.col("term") == t, F.col("pos") - F.lit(i))
            )
        ).alias(f"_p{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = (
        tokens.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id")
        .agg(*per_slot)
    )
    for i in range(k):
        per_doc = per_doc.filter(F.size(F.col(f"_p{i}")) > 0)

    @pandas_udf("double")
    def _freq(slots: pd.DataFrame) -> pd.Series:
        cols = [slots[f"_p{i}"] for i in range(k)]
        out = []
        for row in zip(*cols):
            out.append(greedy_sloppy_freq_lists([list(p) for p in row], slop))
        return pd.Series(out)

    return (
        per_doc.withColumn(
            "sloppy_freq", _freq(F.struct(*[F.col(f"_p{i}") for i in range(k)]))
        )
        .filter(F.col("sloppy_freq") > 0.0)
        .select("doc_id", "sloppy_freq")
    )


def sloppy_phrase_freq(
    tokens: DataFrame, term_a: str, term_b: str, slop: int
) -> DataFrame:
    """Two-term Lucene-greedy sloppy phrase frequency (see
    sloppy_phrase_freq_greedy)."""
    return sloppy_phrase_freq_greedy(tokens, [term_a, term_b], slop)


def span_multiterm_near(
    tokens: DataFrame,
    term_a: str,
    terms_b: list,
    slop: int,
    in_order: bool = True,
) -> DataFrame:
    """SpanMultiTermQueryWrapper (lucene/queries/.../spans/
    SpanMultiTermQueryWrapper.java ≈L50): a multi-term query (prefix/
    wildcard/fuzzy expansion) used as a span clause — the wrapper rewrites
    to SpanOr over the expanded terms. Here the caller passes the
    expansion (`terms_b`, e.g. Searcher.rewrite-style terms-dict output);
    side B's position stream is the SpanOr union (dedup by (doc, pos)),
    then the usual near-join."""
    pa_ = _positions(tokens, term_a, "pa")
    pb = (
        tokens.filter(F.col("term").isin(list(terms_b)))
        .select("doc_id", F.col("pos").alias("pb"))
        .dropDuplicates(["doc_id", "pb"])
    )
    j = pa_.join(pb, "doc_id")
    if in_order:
        dist = F.col("pb") - F.col("pa") - 1
        cond = (F.col("pb") > F.col("pa")) & (dist <= slop)
    else:
        dist = F.abs(F.col("pb") - F.col("pa")) - 1
        cond = (F.col("pa") != F.col("pb")) & (dist <= slop)
    return (
        j.filter(cond)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


def term_automaton_query(
    tok,
    transitions,
    accept_states,
    max_steps: int = 8,
):
    """TermAutomatonQuery (lucene/sandbox/src/java/org/apache/lucene/
    search/TermAutomatonQuery.java ≈L60): a token-level NFA evaluated
    against consecutive positions. ``transitions`` is a list of
    (src_state, term_or_None, dst_state) with start state 0; term None is
    the ANY transition (TermAutomatonQuery.createState/addAnyTransition).
    A document matches where some path from state 0 consumes tokens at
    positions p, p+1, ... and lands in an accept state.

    Distributed shape: the automaton is a broadcast 3-column literal
    table; each NFA step is ONE equi-join of the frontier against the
    positions table on (doc_id, next_pos) plus the broadcast transition
    join — all steps reuse the doc_id-hash exchange. The frontier is
    DISTINCT-ed per step ((doc_id, start, pos, state)): NFA state-set
    semantics, which also bounds fan-out at 10^12 positions. Positions
    strictly increase, so even cyclic automatons terminate; ``max_steps``
    caps plan depth (Lucene's det-automaton equivalent of maxDeterminizedStates).

    Returns (doc_id, freq) where freq = COUNT(DISTINCT start positions
    with an accepting path) — the same counting the sloppy-phrase and
    span entries use."""
    from pyspark.sql import functions as F

    spark = tok.sparkSession
    trans = spark.createDataFrame(
        [(int(s), t, int(d)) for s, t, d in transitions],
        "src int, tterm string, dst int",
    )
    pos = tok.select(
        F.col("doc_id").alias("d"),
        F.col("term").alias("tk"),
        F.col("pos").alias("p"),
    )
    start_trans = F.broadcast(trans.filter(F.col("src") == 0))
    frontier = (
        pos.join(
            start_trans,
            F.col("tterm").isNull() | (F.col("tterm") == F.col("tk")),
        )
        .select(
            F.col("d").alias("doc_id"),
            F.col("p").alias("start"),
            (F.col("p") + 1).alias("nxt"),
            F.col("dst").alias("state"),
        )
        .distinct()
    )
    accept = [int(s) for s in accept_states]
    acc = frontier.filter(F.col("state").isin(accept)).select(
        "doc_id", "start"
    )
    bt = F.broadcast(trans)
    for _ in range(max_steps - 1):
        frontier = (
            frontier.join(
                pos,
                (F.col("doc_id") == F.col("d")) & (F.col("nxt") == F.col("p")),
            )
            .join(
                bt,
                (F.col("state") == F.col("src"))
                & (F.col("tterm").isNull() | (F.col("tterm") == F.col("tk"))),
            )
            .select(
                "doc_id",
                "start",
                (F.col("nxt") + 1).alias("nxt"),
                F.col("dst").alias("state"),
            )
            .distinct()
        )
        if frontier.isEmpty():
            break
        acc = acc.unionByName(
            frontier.filter(F.col("state").isin(accept)).select(
                "doc_id", "start"
            )
        )
    return (
        acc.distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("freq"))
    )
