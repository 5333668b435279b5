"""Reverse search (percolator): match incoming documents against a table
of REGISTERED QUERIES — alerting/saved-search at web scale.

Reference twins: lucene/monitor/src/java/org/apache/lucene/monitor/
Monitor.java (≈L60, the match loop) and TermFilteredPresearcher.java
(≈L80): Lucene indexes each query's terms and runs the document AS a
query over that index to prequalify candidates, then runs only the
surviving queries against the document. This module is the Spark-first
restatement:

  stage 1 (presearcher): explode the doc's distinct terms, equi-join the
    query-term table -> candidate (doc, query) pairs. One hash-keyed
    shuffle on the term; NEVER a doc x query cross product. At 10^12 docs
    x 10^6 queries the join is term-keyed and the query side is tiny —
    Spark broadcasts it.
  stage 2 (verifier): per candidate pair, check the query's own
    semantics — 'any' is already satisfied by one term hit; 'all' needs
    matched-term count == the query's term count; 'phrase' additionally
    verifies adjacent positions via the positions table.

Query table schema: (query_id: long, qtype: 'any'|'all'|'phrase',
terms: array<string>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def monitor_match(
    tok_pos: DataFrame, queries: DataFrame
) -> DataFrame:
    """-> (doc_id, query_id) pairs where the registered query matches.

    tok_pos: (doc_id, term, pos) — one row per token occurrence (the same
    exploded shape every positional operator here consumes).
    """
    qterms = queries.select(
        "query_id", "qtype", F.size("terms").alias("n_terms"),
        F.posexplode("terms").alias("slot", "term"),
    )
    doc_terms = tok_pos.select("doc_id", "term").distinct()
    # presearcher: term-keyed equi-join, query side broadcast
    hits = doc_terms.join(F.broadcast(qterms), "term").select(
        "doc_id", "query_id", "qtype", "n_terms", "slot"
    )
    matched = hits.groupBy("doc_id", "query_id", "qtype", "n_terms").agg(
        F.countDistinct("slot").alias("n_matched")
    )
    any_all = matched.filter(
        (F.col("qtype") == "any")
        | ((F.col("qtype") == "all") & (F.col("n_matched") == F.col("n_terms")))
    ).select("doc_id", "query_id")

    # phrase tier: candidates with all terms present, then adjacency check
    ph_cand = matched.filter(
        (F.col("qtype") == "phrase") & (F.col("n_matched") == F.col("n_terms"))
    ).select("doc_id", "query_id", "n_terms")
    ph_slots = ph_cand.join(
        F.broadcast(qterms.filter(F.col("qtype") == "phrase")),
        ["query_id", "n_terms"],
    ).select("doc_id", "query_id", "n_terms", "slot", "term")
    # occurrence positions of each slot's term in the doc; slot i must sit
    # at anchor+i for one shared anchor (pos - slot is the anchor)
    occ = ph_slots.join(tok_pos, ["doc_id", "term"]).select(
        "doc_id", "query_id", "n_terms", "slot",
        (F.col("pos") - F.col("slot")).alias("anchor"),
    )
    ph_ok = (
        occ.distinct()
        .groupBy("doc_id", "query_id", "n_terms", "anchor")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == F.col("n_terms"))
        .select("doc_id", "query_id")
        .distinct()
    )
    return any_all.unionByName(ph_ok)
