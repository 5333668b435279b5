"""Search-UX operator family: highlighting, suggesters, spellcheck,
real-time get, LTR rescoring — DataFrame/Column recipes (JVM-side,
whole-stage codegen; the one Python step is the offset-carrying analysis
pandas UDF inside highlight_unified, which runs over top-k candidate docs
only, never the corpus).

Reference parity (SURVEY.md §3):
  * Highlighter — lucene/highlighter/src/java/org/apache/lucene/search/
    uhighlight/UnifiedHighlighter.java (≈L80): three tiers — first-hit
    window over the token split, BM25-scored passages over the token
    split, and the offset-faithful unified tier (analyzed-term matching +
    original-byte snippets via OffsetAttribute-style spans).
  * Suggester — lucene/suggest/src/java/org/apache/lucene/search/suggest/
    analyzing/AnalyzingInfixSuggester.java (≈L60) / Solr TermsComponent
    prefix mode: top-k terms by frequency under a prefix.
  * Spellcheck — solr/core/src/java/org/apache/solr/spelling/
    DirectSolrSpellChecker.java (≈L40, backed by Lucene FuzzyTermsEnum):
    candidate corrections within edit distance, ranked (distance asc,
    df desc).
  * Real-time get — solr/core/src/java/org/apache/solr/handler/component/
    RealTimeGetComponent.java (≈L120): point lookup by uniqueKey.
  * LTR — solr/contrib/ltr/src/java/org/apache/solr/ltr/model/
    LinearModel.java (≈L40): rescore top-N candidates with a weighted
    feature sum (ReRankQParserPlugin two-stage plan shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def highlight_first_window(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    before: int = 3,
    after: int = 3,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Add `snippet`: the window around the FIRST matching term, matches
    wrapped in pre/post tags. Rows with no match get a null snippet.

    Entirely built-in array functions: split -> array_position (min over
    the query terms) -> slice -> transform(wrap) -> array_join.
    """
    toks = F.split(F.col(text_col), " ")
    # 1-based first position of each term; 0 = absent
    positions = [F.array_position(toks, t) for t in terms]
    first_hit = F.least(
        *[F.when(p > 0, p).otherwise(F.lit(None)) for p in positions]
    ) if len(terms) > 1 else F.when(positions[0] > 0, positions[0])
    start = F.greatest(first_hit - before, F.lit(1))
    # end-anchored length so a hit near the text start yields a shorter
    # window (matches the [start, first_hit+after] slice semantics)
    length = first_hit + after - start + 1
    window = F.slice(toks, start, length)
    term_arr = F.array(*[F.lit(t) for t in terms])
    wrapped = F.transform(
        window,
        lambda t: F.when(
            F.array_contains(term_arr, t), F.concat(F.lit(pre), t, F.lit(post))
        ).otherwise(t),
    )
    snippet = F.when(first_hit.isNotNull(), F.array_join(wrapped, " "))
    return df.withColumn("snippet", snippet)


def highlight_best_passage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    n_docs: int,
    window: int = 16,
    k1: float = 1.2,
    b: float = 0.75,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """UnifiedHighlighter passage tier (uhighlight/PassageScorer.java ≈L40):
    split the doc into fixed `window`-token passages, score each passage
    with a BM25-shaped sum over the query terms (idf × tf-saturation; the
    passage length IS the window so the length norm is constant), return
    each matching doc's best passage with hits wrapped.

    One posexplode + one groupBy(doc, passage) + a rank-1 window — all
    JVM-side; idf binds as literals from one tiny df lookup (the stats-bind
    pattern, TermStates.build)."""
    import math

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    dfs = {
        r["tok"]: r["df"]
        for r in toks.filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count_distinct(id_col).alias("df"))
        .collect()
    }
    if not dfs:
        return df.select(id_col).limit(0).withColumn("passage", F.lit(""))
    idf_map = F.create_map(
        *[
            x
            for t, d in dfs.items()
            for x in (
                F.lit(t),
                F.lit(math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))),
            )
        ]
    )
    matched = toks.filter(F.col("tok").isin(list(dfs))).withColumn(
        "win", F.expr(f"pos DIV {window}")
    )
    ptf = matched.groupBy(id_col, "win", "tok").agg(F.count("*").alias("tf"))
    norm = F.lit(k1)  # passage len == window == "avg": (1-b+b*1) = 1
    contrib = idf_map[F.col("tok")] * F.col("tf") / (F.col("tf") + norm)
    pscore = ptf.groupBy(id_col, "win").agg(
        F.sum(contrib).alias("pscore")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("pscore"), F.asc("win")
    )
    best = (
        pscore.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    joined = df.join(best, id_col)
    arr = F.split(F.col(text_col), " ")
    passage_arr = F.slice(arr, F.col("win") * window + 1, window)
    term_arr = F.array(*[F.lit(t) for t in dfs])
    wrapped = F.transform(
        passage_arr,
        lambda t: F.when(
            F.array_contains(term_arr, t), F.concat(F.lit(pre), t, F.lit(post))
        ).otherwise(t),
    )
    return joined.select(
        id_col,
        F.round("pscore", 4).alias("pscore"),
        F.array_join(wrapped, " ").alias("passage"),
    )


def highlight_unified(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    profile: str = "en",
    window: int = 16,
    k1: float = 1.2,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Offset-faithful UnifiedHighlighter (lucene/highlighter .../uhighlight/
    UnifiedHighlighter.java + FieldHighlighter ≈L120): analyze each doc with
    the SAME chain as index time, carrying (startOffset, endOffset) into the
    original text; match ANALYZED terms (so stemming/possessives match:
    query 'engine' highlights "engine's", "engines", "engineered"); score
    fixed token-window passages BM25-style; emit the best passage sliced
    from the ORIGINAL text with tags inserted at source character offsets —
    never a re-tokenized reconstruction.

    The analysis step is one Arrow-batched pandas UDF (applied to the
    candidate docs only — highlighting runs over top-k hits, not the
    corpus); passage scoring, window choice and snippet assembly are all
    JVM-side (the snippet fold is an `aggregate` over the sorted match
    offsets using substr on the source column).
    """
    import math

    from ..analysis import analyze_query_terms, analyze_with_offsets

    q_terms = set(analyze_query_terms(query, profile))
    if not q_terms:
        return df.select(id_col).limit(0).withColumn(
            "pscore", F.lit(0.0)
        ).withColumn("snippet", F.lit(""))

    @F.pandas_udf(
        "struct<term:array<string>,pos:array<int>,so:array<int>,eo:array<int>>"
    )
    def _ana(s: pd.Series) -> pd.DataFrame:
        terms, poss, sos, eos = [], [], [], []
        for t in s.fillna(""):
            rows = analyze_with_offsets(t, profile)
            terms.append([r[0] for r in rows])
            poss.append([r[1] for r in rows])
            sos.append([r[2] for r in rows])
            eos.append([r[3] for r in rows])
        return pd.DataFrame(
            {"term": terms, "pos": poss, "so": sos, "eo": eos}
        )

    toks = (
        df.select(id_col, text_col, _ana(F.col(text_col)).alias("a"))
        .select(
            id_col,
            text_col,
            F.explode(F.arrays_zip("a.term", "a.pos", "a.so", "a.eo")).alias(
                "t"
            ),
        )
        .select(
            id_col,
            text_col,
            F.col("t.term").alias("term"),
            F.col("t.pos").alias("pos"),
            F.col("t.so").alias("so"),
            F.col("t.eo").alias("eo"),
            (F.col("t.pos") / window).cast("int").alias("win"),
        )
    ).persist()

    matched = toks.filter(F.col("term").isin(list(q_terms)))
    # stats-bind: idf from the candidate set's own dfs (FieldHighlighter
    # scores passages with index stats; over a top-k slice these are the
    # available stats) — one tiny collect
    stats = matched.groupBy("term").agg(
        F.count_distinct(id_col).alias("df")
    ).collect()
    if not stats:
        toks.unpersist()
        return df.select(id_col).limit(0).withColumn(
            "pscore", F.lit(0.0)
        ).withColumn("snippet", F.lit(""))
    n_docs = df.count()
    idf_map = F.create_map(
        *[
            x
            for r in stats
            for x in (
                F.lit(r["term"]),
                F.lit(
                    math.log(
                        1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)
                    )
                ),
            )
        ]
    )
    ptf = matched.groupBy(id_col, "win", "term").agg(
        F.count("*").alias("tf")
    )
    contrib = idf_map[F.col("term")] * F.col("tf") / (F.col("tf") + F.lit(k1))
    pscore = ptf.groupBy(id_col, "win").agg(F.sum(contrib).alias("pscore"))

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("pscore"), F.asc("win"))
    best = (
        pscore.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "win", "pscore")
    )
    # passage char bounds span ALL tokens of the window; match offsets only
    # the hits, sorted for the fold
    bounds = toks.groupBy(id_col, "win").agg(
        F.min("so").alias("p_start"), F.max("eo").alias("p_end")
    )
    hits = matched.groupBy(id_col, "win").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("so"), F.col("eo")))
        ).alias("hits")
    )
    joined = (
        best.join(bounds, [id_col, "win"])
        .join(hits, [id_col, "win"])
        .join(df.select(id_col, text_col), id_col)
    )
    txt = F.col(text_col)
    # fold the sorted hit offsets into the snippet: copy source bytes
    # [cur, so), wrap source bytes [so, eo), finish with [cur, p_end)
    snippet = F.aggregate(
        F.col("hits"),
        F.struct(
            F.col("p_start").alias("cur"), F.lit("").alias("acc")
        ),
        lambda st, h: F.struct(
            h["eo"].alias("cur"),
            F.concat(
                st["acc"],
                txt.substr(st["cur"] + 1, h["so"] - st["cur"]),
                F.lit(pre),
                txt.substr(h["so"] + 1, h["eo"] - h["so"]),
                F.lit(post),
            ).alias("acc"),
        ),
        lambda st: F.concat(
            st["acc"], txt.substr(st["cur"] + 1, F.col("p_end") - st["cur"])
        ),
    )
    out = joined.select(
        id_col, F.round("pscore", 4).alias("pscore"), snippet.alias("snippet")
    )
    return out


def suggest_prefix(
    tokens: DataFrame, prefix: str, k: int = 10
) -> DataFrame:
    """Top-k (term, df) under a prefix from a (doc_id, term) token table —
    the terms-dict prefix walk of AnalyzingInfixSuggester/TermsComponent."""
    return (
        tokens.filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def spellcheck(
    tokens: DataFrame, word: str, max_edits: int = 2, k: int = 5
) -> DataFrame:
    """Correction candidates: distinct terms within `max_edits`, ranked by
    (distance asc, df desc, term) — DirectSolrSpellChecker's ordering."""
    cand = (
        tokens.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(word)))
        .filter(
            (F.col("distance") <= max_edits) & (F.col("term") != word)
        )
    )
    return cand.orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    ).limit(k).select("term", "distance", "df")


def term_vectors(
    tokens: DataFrame, doc_ids: list[int], with_positions: bool = True
) -> DataFrame:
    """TermVectorsComponent (solr/handler/component/TermVectorComponent.java):
    per-doc term vector — (doc_id, term, tf[, positions]) for the requested
    docs. One filter (partition-prunable on a doc-partitioned token table)
    + one agg; positions sorted for determinism."""
    tv = (
        tokens.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )
    if not with_positions:
        tv = tv.drop("positions")
    return tv


def elevate(
    results: DataFrame,
    elevated_ids: list[int],
    k: int = 10,
    id_col: str = "doc_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """QueryElevationComponent (solr/handler/component/
    QueryElevationComponent.java): pin the configured ids above organic
    results IN EDITORIAL ORDER, drop excluded ids, fill the rest by score.
    Pure column arithmetic over the scored candidate set — the elevation
    map is a tiny literal array, never a join."""
    if exclude_ids:
        results = results.filter(
            ~F.col(id_col).isin([int(d) for d in exclude_ids])
        )
    pos = F.array_position(
        F.array(*[F.lit(int(d)) for d in elevated_ids]), F.col(id_col)
    )
    return (
        results.withColumn(
            "_elev", F.when(pos > 0, pos).otherwise(F.lit(2_147_483_647))
        )
        .orderBy(F.asc("_elev"), F.desc("score"), F.asc(id_col))
        .limit(k)
        .withColumn("elevated", F.col("_elev") != 2_147_483_647)
        .drop("_elev")
    )


def spellcheck_collate(
    tokens: DataFrame, words: list[str], max_edits: int = 2
) -> DataFrame:
    """SpellCheckCollator (solr/spelling/SpellCheckCollator.java): best
    correction per query word (the word itself when it exists in the
    index, else the top spellcheck candidate), the collated query string,
    and the conjunctive hit count of the collation.

    Shape: term-dict agg -> broadcast the tiny word list -> per-word
    top-1 via window -> conjunctive count via groupBy(doc) HAVING all
    words matched. No driver round-trips."""
    from pyspark.sql import Window

    spark = tokens.sparkSession
    words_df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "widx int, word string"
    )
    terms = tokens.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    cand = (
        terms.join(F.broadcast(words_df))
        .withColumn("distance", F.levenshtein("term", "word"))
        .filter(F.col("distance") <= max_edits)
    )
    w = Window.partitionBy("widx").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("widx", F.col("term").alias("corrected"))
    )
    # collect_list gives NO ordering guarantee (orderBy before an agg is
    # not preserved) — carry widx in a struct, sort the array, then join
    collation = best.agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "corrected"))),
                lambda s: s["corrected"],
            ),
        ).alias("collation")
    )
    hits = (
        tokens.join(
            F.broadcast(best.select("corrected")),
            tokens["term"] == F.col("corrected"),
            "inner",
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("corrected").alias("nw"))
        .filter(F.col("nw") == len(words))
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return collation.crossJoin(hits)


def cursor_page(
    results: DataFrame,
    page: int,
    page_size: int,
    order_cols: list,
) -> DataFrame:
    """cursorMark deep paging (solr CursorMarkParams): page N of a totally
    ordered result. Expressed as a rank-window filter rather than
    OFFSET/LIMIT so AQE can prune; at extreme depth a real cursor (filter
    on the last sort key of the previous page — Searcher.search_after)
    beats rank paging, and both are provided."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    lo, hi = page * page_size, (page + 1) * page_size
    return (
        results.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") > lo) & (F.col("_rk") <= hi))
        .drop("_rk")
    )


def suggest_fuzzy(
    tokens: DataFrame, prefix: str, max_edits: int = 1, k: int = 10
) -> DataFrame:
    """FuzzySuggester (lucene/suggest/.../analyzing/FuzzySuggester.java):
    complete `prefix` tolerating up to `max_edits` edits WITHIN the typed
    prefix (the suggestion's head may differ from what was typed). The
    Levenshtein automaton only decides MEMBERSHIP; ranking is purely by
    the suggestion WEIGHT (here df), exactly AnalyzingSuggester's
    weight-ordered WFST output paths (FuzzySuggester extends it and
    changes only the matching automaton, not the order). Distance is
    computed on the candidate's head truncated to the prefix length —
    the automaton does the same comparison without enumeration; at
    terms-dict scale the candidate set is first cut by a length band,
    keeping the scan pruned. Classic Levenshtein on both engine and
    oracle (Lucene defaults transpositions=true; Spark's builtin is
    classic — documented divergence, same on both sides)."""
    n = len(prefix)
    head = F.substring("term", 1, n)
    cand = (
        tokens.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        # cheap band pruning before levenshtein: candidate heads within
        # max_edits of the prefix share either first char or length +-1
        .filter(F.length("term") >= n - max_edits)
        .withColumn("head_dist", F.levenshtein(head, F.lit(prefix)))
        .filter(F.col("head_dist") <= max_edits)
    )
    return (
        cand.orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", "head_dist", "df")
    )


def result_clustering(
    docs: DataFrame,
    query_terms: list[str],
    n_results: int = 50,
    n_clusters: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Search-result clustering (solr/contrib/clustering, Carrot2
    engine shape): take the query's result set, vectorize with tf-idf
    (spark.ml HashingTF+IDF), KMeans into clusters, return per-cluster
    sizes + top doc. Rows-only contract (seeded, but spark.ml float
    iteration isn't ANSI-SQL-expressible)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    cond = None
    for t in query_terms:
        c = F.array_contains(F.split(F.col(text_col), " "), t)
        cond = c if cond is None else (cond | c)
    results = docs.filter(cond).orderBy(id_col).limit(n_results)
    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=1 << 12)
    idf = IDF(inputCol="_tf", outputCol="_feat")
    staged = tf.transform(tok.transform(results))
    feat = idf.fit(staged).transform(staged)
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_feat",
                predictionCol="cluster")
    assigned = km.fit(feat).transform(feat)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("top_doc"),
        )
        .orderBy(F.desc("n_docs"), F.asc("cluster"))
        .select("n_docs", "top_doc")
    )


def phonetic_terms(
    tokens: DataFrame, word: str, k: int = 10, encoder: str = "soundex"
) -> DataFrame:
    """PhoneticFilter-style matching (lucene/analysis/phonetic wrapping
    commons-codec): index-vocabulary terms whose phonetic code equals
    encode(word), ranked by df. `encoder` picks the commons-codec
    encoder ('soundex' or 'metaphone' — PhoneticFilterFactory's
    `encoder=` attribute). The encode UDF runs over the (small) distinct
    vocabulary, never the token stream."""
    from ..analysis import metaphone, soundex
    from ..udfs import metaphone_udf, soundex_udf

    enc, udf = (
        (metaphone, metaphone_udf)
        if encoder == "metaphone"
        else (soundex, soundex_udf)
    )
    code = enc(word)
    vocab = tokens.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        vocab.withColumn("code", udf("term"))
        .filter(F.col("code") == code)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", "code", "df")
    )


def realtime_get(df: DataFrame, key_col: str, key) -> DataFrame:
    """Point lookup by uniqueKey (RealTimeGetComponent). On a doc_id- or
    url-partitioned table this prunes to one partition/file via min-max."""
    return df.filter(F.col(key_col) == F.lit(key))


def ltr_linear_rescore(
    candidates: DataFrame,
    features: dict[str, Column],
    weights: dict[str, float],
    k: int = 10,
    order_tiebreak: str = "doc_id",
) -> DataFrame:
    """LinearModel rescoring of a phase-1 candidate set (ReRank plan shape):
    materialize features as columns, score = Σ w_i · f_i, re-sort top-k."""
    out = candidates
    for name, col in features.items():
        out = out.withColumn(name, col)
    score = None
    for name, w in weights.items():
        contrib = F.lit(float(w)) * F.col(name)
        score = contrib if score is None else score + contrib
    return (
        out.withColumn("ltr_score", score)
        .orderBy(F.desc("ltr_score"), F.asc(order_tiebreak))
        .limit(k)
    )


def _tree_column(node: dict) -> Column:
    """One regression tree -> a nested CASE WHEN Column.

    Node spec mirrors the MultipleAdditiveTreesModel JSON a Solr user
    uploads: leaf {"value": v}; split {"feature": name, "threshold": t,
    "left": node, "right": node} with the Solr branching rule
    feature <= threshold -> left (NaN/null also -> left)."""
    if "value" in node:
        return F.lit(float(node["value"]))
    go_left = F.col(node["feature"]) <= F.lit(float(node["threshold"]))
    # null feature -> left, matching the reference's missing-value branch
    return F.when(
        go_left | F.col(node["feature"]).isNull(),
        _tree_column(node["left"]),
    ).otherwise(_tree_column(node["right"]))


def ltr_trees_rescore(
    candidates: DataFrame,
    features: dict[str, Column],
    trees: list[dict],
    k: int = 10,
    order_tiebreak: str = "doc_id",
) -> DataFrame:
    """LambdaMART / MultipleAdditiveTreesModel rescoring (solr/contrib/ltr
    .../model/MultipleAdditiveTreesModel.java ≈L60): the model is an
    uploaded ensemble of weighted regression trees; document score =
    Σ_t weight_t · tree_t(features). Each tree compiles to a nested CASE
    WHEN expression, so the whole ensemble scores JVM-side inside
    whole-stage codegen — no UDF, no mllib runtime dependency — in the
    same ReRank two-phase plan shape as the linear model.

    trees: [{"weight": w, "root": <node>}, ...] with node spec as in
    _tree_column (the reference's JSON model layout).
    """
    out = candidates
    for name, col in features.items():
        out = out.withColumn(name, col)
    score = None
    for t in trees:
        contrib = F.lit(float(t.get("weight", 1.0))) * _tree_column(
            t["root"]
        )
        score = contrib if score is None else score + contrib
    return (
        out.withColumn("ltr_score", score)
        .orderBy(F.desc("ltr_score"), F.asc(order_tiebreak))
        .limit(k)
    )


def gbt_to_ltr_trees(model) -> list[dict]:
    """Convert a trained spark.ml GBTRegressionModel into the
    ltr_trees_rescore node format (training happens outside Solr — any
    LambdaMART/GBT trainer produces the ensemble the evaluator consumes;
    spark.ml's GBTRegressor slots in natively here).

    Feature names are taken positionally as the training VectorAssembler
    input columns, passed via model._ltr_feature_names or read from the
    assembler metadata by the caller."""
    names = getattr(model, "_ltr_feature_names", None)
    if names is None:
        raise ValueError(
            "set model._ltr_feature_names = [<assembler input cols>]"
        )

    def node_to_dict(node):
        # spark.ml InternalNode/LeafNode (py4j wrappers)
        jn = node
        if jn.numDescendants() == 0:
            return {"value": float(jn.prediction())}
        split = jn.split()
        feat = names[split.featureIndex()]
        thr = float(split.threshold())
        return {
            "feature": feat,
            "threshold": thr,
            "left": node_to_dict(jn.leftChild()),
            "right": node_to_dict(jn.rightChild()),
        }

    out = []
    for tree, w in zip(model.trees, model.treeWeights):
        root = tree._call_java("rootNode")
        out.append({"weight": float(w), "root": node_to_dict(root)})
    return out


def suggest_infix(
    suggestions: DataFrame, typed: str, k: int = 10
) -> DataFrame:
    """AnalyzingInfixSuggester (lucene/suggest/.../analyzing/
    AnalyzingInfixSuggester.java): match multi-word suggestions where the
    typed text prefixes ANY token of the suggestion — "infix" completion,
    e.g. typing `spee` surfaces "corpus speed test" — ranked by stored
    weight desc then suggestion. Lucene backs this with an auxiliary
    index whose terms are the suggestion tokens; here the suggestion
    table is scanned with an any-token-startswith predicate (narrow, no
    shuffle) and top-k via TakeOrderedAndProject. Expects
    (suggestion, weight) rows."""
    t = typed.lower()
    hit = F.exists(
        F.split(F.lower("suggestion"), " "),
        lambda tok: tok.startswith(t),
    )
    return (
        suggestions.filter(hit)
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
        .select("suggestion", "weight")
    )


def suggest_prefix_context(
    tokens: DataFrame, prefix: str, contexts: list, k: int = 10
) -> DataFrame:
    """ContextSuggestField / ContextQuery (lucene/suggest/.../document/
    ContextQuery.java): prefix suggestions filtered to the given contexts
    BEFORE ranking — context is an index-time facet on each suggestion
    entry; only entries whose context matches contribute weight. Token
    table must carry a `context` column (e.g. lang)."""
    return (
        tokens.filter(
            F.col("context").isin(list(contexts))
            & F.col("term").startswith(prefix)
        )
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
    )


def free_text_suggest(
    tokens: DataFrame, typed: str, k: int = 10, alpha: float = 0.4
) -> DataFrame:
    """FreeTextSuggester (lucene/suggest/.../analyzing/FreeTextSuggester
    .java): completion from an n-gram language model with "stupid
    backoff" (Brants et al. 2007; Lucene's ALPHA = 0.4). The typed
    text's trailing partial token is the prefix to complete; the token
    before it is the context. Candidates with a (context, w) bigram
    score c2(ctx,w)/c1(ctx); the rest back off to alpha * c1(w)/T.
    This is the order-2 chain of Lucene's default trigram model
    (documented subset). tokens: (doc_id, term, pos)."""
    parts = [t for t in typed.split(" ") if t]
    trailing_space = typed.endswith(" ")
    if not parts:
        # empty / whitespace-only input: no prefix, no context — fall
        # through to the unigram top-k (FreeTextSuggester returns the
        # highest-weight completions when nothing is typed).
        prefix, ctx = "", None
    else:
        prefix = "" if trailing_space else parts[-1]
        ctx = (
            parts[-1]
            if trailing_space
            else (parts[-2] if len(parts) >= 2 else None)
        )
    uni = tokens.groupBy("term").agg(F.count("*").alias("c1"))
    total = tokens.count()
    cand = uni.filter(F.col("term").startswith(prefix)) if prefix else uni
    if ctx is not None:
        ctx_pos = tokens.filter(F.col("term") == ctx).select(
            "doc_id", (F.col("pos") + 1).alias("pos")
        )
        c1_ctx = ctx_pos.count()
        big = (
            tokens.join(ctx_pos, ["doc_id", "pos"])
            .groupBy("term")
            .agg(F.count("*").alias("c2"))
        )
        cand = cand.join(big, "term", "left")
        score = F.when(
            F.col("c2").isNotNull() & (F.lit(c1_ctx) > 0),
            F.col("c2") / F.lit(float(max(c1_ctx, 1))),
        ).otherwise(F.lit(alpha) * F.col("c1") / F.lit(float(total)))
    else:
        score = F.col("c1") / F.lit(float(total))
    return (
        cand.select("term", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
        .select("term", F.round("score", 6).alias("score"))
    )


def word_break_suggest(
    tokens: DataFrame,
    input_term: str,
    min_freq: int = 1,
    min_break_length: int = 2,
    k: int = 10,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks (lucene/suggest/.../spell/
    WordBreakSpellChecker.java ≈L100): split a run-together input into
    two dictionary words. One split point per suggestion (Lucene's
    maxChanges=1 tier); both halves must exist in the terms dictionary
    with df >= min_freq and length >= min_break_length. Ranked by
    combined df desc (Lucene's SuggestMode + freq ordering), split
    position asc as the tiebreak.

    Spark shape: the split-point table is a tiny literal relation
    (len(input)-1 rows) built with explode over a lit array; both
    dictionary probes are joins against the terms aggregate, so the
    dictionary is scanned once and Catalyst broadcasts the literal side.
    """
    n = len(input_term)
    splits = [
        (i, input_term[:i], input_term[i:])
        for i in range(min_break_length, n - min_break_length + 1)
    ]
    if not splits:
        spark = tokens.sparkSession
        return spark.createDataFrame(
            [], "split_at int, left string, right string, combined_df bigint"
        )
    spark = tokens.sparkSession
    cand = spark.createDataFrame(splits, ["split_at", "left", "right"])
    dic = (
        tokens.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_freq)
    )
    lj = cand.join(dic.withColumnRenamed("term", "left"), "left")
    rj = lj.join(
        dic.select(
            F.col("term").alias("right"), F.col("df").alias("df_r")
        ),
        "right",
    )
    return (
        rj.select(
            "split_at",
            "left",
            "right",
            (F.col("df") + F.col("df_r")).alias("combined_df"),
        )
        .orderBy(F.desc("combined_df"), F.asc("split_at"))
        .limit(k)
    )


def word_combine_suggest(
    tokens: DataFrame,
    query_terms: list[str],
    min_freq: int = 1,
    k: int = 10,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations (WordBreakSpellChecker
    .java ≈L180): for each ADJACENT pair of query terms, suggest the
    concatenation when it exists in the terms dictionary with df >=
    min_freq. Ranked by the combination's df desc, pair position asc.

    The pair table is a literal relation (len(query)-1 rows); one join
    against the terms aggregate resolves every pair in a single pass."""
    pairs = [
        (i, query_terms[i], query_terms[i + 1],
         query_terms[i] + query_terms[i + 1])
        for i in range(len(query_terms) - 1)
    ]
    spark = tokens.sparkSession
    if not pairs:
        return spark.createDataFrame(
            [], "pair_at int, left string, right string, combined string,"
            " df bigint"
        )
    cand = spark.createDataFrame(
        pairs, ["pair_at", "left", "right", "combined"]
    )
    dic = (
        tokens.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_freq)
    )
    return (
        cand.join(dic.withColumnRenamed("term", "combined"), "combined")
        .select("pair_at", "left", "right", "combined", "df")
        .orderBy(F.desc("df"), F.asc("pair_at"))
        .limit(k)
    )


def suggest_blended_infix(
    tokens: DataFrame,
    query: str,
    k: int = 10,
    num_factor: int = 10,
) -> DataFrame:
    """BlendedInfixSuggester (lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java ≈L60, BlenderType.POSITION_LINEAR): infix
    suggester whose weight is scaled by WHERE in the suggestion the match
    occurs — coefficient (1 - 0.10 * min_position) floored at 0.1 (the
    POSITION_LINEAR calculateCoefficient), so suggestions matching the
    query token earlier rank higher at equal weight. Suggestions here are
    documents (weight = doc length as a deterministic stand-in for the
    stored weight field); the blended score is weight * coefficient.

    Spark shape: one filtered aggregation over the token table (min
    matching position + doc length per doc) — single exchange, top-k via
    TakeOrderedAndProject. Lucene over-fetches num_factor * k before
    re-sorting by blended score; the aggregate computes exact blended
    scores so the over-fetch is unnecessary (documented simplification,
    same final top-k)."""
    hit_pos = F.min(
        F.when(F.col("term") == query, F.col("pos") - 1)
    ).alias("min_pos")
    per_doc = (
        tokens.groupBy("doc_id")
        .agg(hit_pos, F.count("*").alias("weight"))
        .filter(F.col("min_pos").isNotNull())
    )
    coef = F.greatest(
        F.lit(0.1), F.lit(1.0) - F.lit(0.10) * F.col("min_pos")
    )
    return (
        per_doc.select(
            "doc_id",
            "weight",
            F.col("min_pos").cast("int").alias("min_pos"),
            F.round(F.col("weight") * coef, 6).alias("blended"),
        )
        .orderBy(F.desc("blended"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(ranked: list, k0: int = 60, k: int = 10):
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR'09) — the
    standard hybrid lexical+vector combiner: score(d) = Σ_lists
    1/(k0 + rank_d(list)), docs absent from a list contribute nothing.
    Inputs: DataFrames of (doc_id, rank), rank 1-based. Union + ONE agg
    keyed on doc_id; at 10^12 docs each list is already a top-N (tiny),
    so the fusion is a broadcast-scale job regardless of corpus size."""
    from functools import reduce

    u = reduce(
        lambda a, b: a.unionByName(b),
        [r.select("doc_id", "rank") for r in ranked],
    )
    fused = u.groupBy("doc_id").agg(
        F.sum(1.0 / (F.lit(float(k0)) + F.col("rank"))).alias("rrf")
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("rrf", 6).alias("rrf"))
    )


def ltr_normalize_features(
    candidates: DataFrame,
    features: dict,
    normalizers: dict,
) -> DataFrame:
    """LTR feature normalizers (solr/contrib/ltr/.../norm/
    MinMaxNormalizer.java ≈L30, StandardNormalizer.java ≈L30): each
    feature column is rescaled before the model sees it —
    minmax: (f - min) / (max - min); standard: (f - avg) / std.
    The normalization constants come from ONE agg over the candidate
    set (in Solr they're stored with the feature store; here they are
    computed at rescoring time over the rerank window, which is the
    top-N candidate set — a small broadcast, never a full-table pass)."""
    out = candidates
    for name, col in features.items():
        out = out.withColumn(name, col)
    aggs = []
    for name, kind in normalizers.items():
        if kind == "minmax":
            aggs += [F.min(name).alias(f"_{name}_lo"),
                     F.max(name).alias(f"_{name}_hi")]
        elif kind == "standard":
            aggs += [F.avg(name).alias(f"_{name}_mu"),
                     F.stddev_samp(name).alias(f"_{name}_sd")]
    stats = out.agg(*aggs)
    out = out.crossJoin(F.broadcast(stats))
    for name, kind in normalizers.items():
        if kind == "minmax":
            lo, hi = F.col(f"_{name}_lo"), F.col(f"_{name}_hi")
            out = out.withColumn(
                name,
                F.when(hi > lo, (F.col(name) - lo) / (hi - lo)).otherwise(0.0),
            )
        elif kind == "standard":
            mu, sd = F.col(f"_{name}_mu"), F.col(f"_{name}_sd")
            out = out.withColumn(
                name,
                F.when(sd > 0, (F.col(name) - mu) / sd).otherwise(0.0),
            )
    return out.drop(*[c for c in out.columns if c.startswith("_")])
