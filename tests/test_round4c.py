"""Round-4 tranche-C internals: gamma CDF, monteCarlo, fft, dbscan,
markovChain — differential oracles for the non-SQL-expressible parts."""

import math

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_gammainc_shape1_is_exponential():
    from lucene_solr_spark.operators.matheval import _gammainc_p

    # P(1, x/θ) == 1 - exp(-x/θ) exactly (shape=1 gamma == exponential)
    for x in (0.0, 0.1, 0.5, 1.0, 2.5, 7.0, 30.0):
        assert _gammainc_p(1.0, x) == pytest.approx(
            1.0 - math.exp(-x), abs=1e-12
        )


def test_gammainc_monotone_and_bounds():
    from lucene_solr_spark.operators.matheval import _gammainc_p

    for a in (0.5, 2.0, 5.0, 9.3):
        prev = -1.0
        for x in np.linspace(0.0, 40.0, 200):
            v = _gammainc_p(a, float(x))
            assert 0.0 <= v <= 1.0
            assert v >= prev - 1e-12
            prev = v
        assert _gammainc_p(a, 500.0) == pytest.approx(1.0, abs=1e-9)


def test_gammainc_halfint_vs_erf():
    from lucene_solr_spark.operators.matheval import _gammainc_p

    # P(1/2, x) = erf(sqrt(x)) — an independent closed form
    for x in (0.01, 0.3, 1.0, 4.0, 9.0):
        assert _gammainc_p(0.5, x) == pytest.approx(
            math.erf(math.sqrt(x)), abs=1e-10
        )


def test_monte_carlo_accuracy_and_determinism(spark):
    from lucene_solr_spark.operators.matheval import monte_carlo_mean

    r1 = monte_carlo_mean(spark, n=100_000, seed=42).collect()[0]
    r2 = monte_carlo_mean(spark, n=100_000, seed=42).collect()[0]
    # E[X·Y] = μ_X · E[Y] = 10 · 1 = 10; stderr ≈ sqrt(Var)/sqrt(n) ≈ 0.02
    assert r1["mc_mean"] == pytest.approx(10.0, abs=0.15)
    assert r1["mc_mean"] == r2["mc_mean"]  # seeded: bit-identical
    assert r1["n_samples"] == 100_000


def test_fft_matches_direct_dft(spark):
    from lucene_solr_spark.operators.matheval import fft_magnitudes

    rng = np.random.default_rng(5)
    y = rng.normal(size=33)
    df = spark.createDataFrame(
        [(float(i), float(v)) for i, v in enumerate(y)], "t double, n double"
    )
    got = {
        r["freq_bin"]: r["magnitude"]
        for r in fft_magnitudes(df, "t", "n").collect()
    }
    n = len(y)
    for k in range(n // 2 + 1):
        direct = abs(
            sum(y[j] * np.exp(-2j * np.pi * k * j / n) for j in range(n))
        )
        assert got[k] == pytest.approx(direct, abs=1e-4)


def _ref_dbscan(X, eps, min_pts):
    """Textbook reference DBSCAN (numpy, quadratic)."""
    n = len(X)
    D = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=2)
    nbrs = [np.where(D[i] <= eps)[0] for i in range(n)]  # includes self
    core = np.array([len(nb) >= min_pts for nb in nbrs])
    label = -np.ones(n, dtype=int)
    # components over core-core edges, cluster id = min member id
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in nbrs[i]:
            if core[j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    for i in range(n):
        if core[i]:
            label[i] = find(i)
    # min member id labelling
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
    for i in range(n):
        if core[i]:
            label[i] = comp_min[find(i)]
    # border: smallest neighboring core cluster
    for i in range(n):
        if core[i]:
            continue
        cand = [label[j] for j in nbrs[i] if core[j]]
        if cand:
            label[i] = min(cand)
    return core, label


def test_dbscan_matches_reference(spark):
    from lucene_solr_spark.operators.ml import dbscan_embeddings

    rng = np.random.default_rng(9)
    # three separated blobs + scatter noise
    X = np.vstack(
        [
            rng.normal((0, 0), 0.3, (30, 2)),
            rng.normal((5, 5), 0.3, (30, 2)),
            rng.normal((0, 6), 0.3, (30, 2)),
            rng.uniform(-3, 9, (15, 2)),
        ]
    )
    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    eps, min_pts = 0.8, 4
    got = {
        r["id"]: (r["is_core"], r["cluster"])
        for r in dbscan_embeddings(df, eps=eps, min_pts=min_pts).collect()
    }
    # the Spark column is array<float>: the reference must see the same
    # float32-truncated coordinates or near-threshold pairs disagree
    Xf = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    core, label = _ref_dbscan(Xf, eps, min_pts)
    assert len(got) == len(X)
    for i in range(len(X)):
        assert got[i][0] == bool(core[i]), f"core flag {i}"
        assert got[i][1] == int(label[i]), f"cluster {i}"
    # sanity: the three blobs produced ≥3 distinct clusters
    assert len({c for _, c in got.values() if c >= 0}) >= 3


def test_markov_two_step_row_stochastic(spark):
    from lucene_solr_spark.operators.matheval import markov_two_step

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = markov_two_step(ev).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], 0.0)
        by_src[r["src"]] += r["p_two_step"]
    for src, tot in by_src.items():
        assert tot == pytest.approx(1.0, abs=1e-6), src


def _ref_nfa_freq(tokens, transitions, accept):
    """Reference NFA: for each start position, BFS over (pos, state)."""
    by_src = {}
    for s, t, d in transitions:
        by_src.setdefault(s, []).append((t, d))
    n = len(tokens)
    count = 0
    for start in range(n):
        states = {0}
        pos = start
        matched = False
        while states and pos < n:
            nxt = set()
            for st in states:
                for t, d in by_src.get(st, []):
                    if t is None or t == tokens[pos]:
                        nxt.add(d)
            pos += 1
            if nxt & set(accept):
                matched = True
                break
            states = nxt
        if matched:
            count += 1
    return count


def test_term_automaton_matches_reference_nfa(spark):
    """Randomized differential: the distributed NFA must agree with a
    per-doc Python NFA on random automatons over a random tiny corpus
    (incl. ANY transitions and branching)."""
    import random

    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.spans import term_automaton_query

    rng = random.Random(13)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, [rng.choice(vocab) for _ in range(rng.randrange(3, 12))])
        for i in range(40)
    ]
    rows = [
        (doc_id, term, pos + 1)
        for doc_id, toks in docs
        for pos, term in enumerate(toks)
    ]
    tok = spark.createDataFrame(rows, "doc_id long, term string, pos int")
    for trial in range(6):
        n_states = rng.randrange(2, 5)
        transitions = []
        for _ in range(rng.randrange(2, 7)):
            s = rng.randrange(0, n_states)
            d = rng.randrange(1, n_states)
            t = rng.choice(vocab + [None])
            transitions.append((s, t, d))
        # ensure at least one transition out of the start state
        transitions.append((0, rng.choice(vocab), rng.randrange(1, n_states)))
        accept = [n_states - 1]
        got = {
            r["doc_id"]: r["freq"]
            for r in term_automaton_query(
                tok, transitions, accept, max_steps=12
            ).collect()
        }
        for doc_id, toks in docs:
            want = _ref_nfa_freq(toks, transitions, accept)
            assert got.get(doc_id, 0) == want, (
                trial, doc_id, toks, transitions, want, got.get(doc_id, 0),
            )


def test_audio_chunk_plan_arithmetic(spark):
    """Stride/clip arithmetic vs a python reference, incl. the NULL
    duration branch and the tail clip."""
    from lucene_solr_spark.pipeline.multimodal import (
        audio_chunk_plan,
        synthetic_media,
    )
    from pyspark.sql import functions as F

    media = synthetic_media(spark, 30).withColumn(
        "duration_ms",
        F.when(
            (F.col("kind") == "audio") & (F.col("media_id") != 1),
            (F.lit(3500) + F.col("media_id") * 211 % 15000).cast("int"),
        ).otherwise(F.col("duration_ms")),
    )
    chunk_ms, overlap = 5000, 500
    stride = chunk_ms - overlap
    rows = audio_chunk_plan(media, chunk_ms, overlap).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["start_ms"], r["end_ms"])
        )
    audio_ids = [i for i in range(30) if i % 3 == 1]
    assert set(got) == set(audio_ids)
    import math

    for mid in audio_ids:
        if mid == 1:
            assert got[mid] == [(0, 0, None)]
            continue
        dur = 3500 + mid * 211 % 15000
        n = max(math.ceil((dur - overlap) / stride), 1)
        want = []
        for k in range(n):
            start = k * stride
            want.append((k, start, min(start + chunk_ms, dur)))
        assert sorted(got[mid]) == want, (mid, dur, got[mid], want)
        # overlap property: next chunk starts before previous ends
        for (k1, s1, e1), (k2, s2, e2) in zip(want, want[1:]):
            assert s2 < e1
        # coverage property: last chunk reaches the duration
        assert want[-1][2] == dur


def test_keyword_repeat_porter_golden():
    from lucene_solr_spark.analysis import keyword_repeat_porter

    assert keyword_repeat_porter("Running quickly tests") == [
        ("running", 0), ("run", 0),
        ("quickly", 1), ("quickli", 1),
        ("tests", 2), ("test", 2),
    ]
    # identity stems deduplicate (RemoveDuplicatesTokenFilter)
    assert keyword_repeat_porter("run fast") == [("run", 0), ("fast", 1)]
    assert keyword_repeat_porter("") == []


def test_length_limit_trim_filters():
    from lucene_solr_spark.analysis import (
        length_filter,
        limit_token_count,
        trim_filter,
    )

    assert length_filter(["ab", "abc", "x" * 9], 3, 8) == ["abc"]
    assert limit_token_count(list(range(10)), 3) == [0, 1, 2]
    assert trim_filter("\t a b \n") == "a b"


def test_elision_filter_spec_vectors():
    from lucene_solr_spark.analysis import elision_filter as e

    assert e("l'avion") == "avion"
    assert e("L'avion") == "avion"          # case-insensitive article
    assert e("jusqu'ici") == "ici"
    assert e("quoiqu'il") == "il"
    assert e("aujourd'hui") == "aujourd'hui"  # not an article
    assert e("d'") == ""
    assert e("avion") == "avion"
    assert e("qu’elle") == "elle"       # U+2019 apostrophe


def test_wb4_tokens_flow_through_build_and_search(spark, tmp_path):
    """End-to-end WB4: a decomposed-accent token ("cafe" + U+0301) and a
    soft-hyphen joined token survive the FULL pipeline — vectorized
    analyzer, packed index build, term stats, BM25 search — and are
    found by a query in the same surface form."""
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher

    cafe = "café"          # -> café (one token, mark kept)
    softh = "ware­house"    # -> one token incl. soft hyphen
    rows = [
        (
            f"http://e/{i}",
            f"{cafe} menu prices" if i % 2 == 0 else f"{softh} stock level",
            "en",
        )
        for i in range(20)
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path / "wb4idx")
    build_index(spark, pages, out, profile="standard", num_buckets=2)
    s = Searcher(read_index(spark, out))
    hits1 = s.search(cafe, k=20).collect()
    assert len(hits1) == 10, hits1
    hits2 = s.search(softh, k=20).collect()
    assert len(hits2) == 10, hits2
    # the split forms must NOT match the joined token
    assert s.search("warehouse", k=5).count() == 0
    assert s.search("cafe", k=5).count() == 0
