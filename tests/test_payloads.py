"""Payload family: DelimitedPayloadTokenFilter parse, PayloadScoreQuery
functions, SpanPayloadCheck (operators/payloads.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.payloads import (
    delimited_payload_tokens,
    payload_score,
    span_payload_check,
)


@pytest.fixture(scope="module")
def ptokens(spark):
    df = spark.createDataFrame(
        [
            (1, "red|2.5 apple fox|0.5 red|1.0"),
            (2, "red apple|3.0"),
            (3, "fox red|4.0 jumps|1.5"),
        ],
        "doc_id long, text string",
    )
    return delimited_payload_tokens(df).cache()


def test_delimited_parse_and_default(ptokens):
    rows = {
        (r["doc_id"], r["pos"]): (r["term"], r["payload"])
        for r in ptokens.collect()
    }
    assert rows[(1, 0)] == ("red", 2.5)
    assert rows[(1, 1)] == ("apple", 1.0)  # no delimiter -> default
    assert rows[(1, 2)] == ("fox", 0.5)
    assert rows[(1, 3)] == ("red", 1.0)
    assert rows[(2, 0)] == ("red", 1.0)
    assert rows[(3, 1)] == ("red", 4.0)


@pytest.mark.parametrize(
    "fn,want",
    [
        ("min", {1: 1.0, 2: 1.0, 3: 4.0}),
        ("max", {1: 2.5, 2: 1.0, 3: 4.0}),
        ("avg", {1: 1.75, 2: 1.0, 3: 4.0}),
        ("sum", {1: 3.5, 2: 1.0, 3: 4.0}),
    ],
)
def test_payload_functions(ptokens, fn, want):
    got = {
        r["doc_id"]: r["score"]
        for r in payload_score(ptokens, "red", fn=fn).collect()
    }
    assert got == pytest.approx(want)


def test_include_span_score_multiplies(ptokens, spark):
    span = spark.createDataFrame(
        [(1, 2.0), (2, 0.5), (3, 10.0)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in payload_score(
            ptokens, "red", fn="sum", span_scores=span
        ).collect()
    }
    assert got == pytest.approx({1: 7.0, 2: 0.5, 3: 40.0})


def test_span_payload_check(ptokens):
    # span "red apple": doc1 has it at (0,1) with red payload 2.5;
    # doc2 at (0,1) with red payload 1.0 (default).
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_payload_check(
            ptokens, ["red", "apple"], [2.5, None]
        ).collect()
    }
    assert got == {1: 1}
    got2 = {
        r["doc_id"]: r["n_matches"]
        for r in span_payload_check(
            ptokens, ["red", "apple"], [None, None]
        ).collect()
    }
    assert got2 == {1: 1, 2: 1}
    # payload constraint on the second slot too
    got3 = {
        r["doc_id"]: r["n_matches"]
        for r in span_payload_check(
            ptokens, ["red", "apple"], [None, 3.0]
        ).collect()
    }
    assert got3 == {2: 1}


def test_parse_is_narrow_zero_shuffle(ptokens, spark):
    df = spark.createDataFrame([(1, "a|1.0 b")], "doc_id long, text string")
    plan = (
        delimited_payload_tokens(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
