"""Driver-contract gate (mimics the driver): every queries()[name] must match
its oracle_sql()[name] via DuckDB — row-count + schema + order-insensitive
values — at sf0.001. (The driver runs the same at sf0.01.)"""

import pytest

import __spark_entry__ as entry
from lucene_solr_spark.driver_check import _duck, compare_one

SF_DIR = "/root/testdata/sf0.001"

QS = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    return _duck(SF_DIR)


@pytest.mark.parametrize("name", sorted(QS))
def test_entry_query_matches_oracle(spark, duck, name):
    r = compare_one(spark, duck, name, QS[name], ORACLES.get(name), SF_DIR)
    if r["status"] == "rows_only":
        assert r["rows"] >= 1, r
    else:
        assert r["status"] == "ok", r


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score"]
