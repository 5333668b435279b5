"""Plan-shape assertions for the TPC-H tier: the properties that keep
these queries viable at a 100x fact-table scale-up — dimension sides
broadcast (no shuffle of small tables), and the number of wide
exchanges bounded by the plan's irreducible shuffle count.

These are the same checks scripts/plan_audit.py makes for the engine
paths, pinned as tests for the relational tier."""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _n_exchanges(plan: str) -> int:
    # count distinct Exchange hashpartitioning operators (AQE may reuse)
    return len(re.findall(r"Exchange hashpartitioning", plan))


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # Q5: one lineitem x orders shuffle + final agg exchange; all
        # dims broadcast
        ("tpch_q5_local_supplier", 3),
        # Q8: same fact-fact core, share agg on o_year
        ("tpch_q8_market_share", 3),
        # Q10: fact x filtered orders + top-20 agg
        ("tpch_q10_returned_items", 3),
        # Q14: single broadcast join + scalar agg — NO hash exchange on
        # the fact side at all
        ("tpch_q14_promo_effect", 1),
        # Q6: pure scan + scalar agg — no wide exchange
        ("tpch_q6_forecast_revenue", 0),
    ],
)
def test_tpch_broadcast_and_exchange_budget(spark, name, max_exchanges):
    plan = _plan(spark, name)
    if name != "tpch_q6_forecast_revenue":
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
            name,
            plan[:2000],
        )
    assert _n_exchanges(plan) <= max_exchanges, (
        name,
        _n_exchanges(plan),
        plan[:2000],
    )


def test_tpch_q6_filters_pushed_to_scan(spark):
    """Q6's three predicates must reach the parquet reader
    (PushedFilters), and the scan must not read money columns it does
    not need (ReadSchema pruned)."""
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan[:2000]
    pushed = m.group(1)
    assert "l_shipdate" in pushed and "l_discount" in pushed, pushed
    m2 = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m2, plan[:1500]
    cols = m2.group(1)
    assert "l_extendedprice" in cols and "l_orderkey" not in cols, cols


def test_tpch_q21_semi_anti_join_shapes(spark):
    """Q21's EXISTS/NOT-EXISTS must compile to semi/anti joins, never to
    a correlated re-scan per row."""
    plan = _plan(spark, "tpch_q21_waiting_suppliers")
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
