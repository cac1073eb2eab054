"""Unit tests for the data-quality expectations gate (featurestore/quality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.quality import (
    Expectation,
    check_referential,
    check_table,
    duplicate_pk_violations,
    null_violations,
)
from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_TEST

load_all_queries()


def test_check_table_catches_injected_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (3, "d")], "id long, v string"
    )
    out = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in check_table(
            df,
            [
                Expectation("pk_unique", duplicate_pk_violations("id")),
                Expectation("v_not_null", null_violations("v")),
            ],
        ).collect()
    }
    assert out["pk_unique"] == (1.0, False)  # one duplicate id
    assert out["v_not_null"] == (1.0, False)  # one null v


def test_check_table_single_pass_plan(spark):
    """All checks on one table must fold into one aggregate: no joins,
    one scan of the input."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    plan = physical_plan(
        check_table(
            df,
            [
                Expectation("pk_unique", duplicate_pk_violations("id")),
                Expectation("v_not_null", null_violations("v")),
            ],
        )
    )
    assert "Join" not in plan


def test_check_referential_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    row = check_referential(fact, "k", dim, "dk", "fk").collect()[0]
    assert row["metric"] == 1.0 and not row["passed"]


def test_dq_expectations_all_pass_on_warehouse(spark):
    rows = QUERIES["dq_expectations"](spark, SF_TEST).collect()
    assert len(rows) == 7
    assert all(r["passed"] for r in rows), [
        r["check_name"] for r in rows if not r["passed"]
    ]
