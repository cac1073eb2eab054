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


def test_zscore_population_properties(spark):
    """Per type: mean of z is ~0, outliers are a small minority, and
    every |z|>3 row is flagged (and only those)."""
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.registry import (
        QUERIES,
        load_all_queries,
    )
    from tests.conftest import SF_TEST

    load_all_queries()
    df = QUERIES["dq_outlier_zscore"](spark, SF_TEST)
    stats = df.groupBy("event_type").agg(
        F.avg("z").alias("mean_z"),
        F.avg(F.col("is_outlier").cast("double")).alias("frac_out"),
    )
    for r in stats.collect():
        assert abs(r["mean_z"]) < 1e-9
        assert r["frac_out"] < 0.05
    mismatch = df.filter(
        (F.abs(F.col("z")) > 3) != F.col("is_outlier")
    ).count()
    assert mismatch == 0
