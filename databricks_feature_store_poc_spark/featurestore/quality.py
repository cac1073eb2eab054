"""Data-quality expectations: the validation gate before a feature table
publishes.

The reference POC's pipeline trusts its inputs (the notebooks load CSVs
and write tables straight through, /root/reference/notebooks/
01_feature_engineering.py); a production feature store runs declared
expectations first and refuses to publish on failure. This module is that
gate: declarative checks evaluated as ONE Spark plan per table scan,
reported as a relation (check_name, metric, passed) so the results
themselves are queryable/joinable/storable.

Scale: every per-table check family (PK uniqueness + null counts + value
ranges) folds into a single aggregate over one scan — adding a check adds
a column to the aggregate, not a pass over the data. Referential checks
are left-anti joins that broadcast the dimension side when small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


@dataclass(frozen=True)
class Expectation:
    """One named check: `violations` counts offending rows (0 = pass)."""

    name: str
    violations: Column


def check_table(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations on `df` in ONE aggregate pass.

    Returns (check_name, metric, passed) — metric is the violation count
    as DOUBLE, passed is metric == 0. stack() pivots the single aggregate
    row into one row per check without a second scan.
    """
    agg = df.agg(
        *[e.violations.cast("double").alias(e.name) for e in expectations]
    )
    n = len(expectations)
    pairs = ", ".join(f"'{e.name}', `{e.name}`" for e in expectations)
    return agg.select(
        F.expr(f"stack({n}, {pairs}) AS (check_name, metric)")
    ).withColumn("passed", F.col("metric") == 0)


def check_referential(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Orphaned-key check as a left-anti join (dim side broadcastable)."""
    orphans = fact.join(
        F.broadcast(dim.select(dim_key)),
        fact[fact_key] == F.col(dim_key),
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).cast("double").alias("metric"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )


def null_violations(col: str) -> Column:
    return F.count(F.lit(1)) - F.count(F.col(col))


def duplicate_pk_violations(col: str) -> Column:
    return F.count(F.lit(1)) - F.countDistinct(F.col(col))


@query(
    "dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE) AS metric,
           COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(COUNT(*) - COUNT(o_custkey) AS DOUBLE),
           COUNT(*) - COUNT(o_custkey) = 0
    FROM orders
    UNION ALL
    SELECT 'customer_acctbal_not_null',
           CAST(COUNT(*) - COUNT(c_acctbal) AS DOUBLE),
           COUNT(*) - COUNT(c_acctbal) = 0
    FROM customer
    UNION ALL
    SELECT 'events_value_non_negative',
           CAST(COUNT(*) FILTER (WHERE value < 0) AS DOUBLE),
           COUNT(*) FILTER (WHERE value < 0) = 0
    FROM events
    UNION ALL
    SELECT 'documents_n_chars_consistent',
           CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS DOUBLE),
           COUNT(*) FILTER (WHERE n_chars <> length(text)) = 0
    FROM documents
    UNION ALL
    SELECT 'orders_customer_fk',
           CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_orders_fk',
           CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse's standing expectation suite as one relation:
    PK uniqueness and null/range/consistency checks fold into one
    aggregate per table scan; the two referential checks are anti-joins
    with the dimension side broadcast. All seven results union into a
    single plan — a downstream publisher joins on passed = false to
    block a release."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")

    orders_checks = check_table(
        o,
        [
            Expectation("orders_pk_unique", duplicate_pk_violations("o_orderkey")),
            Expectation("orders_custkey_not_null", null_violations("o_custkey")),
        ],
    )
    customer_checks = check_table(
        c, [Expectation("customer_acctbal_not_null", null_violations("c_acctbal"))]
    )
    events_checks = check_table(
        e,
        [
            Expectation(
                "events_value_non_negative",
                F.count(F.when(F.col("value") < 0, 1)),
            )
        ],
    )
    documents_checks = check_table(
        d,
        [
            Expectation(
                "documents_n_chars_consistent",
                F.count(F.when(F.col("n_chars") != F.length("text"), 1)),
            )
        ],
    )
    fk1 = check_referential(o, "o_custkey", c, "c_custkey", "orders_customer_fk")
    fk2 = check_referential(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey",
                            "lineitem_orders_fk")
    return (
        orders_checks.unionByName(customer_checks)
        .unionByName(events_checks)
        .unionByName(documents_checks)
        .unionByName(fk1)
        .unionByName(fk2)
    )
