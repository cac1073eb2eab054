"""Central query registry: name -> (Spark callable, optional DuckDB oracle).

Every operator from SURVEY.md §2 lands here via the ``@query`` decorator so
``__spark_entry__.queries()`` / ``oracle_sql()`` stay thin. Conventions
(driver contract):

- Each callable takes ``(spark, sf_dir)`` and returns a *lazy* DataFrame.
- Every computed/aggregate column is aliased identically in the Spark plan
  and the oracle SQL (the driver sorts columns by name before hashing).
- Double-typed aggregates are rounded on BOTH sides (same literal digits) so
  cross-engine floating-point accumulation order can't flip the value hash.
- Integer-kind outputs are cast so Spark and DuckDB agree (DuckDB's
  ``sum(INT)`` is HUGEINT, ``year()`` is BIGINT, ``floor()`` is DOUBLE...).
- Queries with no total output order still need *deterministic content*:
  any limit/top-k is taken over a total order (unique tiebreak columns).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Any], Any]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check —
    keep those few and give them internal invariants instead
    (SURVEY.md §5).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        fn.query_name = name
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import databricks_feature_store_poc_spark.featurestore.governance  # noqa: F401
    import databricks_feature_store_poc_spark.featurestore.merge  # noqa: F401
    import databricks_feature_store_poc_spark.featurestore.mlpath  # noqa: F401
    import databricks_feature_store_poc_spark.featurestore.quality  # noqa: F401
    import databricks_feature_store_poc_spark.featurestore.queries  # noqa: F401
    import databricks_feature_store_poc_spark.featurestore.versioned  # noqa: F401
    import databricks_feature_store_poc_spark.functions.scalar  # noqa: F401
    import databricks_feature_store_poc_spark.llm.curation  # noqa: F401
    import databricks_feature_store_poc_spark.llm.dedup  # noqa: F401
    import databricks_feature_store_poc_spark.llm.multimodal  # noqa: F401
    import databricks_feature_store_poc_spark.llm.similarity  # noqa: F401
    import databricks_feature_store_poc_spark.llm.text  # noqa: F401
    import databricks_feature_store_poc_spark.llm.vectors  # noqa: F401
    import databricks_feature_store_poc_spark.operators.analytics  # noqa: F401
    import databricks_feature_store_poc_spark.operators.bloom  # noqa: F401
    import databricks_feature_store_poc_spark.operators.entity  # noqa: F401
    import databricks_feature_store_poc_spark.operators.graph  # noqa: F401
    import databricks_feature_store_poc_spark.operators.relational  # noqa: F401
    import databricks_feature_store_poc_spark.operators.rolling  # noqa: F401
    import databricks_feature_store_poc_spark.operators.rollup_maintenance  # noqa: F401
    import databricks_feature_store_poc_spark.operators.skew  # noqa: F401
    import databricks_feature_store_poc_spark.operators.tpch  # noqa: F401
    import databricks_feature_store_poc_spark.operators.zorder  # noqa: F401
    import databricks_feature_store_poc_spark.streaming.windows  # noqa: F401
