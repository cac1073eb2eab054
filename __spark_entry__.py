"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``databricks_feature_store_poc_spark.registry`` — every
operator from SURVEY.md §2 registers itself there with its DuckDB oracle
adjacent to the Spark implementation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import (  # noqa: E402
    ensure_session_confs,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's training-set assembly (J1: spine LEFT JOIN broadcast
    feature tables; SURVEY.md §3 E2) transposed onto the testdata star
    schema.
    """
    ensure_session_confs(spark)
    load_all_queries()
    return QUERIES["training_set_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "query_name", fn.__name__)
        return run

    return {name: _wrap(fn) for name, fn in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    load_all_queries()
    return dict(ORACLES)
