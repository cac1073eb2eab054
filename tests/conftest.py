"""Shared pytest fixtures: one SparkSession per test run, sf paths."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_TEST = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from databricks_feature_store_poc_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("pytest", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    yield spark
    spark.stop()
