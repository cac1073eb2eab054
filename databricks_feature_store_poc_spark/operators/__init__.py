"""Relational operator suite, rolling-window features, incremental rollup
maintenance, and skew mitigation utilities."""

from databricks_feature_store_poc_spark.operators.rolling import rolling_range_sum
from databricks_feature_store_poc_spark.operators.rollup_maintenance import (
    build_rollup,
    merge_rollup,
    rollup_to_features,
)
from databricks_feature_store_poc_spark.operators.skew import salted_join

__all__ = [
    "rolling_range_sum",
    "build_rollup",
    "merge_rollup",
    "rollup_to_features",
    "salted_join",
]
