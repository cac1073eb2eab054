"""Physical-plan inspection: the helpers tests/test_plans.py uses to pin
broadcast/shuffle/pushdown/pruning properties of the executed plans."""

from databricks_feature_store_poc_spark.plans.inspect import (
    count_broadcast_joins,
    count_exchanges,
    has_partial_aggregate,
    physical_plan,
    pushed_filters,
    scan_read_schema,
    simple_plan,
    whole_stage_codegen_spans,
)

__all__ = [
    "count_broadcast_joins",
    "count_exchanges",
    "has_partial_aggregate",
    "physical_plan",
    "pushed_filters",
    "scan_read_schema",
    "simple_plan",
    "whole_stage_codegen_spans",
]
