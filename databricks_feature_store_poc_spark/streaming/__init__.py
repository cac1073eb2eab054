"""Streaming window semantics (batch-checkable queries) and true
Structured Streaming runners (availableNow parity paths + custom state
via applyInPandasWithState)."""

from databricks_feature_store_poc_spark.streaming.windows import (
    run_session_stream,
    run_sliding_stream,
    run_stateful_counter_stream,
    run_tumbling_stream,
)

__all__ = [
    "run_session_stream",
    "run_sliding_stream",
    "run_stateful_counter_stream",
    "run_tumbling_stream",
]
