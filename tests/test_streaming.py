"""Batch vs true-streaming parity (SURVEY §7 M6).

Structured Streaming incrementalizes the same Catalyst plan, so running
the tumbling/session aggregations through readStream + availableNow must
produce exactly the batch results.
"""

from __future__ import annotations

from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from databricks_feature_store_poc_spark.streaming.windows import (
    run_session_stream,
    run_tumbling_stream,
)
from tests.conftest import SF_SMOKE

load_all_queries()


def _rowset(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark):
    batch = QUERIES["stream_tumbling"](spark, SF_SMOKE)
    stream = run_tumbling_stream(spark, SF_SMOKE)
    cols = ["win_start", "win_end", "event_type", "n", "sum_value"]
    assert _rowset(stream, cols) == _rowset(batch, cols)


def test_session_stream_equals_batch_up_to_watermark(spark):
    """Append-mode session output emits only sessions CLOSED before the
    final watermark (max event time - 10min); sessions still open in state
    when the stream drains are withheld — that is the semantics, not a
    bug. The stream result must equal exactly the batch sessions whose
    end precedes the final watermark."""
    import datetime

    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    batch = QUERIES["stream_session"](spark, SF_SMOKE)
    stream = run_session_stream(spark, SF_SMOKE)
    max_ts = load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - datetime.timedelta(minutes=10)
    closed = batch.filter(F.col("session_end") <= F.lit(watermark))
    cols = ["user_id", "session_start", "session_end", "n"]
    stream_rows = _rowset(stream, cols)
    assert stream_rows, "stream emitted no closed sessions"
    assert stream_rows == _rowset(closed, cols)
