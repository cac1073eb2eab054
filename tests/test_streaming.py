"""Batch vs true-streaming parity (SURVEY §7 M6).

Structured Streaming incrementalizes the same Catalyst plan, so running
the tumbling/session aggregations through readStream + availableNow must
produce exactly the batch results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_stateful_counter_matches_batch_groupby(spark):
    """applyInPandasWithState final per-key emission must equal the batch
    group-by totals (update mode: the memory sink's last row per key)."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_stateful_counter_stream,
    )
    from pyspark.sql import functions as F

    out = run_stateful_counter_stream(spark, SF_SMOKE)
    # update-mode sink may hold one row per key per micro-batch: keep max
    # (n_events is strictly increasing, cents rides along in the struct)
    final = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("m"))
        .select("user_id", "m.n_events", "m.total_cents")
        .collect()
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("long").alias("total_cents"),
        )
        .collect()
    )
    fmap = {r["user_id"]: (r["n_events"], r["total_cents"]) for r in final}
    bmap = {r["user_id"]: (r["n_events"], r["total_cents"]) for r in batch}
    assert fmap == bmap


def test_sliding_stream_equals_batch(spark):
    from databricks_feature_store_poc_spark.streaming.windows import run_sliding_stream

    batch = QUERIES["stream_sliding"](spark, SF_SMOKE)
    stream = run_sliding_stream(spark, SF_SMOKE)
    cols = ["win_start", "win_end", "n", "sum_value"]
    assert _rowset(stream, cols) == _rowset(batch, cols)


def test_foreach_batch_exactly_once_layout(spark, tmp_path):
    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_foreach_batch_sink,
    )

    n_epochs = run_foreach_batch_sink(spark, SF_SMOKE, str(tmp_path / "sink"))
    assert n_epochs >= 1
    written = spark.read.parquet(str(tmp_path / "sink" / "epoch=*"))
    expected = load_table(spark, SF_SMOKE, "events")
    assert written.count() == expected.count()


def test_stream_dedup_matches_batch_distinct(spark):
    """Every event staged twice; dropDuplicatesWithinWatermark must emit
    each event_id exactly once == the registered (oracle-checked) batch
    twin `stream_dedup_exactly_once`."""
    from databricks_feature_store_poc_spark.registry import QUERIES
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_stream_dedup,
    )

    out = run_stream_dedup(spark, SF_SMOKE)
    batch = QUERIES["stream_dedup_exactly_once"](spark, SF_SMOKE)
    assert out.count() == batch.count()
    assert (
        out.select("event_id").distinct().count()
        == batch.select("event_id").distinct().count()
        == batch.count()
    )


def test_streaming_feature_maintenance_equals_batch(spark, tmp_path):
    """Micro-batched incremental maintenance must converge to the batch
    aggregate exactly (DECIMAL accumulation), with one table version per
    epoch."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_streaming_feature_maintenance,
    )

    vt = run_streaming_feature_maintenance(spark, SF_SMOKE, str(tmp_path))
    assert len(vt.history()) >= 2  # actually incremental, not one batch

    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in vt.read().collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .collect()
    }
    assert final == batch


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream join over a static file set must emit
    exactly the batch time-bounded join."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_stream_stream_join,
    )

    out = run_stream_stream_join(spark, SF_SMOKE)
    got = {
        (r["s_user"], r["s_event"], r["p_event"]) for r in out.collect()
    }
    # the registered (oracle-checked) batch twin is the ground truth
    from databricks_feature_store_poc_spark.registry import QUERIES

    want = {
        (r["s_user"], r["s_event"], r["p_event"])
        for r in QUERIES["stream_interval_join"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_transform_with_state_equals_batch(spark):
    """The transformWithStateInPandas running totals must converge to
    the batch per-user aggregate (last Update-mode emission per user).
    Skips where the TWS protobuf dependency is absent (this container) —
    the applyInPandasWithState parity test covers the ungated path."""
    import pytest

    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_transform_with_state_stream,
    )

    try:
        out = run_transform_with_state_stream(spark, SF_SMOKE)
    except ImportError as e:
        pytest.skip(f"transformWithState needs protobuf: {e}")
    # Update mode may emit a row per micro-batch per user; the LAST one
    # (max n_events) is the converged value.
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in out.orderBy("n_events").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("double")).alias("t"),
        )
        .collect()
    }
    assert final == batch and final


def test_streaming_maintenance_feeds_online_store(spark, tmp_path):
    """The full serving loop: events stream -> per-epoch versioned
    feature snapshots -> CDC replay into the KV store. The final KV
    view must equal the latest snapshot (== the one-shot batch
    aggregate, already pinned above), and the delta replay must ship
    FEWER writes than re-pushing the full table every epoch."""
    from databricks_feature_store_poc_spark.featurestore.online import (
        OnlineStoreSync,
        SpoolDirKV,
        sync_versioned_history,
    )
    from databricks_feature_store_poc_spark.streaming.windows import (
        run_streaming_feature_maintenance,
    )

    vt = run_streaming_feature_maintenance(
        spark, SF_SMOKE, str(tmp_path / "feature_tables")
    )
    kv = SpoolDirKV(str(tmp_path / "kv"))
    sync = OnlineStoreSync(kv, ["user_id"])
    n_versions = sync_versioned_history(vt, sync)
    assert n_versions >= 2  # multiple micro-batch epochs

    final = {(r["user_id"],): r for r in vt.read().collect()}
    view = kv.load()
    assert len(view) == len(final)
    for key, row in final.items():
        assert view[key]["n_events"] == row["n_events"]
        assert view[key]["total_value"] == row["total_value"]
    # delta replay writes less than full-table x epochs
    assert kv.stats()["n_writes"] < n_versions * len(final) + len(final)
