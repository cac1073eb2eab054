"""Incremental rollup maintenance: continuous-aggregate tables over an
append-only event stream (the hypertable/materialized-rollup capability).

A rollup is a (key, time_bucket) -> mergeable partial-aggregate table.
`build_rollup` computes it from scratch; `merge_rollup` folds a NEW batch
of events into an existing rollup WITHOUT re-reading the raw history —
possible because every kept aggregate is decomposable (count, sum) or
derived from decomposables at read time (avg = sum/count).

Scale contract: a refresh touches O(|new batch| + |rollup|), never
O(|history|). At 100 TB of history that is the difference between a
feasible 5-minute refresh and an infeasible full recompute; pair with a
rollup table partitioned by bucket date so the merge's write only
rewrites recent partitions. Invariant (pinned in tests): merge of any
split of the input == build over the whole input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_COLS = ("n_events", "sum_value")


def build_rollup(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Aggregate raw events to (key, bucket_start) partials."""
    win = F.window(ts_col, bucket)
    return (
        events.groupBy(F.col(key), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(key, F.col("w.start").alias("bucket_start"), *ROLLUP_COLS)
    )


def merge_rollup(existing: DataFrame, new_events: DataFrame, **kwargs) -> DataFrame:
    """Fold a new event batch into an existing rollup.

    The new batch is rolled up to the same grain, then merged by summing
    partials per (key, bucket) — count and decimal-sum are both mergeable,
    so the result is identical to rebuilding from all events.
    """
    key = kwargs.get("key", "user_id")
    delta = build_rollup(new_events, **kwargs)
    return (
        existing.unionByName(delta)
        .groupBy(key, "bucket_start")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


def rollup_to_features(rollup: DataFrame, key: str = "user_id") -> DataFrame:
    """Read-time finalization: derive per-key features (totals, averages)
    from the mergeable partials — avg is computed here, not stored,
    because avg is not mergeable but (sum, count) is."""
    return rollup.groupBy(key).agg(
        F.sum("n_events").alias("total_events"),
        F.sum("sum_value").cast("double").alias("total_value"),
        (F.sum("sum_value").cast("double") / F.sum("n_events")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registration (driver correctness gate)
# ---------------------------------------------------------------------------

from databricks_feature_store_poc_spark.registry import query  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402


@query(
    "rollup_incremental",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS total_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*)
               AS avg_value
    -- ts IS NOT NULL: the rollup is an HOURLY continuous aggregate —
    -- an event with no event-time belongs to no bucket (F.window drops
    -- it on the engine side; allnull-replica contract)
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY user_id
    """,
)
def rollup_incremental(spark, sf_dir: str) -> DataFrame:
    """The continuous-aggregate refresh path, driver-checked end to end:
    events split deterministically into an initial batch and a late
    batch (event_id hash), the rollup built from the first, the second
    MERGED in (touching only partials, never raw history), then
    finalized to per-user features. The oracle is the one-shot aggregate
    over ALL events — so the driver hash-verifies the central rollup
    invariant: merge of any split == full rebuild. Counts and decimal
    sums are mergeable partials; avg is derived at read time.

    Scale: each build is one (key, bucket) partial aggregate over its
    batch; the merge aggregates rollup-sized inputs only — a refresh is
    O(|new batch| + |rollup|), never O(|history|)."""
    e = load_table(spark, sf_dir, "events")
    first = e.filter(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 7)
    late = e.filter(F.pmod(F.xxhash64("event_id"), F.lit(10)) >= 7)
    base = build_rollup(first)
    merged = merge_rollup(base, late)
    return rollup_to_features(merged)
