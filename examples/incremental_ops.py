"""Day-2 operations: the incremental loop a deployed feature store runs.

Day 1 materializes a feature snapshot and pushes it to the online KV
store. Every day after that, nothing is recomputed from scratch:

  1. the new snapshot is diffed against the old one (``snapshot_diff`` —
     the change-data-feed, O(changed) rows),
  2. the online store receives ONLY that feed (``delta_sync``),
  3. stored aggregate partials absorb the new events by merge
     (``merge_rollup`` — identical to a full rebuild, never rescans
     history),
  4. newly arrived documents are curated against the existing corpus
     (``pipeline_incremental_curate`` — novelty via hash anti-join),
  5. a right-to-be-forgotten batch is propagated across every
     subject-keyed table (``propagate_deletions`` — broadcast
     anti-joins, the transitive lineage handled for you) and the
     purged keys are removed from the online store too.

    python examples/incremental_ops.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_poc_spark.featurestore.merge import (  # noqa: E402
    snapshot_diff,
)
from databricks_feature_store_poc_spark.featurestore.online import (  # noqa: E402
    OnlineStoreSync,
    SpoolDirKV,
)
from databricks_feature_store_poc_spark.operators.rollup_maintenance import (  # noqa: E402
    build_rollup,
    merge_rollup,
)
from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402

CUTOFF = "2024-01-16 12:00:00"


def feature_snapshot(events) -> "DataFrame":  # noqa: F821
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
    )


def main(sf_dir: str) -> None:
    spark = get_spark("incremental-ops", master="local[8]", shuffle_partitions=8)
    events = load_table(spark, sf_dir, "events")
    day1 = events.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))

    # Day 1: materialize + full sync.
    snap1 = feature_snapshot(day1)
    kv = SpoolDirKV(tempfile.mkdtemp(prefix="incr_ops_kv_"))
    sync = OnlineStoreSync(kv, primary_keys=["user_id"])
    sync.full_sync(snap1)
    print(f"day 1: {snap1.count()} users synced, kv stats {kv.stats()}")

    # Day 2: diff snapshots -> ship only the feed.
    snap2 = feature_snapshot(events)
    feed = snapshot_diff(snap1, snap2, ["user_id"], ["n_events", "total_value"])
    by_action = {
        r["action"]: r["n"]
        for r in feed.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    sync.delta_sync(snap1, snap2)
    kv.refresh()
    print(f"day 2 feed: {by_action} -> kv stats {kv.stats()}")

    # Stored rollup absorbs the delta by merge; equality with the full
    # rebuild is the mergeability guarantee.
    stored = build_rollup(day1)
    delta_events = events.filter(F.col("ts") >= F.lit(CUTOFF).cast("timestamp"))
    merged = merge_rollup(stored, delta_events)
    full = build_rollup(events)
    diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    print(f"rollup merge == full rebuild: {'OK' if diff == 0 else f'DIFF {diff}'}")

    # Newly arrived documents, curated incrementally.
    load_all_queries()
    row = QUERIES["pipeline_incremental_curate"](spark, sf_dir).collect()[0]
    print(
        "incremental curation: "
        f"{row['n_arriving']} arrived, {row['n_pass_quality']} pass quality, "
        f"{row['n_novel']} novel, +{row['tokens_added']} tokens"
    )

    # A deletion request arrives: purge the subjects everywhere — the
    # offline tables via broadcast anti-joins (lineitem transitively,
    # through its deleted orders) and the online KV via delete_sync
    # (delta_sync against the purged snapshot emits exactly the
    # deletions).
    from databricks_feature_store_poc_spark.featurestore.governance import (
        propagate_deletions,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    subjects = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    kept = propagate_deletions(
        {
            "customer": (cust, "c_custkey"),
            "orders": (orders, "o_custkey"),
            "events": (events, "user_id"),
        },
        subjects,
        transitive={"lineitem": (lineitem, "orders", "o_orderkey", "l_orderkey")},
    )
    snap3 = feature_snapshot(kept["events"])
    sync.delta_sync(snap2, snap3)
    kv.refresh()
    print(
        "gdpr purge: "
        + ", ".join(f"{t} -> {df.count()} rows kept" for t, df in kept.items())
        + f"; kv stats after delete feed {kv.stats()}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
