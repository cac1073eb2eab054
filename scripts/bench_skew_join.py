"""Measured AQE skew-join evidence on zipf-distributed data (VERDICT r8
'do this' #3).

Until round 9 every skew claim in SCALE.md rested on uniform data: the
salted join was hash-verified CORRECT, and AQE skew splitting was
"pinned on", but nobody had measured either on a corpus where one key
actually owns a double-digit share of a fact table. This script runs the
hot join of the 10x-zipf replica — lineitem (6M rows, supplier 0 owns
~10% of them) sort-merge-joined to supplier — under three treatments,
each in a FRESH JVM (cold cache, clean confs):

  baseline   AQE on, skew-join splitting OFF, no salt: the hot key's
             entire row set lands on one reducer — max task >> median.
  aqe_skew   AQE skew-join splitting ON. Thresholds are lowered
             (16 MB advisory / factor 2) because this replica's
             absolute partition sizes are single-digit MBs while the
             production defaults (256 MB / 5x) are tuned for real
             cluster-scale partitions — the MECHANISM under test is
             identical, only the trigger point is scaled to the data.
             AQE splits the oversized partition into byte-balanced
             sub-tasks at runtime with zero code change.
  salted_16  skew splitting OFF, ``salted_join`` 16 ways: the manual
             fallback for the case AQE can't fix (one KEY too big for
             even a split partition's build side, or broadcast-
             ineligible dims).

Broadcast is disabled throughout (the supplier dim would otherwise
broadcast and no shuffle-side skew could exist — the measurement
targets the sort-merge path a 100 TB fact-to-fact join takes).

Per treatment it records wall time, the result checksum (all three
must agree — a skew mitigation that changes the answer is a bug, not
an optimization), and per-task duration quantiles (median/p75/max) of
the heaviest stage from Spark's own REST status API — the
task-time-balance numbers SCALE.md cites.

Usage:
    python scripts/make_skewed_replica.py   # once, SKEW_CLONES=10
    python scripts/bench_skew_join.py       # orchestrates 3 child runs
Writes scripts/bench_skew_join.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Default is the 100x-zipf replica (60M-row lineitem): at 10x the
# per-task fixed overhead (~0.7 s of fetch/sort/codegen setup) swamps
# the row-proportional join work and task durations flatten even though
# record counts skew 7x — the measurement needs row work to dominate,
# which it does from ~2M records/task up.
REPLICA = os.environ.get("SKEW_BENCH_DIR", "/tmp/spark_graft_zipf_100x")
OUT = os.path.join(REPO, "scripts", "bench_skew_join.json")

TREATMENTS = ("baseline", "aqe_skew", "salted_16")


def child(treatment: str) -> None:
    """One treatment in this (fresh) JVM; prints a single JSON line."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.operators.skew import salted_join

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")  # REST status API source
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # broadcast off: force the sort-merge path under measurement
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
    )
    if treatment == "aqe_skew":
        b = (
            b.config("spark.sql.adaptive.skewJoin.enabled", "true")
            # production defaults (256 MB / 5x) are sized for cluster
            # partitions; this replica's are single-digit MB — same
            # mechanism, trigger scaled to the data
            .config(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16m",
            )
            .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            .config(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m"
            )
            # coalescing would re-merge the split partitions
            .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        )
    else:
        b = b.config("spark.sql.adaptive.skewJoin.enabled", "false").config(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(REPLICA, "lineitem.parquet")).select(
        "l_suppkey", "l_extendedprice"
    )
    supp = spark.read.parquet(
        os.path.join(REPLICA, "supplier.parquet")
    ).select("s_suppkey", "s_nationkey")

    t0 = time.perf_counter()
    if treatment == "salted_16":
        joined = salted_join(
            li, supp.withColumnRenamed("s_suppkey", "l_suppkey"),
            on=["l_suppkey"], n_salts=16,
        )
    else:
        joined = li.join(supp, li.l_suppkey == supp.s_suppkey)
    # checksum aggregate: forces the full join AND pins row-identity
    # across treatments (cents-summed to keep it exact)
    row = joined.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100).cast("long")
            * (F.col("s_nationkey") + 1)
        ).alias("checksum"),
    ).first()
    wall = time.perf_counter() - t0

    # heaviest completed stage's per-task duration quantiles via the
    # REST status API (the UI's own numbers)
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    heaviest = max(stages, key=lambda s: s.get("executorRunTime", 0))
    summary = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages/"
            f"{heaviest['stageId']}/{heaviest['attemptId']}/taskSummary"
            "?quantiles=0.5,0.75,1.0"
        )
    )
    dur = summary["duration"]  # ms at the requested quantiles
    print(
        json.dumps(
            {
                "treatment": treatment,
                "wall_sec": round(wall, 2),
                "rows": row["rows"],
                "checksum": row["checksum"],
                "join_stage_tasks": heaviest["numCompleteTasks"],
                "task_ms_median": dur[0],
                "task_ms_p75": dur[1],
                "task_ms_max": dur[2],
                "task_max_over_median": round(dur[2] / max(dur[0], 1), 1),
                "shuffle_read_mb_max": round(
                    summary["shuffleReadMetrics"]["readBytes"][2] / 2**20, 1
                )
                if "shuffleReadMetrics" in summary
                else None,
            }
        )
    )
    spark.stop()


def main() -> int:
    if not os.path.isdir(REPLICA):
        print(
            f"replica missing at {REPLICA}; run "
            "SKEW_CLONES=10 python scripts/make_skewed_replica.py",
            file=sys.stderr,
        )
        return 1
    results = []
    for t in TREATMENTS:
        print(f"# running {t} (fresh JVM)", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", t],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            return 1
        rec = json.loads(line[-1])
        results.append(rec)
        print(f"# {t}: {rec}", file=sys.stderr, flush=True)
    checks = {r["checksum"] for r in results}
    rowss = {r["rows"] for r in results}
    summary = {
        "replica": REPLICA,
        "identical_results_across_treatments": len(checks) == 1
        and len(rowss) == 1,
        "treatments": results,
    }
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        sys.exit(main())
