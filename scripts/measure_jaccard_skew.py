"""graph_jaccard_neighbors pair-join skew measurement (r18, VERDICT r17
'do this' #3).

The pair self-join emits cd*(cd-1)/2 rows per customer c (cd = capped
bipartite degree). Skew would show up as (a) a heavy-tailed per-key
pair-count distribution and (b) a max/median task-time gap in the join
stage. This script measures (a) exactly from the capped projection and
(b) from the Spark status API after running the join isolated, and
writes scripts/jaccard_skew_r18.json.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/measure_jaccard_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.operators.graph import (
        JACCARD_HUB_CAP,
    )
    from databricks_feature_store_poc_spark.session import get_spark
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    spark = get_spark("jaccard-skew")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    bip0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            F.col("o_custkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = bip0.groupBy("c").agg(F.count(F.lit(1)).alias("cd"))
    capped = deg.filter(F.col("cd") <= JACCARD_HUB_CAP)
    # exact per-key pair fanout distribution
    stats = capped.select(
        F.expr("cd * (cd - 1) / 2 AS pairs")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("pairs").alias("total_pairs"),
        F.max("pairs").alias("max_pairs"),
        F.expr("percentile(pairs, 0.5)").alias("p50_pairs"),
        F.expr("percentile(pairs, 0.99)").alias("p99_pairs"),
    ).collect()[0].asDict()
    stats["max_over_p50"] = (
        stats["max_pairs"] / stats["p50_pairs"] if stats["p50_pairs"] else None
    )
    # share of pairs owned by the hottest 1% of keys
    w = Window.orderBy(F.desc("pairs"))
    top1 = (
        capped.select(F.expr("cd * (cd - 1) / 2 AS pairs"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(max(1, int(stats["n_keys"] * 0.01))))
        .agg(F.sum("pairs"))
        .collect()[0][0]
    )
    stats["top1pct_share"] = (
        float(top1) / stats["total_pairs"] if stats["total_pairs"] else None
    )

    # (b) per-PARTITION pair load under the join's actual partitioning
    # (hash(c) into spark.sql.shuffle.partitions) — the direct form of
    # the guide §2.5 max/median question for this stage: a task's work
    # is the sum of cd²/2 over the c keys hashed to it.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_part = (
        capped.select(
            F.expr(f"pmod(hash(c), {n_part}) AS part"),
            F.expr("cd * (cd - 1) / 2 AS pairs"),
        )
        .groupBy("part")
        .agg(F.sum("pairs").alias("pairs"))
        .agg(
            F.count(F.lit(1)).alias("parts"),
            F.max("pairs").alias("max_part"),
            F.expr("percentile(pairs, 0.5)").alias("p50_part"),
        )
        .collect()[0]
        .asDict()
    )
    per_part["max_over_median_part"] = (
        per_part["max_part"] / per_part["p50_part"]
        if per_part["p50_part"]
        else None
    )

    # isolated end-to-end wall for reference
    from databricks_feature_store_poc_spark.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    t0 = time.perf_counter()
    QUERIES["graph_jaccard_neighbors"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    wall = time.perf_counter() - t0
    out = {
        "sf_dir": SF_DIR,
        "hub_cap": JACCARD_HUB_CAP,
        "shuffle_partitions": n_part,
        "per_key_pairs": {
            k: (float(v) if v is not None else None) for k, v in stats.items()
        },
        "per_partition_pairs": {
            k: (float(v) if v is not None else None)
            for k, v in per_part.items()
        },
        "isolated_wall_s": round(wall, 3),
    }
    path = os.path.join(REPO, "scripts", "jaccard_skew_r18.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["per_key_pairs"]))
    print("wall", out["isolated_wall_s"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
