"""10x headroom stress for the round-5 operators (SCALE.md evidence).

Builds a 10x replica of sf0.1 (customer/orders/lineitem/events, keys
offset per clone so cardinalities genuinely grow) in /tmp, then runs the
ACTUAL registered query functions against it — same code path the driver
adjudicates — recording wall time, output rows, and Exchange counts in
the executed plan. The claim under test: plans stay stable (no bucket
explosion, exchange counts flat vs sf0.1) when the data grows 10x.

Usage: python scripts/stress_r5_10x.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/spark_graft_stress10x"
CLONES = 10


def replicate(spark, table: str, key_offsets: dict[str, str]) -> None:
    out = os.path.join(DST, f"{table}.parquet")
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    df = load_table(spark, SRC, table)
    df = df.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(CLONES - 1))))
    for col, kind in key_offsets.items():
        if kind == "offset":  # keep clones' keyspaces disjoint
            span = df.agg(F.max(col)).first()[0] + 1
            df = df.withColumn(col, F.col(col) + F.col("__r") * F.lit(span))
        elif kind == "jitter_ts":  # keep events inside the same hour buckets
            df = df.withColumn(
                col, F.col(col) + F.make_interval(secs=F.col("__r").cast("double"))
            )
    df.drop("__r").write.mode("overwrite").parquet(out)


def run(name: str, fn, spark, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange ")
    n_rows = df.count()
    return {"query": name, "sec": round(sec, 2), "rows": n_rows, "exchanges": n_exchange}


def main() -> int:
    spark = get_spark("stress-r5-10x")
    os.makedirs(DST, exist_ok=True)
    replicate(spark, "customer", {"c_custkey": "offset"})
    replicate(spark, "orders", {"o_orderkey": "offset", "o_custkey": "offset"})
    replicate(spark, "lineitem", {"l_orderkey": "offset"})
    replicate(spark, "events", {"event_id": "offset", "ts": "jitter_ts"})
    replicate(spark, "documents", {"doc_id": "offset"})
    replicate(spark, "embeddings", {"vec_id": "offset"})

    import __spark_entry__ as entry

    qs = entry.queries()
    targets = os.environ.get(
        "STRESS_TARGETS",
        "join_interval_overlap,join_bucketed_colocated,rollup_incremental,"
        "agg_hll_sketch",
    ).split(",")
    results = []
    for sf_dir in (SRC, DST):
        tag = "sf0.1" if sf_dir == SRC else "10x"
        for name in targets:
            r = run(name, qs[name], spark, sf_dir)
            r["data"] = tag
            print(r, flush=True)
            results.append(r)
        # steady-state second run of the bucketed join (tables now exist)
        if sf_dir == DST and "join_bucketed_colocated" in targets:
            r = run("join_bucketed_colocated", qs["join_bucketed_colocated"], spark, sf_dir)
            r["data"] = "10x-2nd"
            print(r, flush=True)
            results.append(r)

    # Interval-overlap second axis: 12x the TIME RANGE at constant density
    # (whole-1996 windows instead of one month). Densifying one window
    # (above) grows the true pair count ~100x — inherent quadratic output;
    # stretching the range grows pairs ~12x — the realistic
    # 10x-more-history case. Uses the operator's reusable core.
    from databricks_feature_store_poc_spark.operators.relational import (
        interval_overlap_pairs,
    )

    def wide_window(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        ).select(
            "o_orderpriority",
            F.col("o_orderdate").alias("o_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("o_end"),
        )
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-02-15")
        ).select(
            F.col("l_shipdate").alias("l_start"),
            (F.col("l_shipdate") + F.expr("INTERVAL 7 DAY")).alias("l_end"),
        )
        return (
            interval_overlap_pairs(o, li)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )

    if "join_interval_overlap" in targets:
        r = run("join_interval_overlap", wide_window, spark, SRC)
        r["data"] = "12x-range"
        print(r, flush=True)
        results.append(r)
    print("RESULTS", results)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    finally:
        shutil.rmtree(DST, ignore_errors=True)
