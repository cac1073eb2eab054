"""Skew-sensitivity sweep: full registry on uniform-10x vs zipf-10x.

Round 9 closed the last untested CORRECTNESS axis (data shape) with the
zipf replica oracle gate; this script closes the PERFORMANCE side of
the same axis. The r8 100x sweep proved headroom on uniformly-cloned
data, but clones preserve the generator's uniform key distribution —
a real 100 TB corpus is zipfian (hot customers, hot suppliers, one
giant user session, duplicate-heavy documents). The question this
sweep answers per query: at the SAME fact scale (6M lineitem / 1.5M
orders / 1M events), does the wall degrade when the keys go zipf(1)?

Method (same jitter discipline as scripts/bench_ab.py): ONE Spark
session, per-query interleaved A/B — uniform-10x replica
(/tmp/spark_graft_stress10x_full, r8's clone replica) vs zipf-10x
(/tmp/spark_graft_zipf_10x, scripts/make_skewed_replica.py CLONES=10).
Each run is a noop-sink write of the registered query's DataFrame —
the driver's execution shape, no collect. Records wall, executed-plan
Exchange count, CartesianProduct/BNLJ flags, and (when cheap) rows.

Flag criterion: sec_zipf > max(2.0 * sec_uniform, sec_uniform + 5.0)
— a 2x-with-absolute-floor bar, deliberately looser than bench_ab's
1.5x because the two datasets are DIFFERENT data (zipf keeps the base
15k-customer dim while uniform-10x clones it to 150k; documents carry
a duplicate tail by design), so some honest divergence is expected.
Known-different families are classified, not excused silently:

- SKEW_OUTPUT_DIFFERENT: queries whose OUTPUT is a function of the
  duplicate structure (dedup/near-dup pair families, clustering) —
  zipf's dup tail produces genuinely more pairs; judged on plan shape
  (no cartesian, flat exchanges) + output-proportional wall instead.
- Queries over the customer dim see 15k vs 150k rows — the zipf side
  is CHEAPER there; ratios < 1 are expected, not suspicious.

Usage:
    python scripts/stress_zipf_vs_uniform.py                 # full sweep
    STRESS_ONLY=a,b python scripts/stress_zipf_vs_uniform.py # subset
    STRESS_TIMEOUT_SEC=240 ...                               # per-run cap

Writes one JSON line per (query, dataset) to stdout and a summary to
scripts/stress_zipf_vs_uniform.json (merged per-query when STRESS_ONLY
is given), consumed by SCALE.md's skew section.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402

UNIFORM = os.environ.get("STRESS_UNIFORM_DIR", "/tmp/spark_graft_stress10x_full")
ZIPF = os.environ.get("STRESS_ZIPF_DIR", "/tmp/spark_graft_zipf_10x")
OUT = os.path.join(REPO, "scripts", "stress_zipf_vs_uniform.json")
STRESS_TIMEOUT = float(os.environ.get("STRESS_TIMEOUT_SEC", "240"))

# Output is a function of duplicate/key structure, which the two
# replicas differ on BY DESIGN (zipf carries a duplicate-heavy doc
# tail and hot FK keys; uniform clones are disjoint-keyed). Judged on
# plan shape + output-proportional wall, not the 2x ratio bar.
SKEW_OUTPUT_DIFFERENT = {
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_simhash_audit",
    "dedup_minhash_audit",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_semantic_cluster",
    "text_span_dedup",
    "graph_jaccard_neighbors",
}


def run_one(name: str, fn, spark, sf_dir: str, count_rows: bool) -> dict:
    t0 = time.perf_counter()
    timer = None
    group = f"zipfab-{name}"
    if STRESS_TIMEOUT > 0:
        sc = spark.sparkContext
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timer = threading.Timer(STRESS_TIMEOUT, lambda: sc.cancelJobGroup(group))
        timer.daemon = True
        timer.start()
    try:
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        rec = {
            "query": name,
            "sec": round(sec, 2),
            "exchanges": plan.count("Exchange "),
            "cartesian": "CartesianProduct" in plan,
            "bnlj": "BroadcastNestedLoop" in plan,
        }
        if count_rows and sec < 30:
            rec["rows"] = df.count()
        return rec
    except Exception as exc:  # record, keep sweeping
        sec = time.perf_counter() - t0
        rec = {
            "query": name,
            "sec": round(sec, 2),
            "error": f"{type(exc).__name__}: {exc}"[:300],
            "trace": traceback.format_exc()[-500:],
        }
        if STRESS_TIMEOUT > 0 and sec >= STRESS_TIMEOUT * 0.95:
            rec["timeout"] = True
            rec.pop("trace", None)
        return rec
    finally:
        if timer is not None:
            timer.cancel()
            spark.sparkContext.setJobGroup("", "")


def main() -> int:
    spark = get_spark("stress-zipf-vs-uniform")

    import __spark_entry__ as entry

    qs = entry.queries()
    only = os.environ.get("STRESS_ONLY")
    names = only.split(",") if only else list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown STRESS_ONLY keys: {unknown}")

    # Warm the session (JIT, codegen caches, page cache for both
    # replicas) so the first measured query isn't charged the cold
    # start — the sanity run showed a 1.7x first-query artifact.
    for sf_dir in (UNIFORM, ZIPF):
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    summary = []
    for name in names:
        pair = {}
        # interleaved per query: uniform then zipf back-to-back so the
        # machine state (page cache, JIT, GC) is as equal as it gets
        for tag, sf_dir in (("uniform10x", UNIFORM), ("zipf10x", ZIPF)):
            r = run_one(name, qs[name], spark, sf_dir, count_rows=True)
            r["data"] = tag
            print(json.dumps(r), flush=True)
            pair[tag] = r
        u, z = pair["uniform10x"], pair["zipf10x"]
        su, sz = u.get("sec"), z.get("sec")
        row = {
            "query": name,
            "sec_uniform": su,
            "sec_zipf": sz,
            "ratio": round(sz / su, 2) if su and sz else None,
            "exch_uniform": u.get("exchanges"),
            "exch_zipf": z.get("exchanges"),
            "rows_uniform": u.get("rows"),
            "rows_zipf": z.get("rows"),
            "output_differs_by_design": name in SKEW_OUTPUT_DIFFERENT,
            "error": u.get("error") or z.get("error"),
        }
        if z.get("timeout"):
            row["timeout_zipf"] = True
        if u.get("timeout"):
            row["timeout_uniform"] = True
        flagged = (
            su is not None
            and sz is not None
            and sz > max(2.0 * su, su + 5.0)
            and name not in SKEW_OUTPUT_DIFFERENT
        )
        row["skew_flag"] = bool(flagged or row["error"])
        summary.append(row)
        print(json.dumps({"summary_row": row}), flush=True)

    if only and os.path.exists(OUT):
        with open(OUT) as f:
            prior = {r["query"]: r for r in json.load(f)["rows"]}
        for r in summary:
            prior[r["query"]] = r
        rows = [prior[k] for k in sorted(prior)]
    else:
        rows = sorted(summary, key=lambda r: r["query"])
    flags = [r["query"] for r in rows if r.get("skew_flag")]
    with open(OUT, "w") as f:
        json.dump(
            {
                "uniform_dir": UNIFORM,
                "zipf_dir": ZIPF,
                "timeout_sec": STRESS_TIMEOUT,
                "n_queries": len(rows),
                "skew_flags": flags,
                "rows": rows,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {"n": len(rows), "skew_flags": flags},
        ),
        flush=True,
    )
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
