"""One-off FULL-registry oracle gate at 100x clones (VERDICT r12 #3).

The only-at-scale oracle-defect class (SURVEY §6's 2x bar; the r8
ULP-past-2^53 and nested-loop traps) was enumerated for decimal casts
only, and the 100x replica (/tmp/spark_graft_stress100x_full — 100
clones of sf0.1, ~60M-row lineitem ~= sf10) has never seen the whole
registry. This script runs it once, recorded, like the quarterly
full-10x.

Design deltas vs tests/harness.py (which collects BOTH engines' full
output into Python — fine at sf0.1, not at 60M-row outputs):

- per-query wall cap (GATE_TIMEOUT, default 600 s) enforced by a
  Spark job-group cancel + DuckDB interrupt, so a planner bomb records
  a timeout instead of hanging the sweep;
- queries whose output exceeds GATE_CAP_ROWS (default 2M) are compared
  on COUNT only and recorded mode="count-only", with the adjudication
  note inline: every such query is a per-row map/window over a fact
  table — its VALUE semantics do not change with corpus size and are
  hash-gated at sf0.001/0.01/0.1 + five adversarial replicas every
  round; what scales is the cardinality, and the count compare is
  exactly the fan-out/planner check that class needs;
- quadratic-OUTPUT queries (the stress sweep's QUADRATIC_OUTPUT set)
  that hit the cap are recorded timeout_explained, same adjudication
  as scripts/stress_registry_10x.py: at 100 clones every cross-clone
  duplicate is a TRUE pair, so their output volume is ~(100 choose 2)x
  — output volume, not plan shape;
- results stream to scripts/gate100x_results.jsonl as they land (the
  sweep is ~hours; partial progress must survive) and a summary goes
  to scripts/gate100x_summary.json.

Usage:
    python scripts/gate100x.py                  # full registry
    GATE_ONLY=tpch_q1,agg_stats python scripts/gate100x.py
    GATE_RESUME=1 python scripts/gate100x.py    # skip names already in
                                                # the results file
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from tests.harness import duckdb_conn, value_hash  # noqa: E402

DST = os.environ.get("GATE_SF_DIR", "/tmp/spark_graft_stress100x_full")
TIMEOUT = float(os.environ.get("GATE_TIMEOUT", "600"))
CAP_ROWS = int(os.environ.get("GATE_CAP_ROWS", "2000000"))
RESULTS = os.path.join(REPO, "scripts", "gate100x_results.jsonl")
SUMMARY = os.path.join(REPO, "scripts", "gate100x_summary.json")

# mirror of scripts/stress_registry_10x.py CLONE_DEGENERATE_ZERO —
# rows-only queries whose 0-row output at high clone counts is the
# DF cap doing its job (every shingle's df is ~CLONES x its original,
# exceeding DF_CAP=50, so stop-shingle removal empties the inverted
# index; identical clones are dedup_exact's work)
CLONE_DEGENERATE_ZERO = {"dedup_ngram_jaccard", "dedup_near_minhash"}

# mirror of scripts/stress_registry_10x.py QUADRATIC_OUTPUT — queries
# whose OUTPUT is inherently ~C^2 on a cloned corpus
QUADRATIC_OUTPUT = {
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_simhash_audit",
    "dedup_minhash_audit",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_semantic_cluster",
    "join_interval_overlap",
    "text_span_dedup",
}


class _Timeout(Exception):
    pass


def run_one(spark, name: str) -> dict:
    fn = QUERIES[name]
    rec: dict = {"query": name}
    t0 = time.perf_counter()
    fired = threading.Event()
    sc = spark.sparkContext
    group = f"gate100x-{name}"
    sc.setJobGroup(group, name, interruptOnCancel=True)
    con: duckdb.DuckDBPyConnection | None = None

    def cancel():
        fired.set()
        try:
            sc.cancelJobGroup(group)
        except Exception:
            pass
        if con is not None:
            try:
                con.interrupt()
            except Exception:
                pass

    timer = threading.Timer(TIMEOUT, cancel)
    timer.daemon = True
    timer.start()
    try:
        df = fn(spark, DST)
        n_spark = df.count()
        rec["spark_rows"] = n_spark
        if name not in ORACLES:
            rec["mode"] = "rows-only"
            rec["ok"] = n_spark > 0
            if n_spark == 0 and name in CLONE_DEGENERATE_ZERO:
                rec["ok"] = True
                rec["note"] = (
                    "0 rows is the DF cap working at 100x clones (every "
                    "shingle df > DF_CAP) — same adjudication as the "
                    "stress sweep's CLONE_DEGENERATE_ZERO"
                )
            return rec
        con = duckdb_conn(DST)
        # cap the oracle's memory: a quadratic-output oracle at 100x
        # otherwise grows until the OS kills the whole gate (observed:
        # 111 GB RSS SIGKILL on dedup_semantic_cluster) — with the cap
        # DuckDB raises OutOfMemoryException instead, which the
        # QUADRATIC_OUTPUT branch below adjudicates like a timeout
        con.sql("SET memory_limit='24GB'")
        n_duck = con.sql(
            f"SELECT COUNT(*) FROM ({ORACLES[name]})"
        ).fetchone()[0]
        rec["oracle_rows"] = n_duck
        if n_spark != n_duck:
            rec["mode"] = "count"
            rec["ok"] = False
            rec["issue"] = f"rowcount spark={n_spark} duck={n_duck}"
            return rec
        if n_spark > CAP_ROWS:
            rec["mode"] = "count-only"
            rec["ok"] = True
            rec["note"] = (
                f"output {n_spark} rows > cap {CAP_ROWS}: per-row map "
                "semantics hash-gated at sf<=0.1 on 6 distributions; "
                "count compare is the at-scale fan-out check"
            )
            return rec
        spark_rows = [tuple(r) for r in df.collect()]
        rel = con.sql(ORACLES[name])
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
        issues = []
        if sorted(df.columns) != sorted(duck_cols):
            issues.append(
                f"cols spark={sorted(df.columns)} duck={sorted(duck_cols)}"
            )
        elif value_hash(spark_rows, df.columns) != value_hash(
            duck_rows, duck_cols
        ):
            issues.append("value-hash mismatch")
        rec["mode"] = "oracle"
        rec["ok"] = not issues
        if issues:
            rec["issue"] = "; ".join(issues)
        return rec
    except Exception as exc:
        rec["sec"] = round(time.perf_counter() - t0, 2)
        oom = "utofmemory" in str(exc).lower() or "memory limit" in str(
            exc
        ).lower()
        if oom and name in QUADRATIC_OUTPUT:
            rec["ok"] = True
            rec["oom_explained"] = (
                "oracle memory cap hit: deliberately quadratic OUTPUT at "
                "100x clones (~4950x the 10x pair volume) — same "
                "adjudication as a quadratic timeout; the 10x sweep row "
                "is the plan-shape evidence"
            )
            return rec
        if fired.is_set():
            rec["timeout"] = True
            rec["ok"] = name in QUADRATIC_OUTPUT
            if name in QUADRATIC_OUTPUT:
                rec["timeout_explained"] = (
                    "deliberately quadratic OUTPUT at 100x clones (every "
                    "cross-clone duplicate is a TRUE pair, ~4950x the 10x "
                    "pair volume) — same adjudication as the stress sweep"
                )
            else:
                rec["ok"] = False
                rec["issue"] = f"timeout after {TIMEOUT:.0f}s"
        else:
            rec["ok"] = False
            rec["issue"] = f"{type(exc).__name__}: {exc}"[:300]
        return rec
    finally:
        timer.cancel()
        sc.setJobGroup("", "")
        if con is not None:
            try:
                con.close()
            except Exception:
                pass
        rec.setdefault("sec", round(time.perf_counter() - t0, 2))


def main() -> int:
    from databricks_feature_store_poc_spark.session import get_spark

    only = [s for s in os.environ.get("GATE_ONLY", "").split(",") if s]
    done: set[str] = set()
    if os.environ.get("GATE_RESUME") and os.path.exists(RESULTS):
        with open(RESULTS) as f:
            done = {json.loads(ln)["query"] for ln in f if ln.strip()}
    else:
        open(RESULTS, "w").close()

    spark = get_spark("gate-100x")
    load_all_queries()
    names = only or sorted(QUERIES)
    failed, out = [], []
    for i, name in enumerate(names):
        if name in done:
            continue
        rec = run_one(spark, name)
        out.append(rec)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        status = "OK" if rec["ok"] else "FAIL"
        print(
            f"[{i + 1}/{len(names)}] {name}: {status} "
            f"{rec.get('mode', '')} {rec.get('sec', '')}s "
            f"{rec.get('issue', '')}",
            flush=True,
        )
        if not rec["ok"]:
            failed.append(name)
    summary = {
        "sf_dir": DST,
        "n": len(names),
        "failed": failed,
        "modes": {},
    }
    with open(RESULTS) as f:
        for ln in f:
            r = json.loads(ln)
            m = r.get("mode", "timeout" if r.get("timeout") else "?")
            summary["modes"][m] = summary["modes"].get(m, 0) + 1
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
