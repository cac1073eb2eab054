"""Per-query floor decomposition (r18, VERDICT r17 'do this' #1).

For every registered query, split the bench-visible wall into
  t_build  — the builder call fn(spark, sf_dir): py4j plan construction,
             metadata memo lookups, eager localCheckpoint jobs;
  t_exec   — the noop-sink action (Catalyst + scheduling + compute);
and count py4j round-trips during the build (GatewayClient.send_command
calls), the direct measure of driver-side chatter the VERDICT told us to
hunt (>=50 ms builders).

Two warm reps per query, second rep reported (steady state, like the
bench's median-of-3 which is warm-dominated). One JSON line per query to
stdout; summary at the end.

Usage: python scripts/profile_floor.py [out.json] [query ...]
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

PY4J_CALLS = {"n": 0}


def main() -> int:
    import py4j.java_gateway as jg

    orig = jg.GatewayClient.send_command

    def counted(self, *a, **kw):
        PY4J_CALLS["n"] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counted
    # ClientServer path (pinned thread mode) routes through
    # ClientServerConnection; JavaClient subclasses GatewayClient, so the
    # patch above covers both unless send_command is overridden.
    try:
        import py4j.clientserver as cs

        orig_cs = cs.JavaClient.send_command

        def counted_cs(self, *a, **kw):
            PY4J_CALLS["n"] += 1
            return orig_cs(self, *a, **kw)

        cs.JavaClient.send_command = counted_cs
    except Exception:
        pass

    from databricks_feature_store_poc_spark.session import get_spark

    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    out_path = None
    if args and args[0].endswith(".json"):
        out_path = args[0]
        args = args[1:]
    only = set(args)

    spark = get_spark("profile-floor")
    queries = entrymod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    # same warm-ups as bench.py
    for warm_name in (
        "training_set_flagship", "text_stats", "mm_embedding_norm",
        "udf_scalar", "dedup_ngram_jaccard", "scan_python_datasource",
    ):
        try:
            warm = queries.get(warm_name) or entrymod.queries().get(warm_name)
            if warm is not None:
                warm(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    rows = {}
    for name in sorted(queries):
        fn = queries[name]
        rec = None
        for rep in range(2):
            try:
                c0 = PY4J_CALLS["n"]
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                t1 = time.perf_counter()
                c1 = PY4J_CALLS["n"]
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                c2 = PY4J_CALLS["n"]
                rec = {
                    "build_s": round(t1 - t0, 4),
                    "exec_s": round(t2 - t1, 4),
                    "py4j_build": c1 - c0,
                    "py4j_exec": c2 - c1,
                }
            except Exception as e:
                rec = {"error": f"{type(e).__name__}: {e}"}
                break
        rows[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)

    total_build = sum(r.get("build_s", 0) for r in rows.values())
    total_exec = sum(r.get("exec_s", 0) for r in rows.values())
    summary = {
        "n": len(rows),
        "total_build_s": round(total_build, 2),
        "total_exec_s": round(total_exec, 2),
        "rows": rows,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("n", "total_build_s", "total_exec_s")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
