"""Same-machine A/B bench: HEAD vs an arbitrary git ref, one command.

Persists the round-7 variance methodology (ROUND7_NOTES
"Bench-environment variance", VERDICT r7 'do this' #5): raw
round-over-round bench walls carry environment drift (measured ~1.5x
between rounds with up to 4x per-query jitter), so the ONLY comparison
that identifies a real regression is both code versions on the SAME
machine in the SAME session window. This script:

1. checks the ref out into a throwaway git worktree
   (/tmp/spark_graft_bench_ab_<sha>);
2. runs `python bench.py` in each tree back-to-back, same env
   (subset + repeats/budget pass through; default repeats from
   bench.py = median-of-3);
3. joins the two sidecars per query and flags regressions:
   HEAD median > max(1.5x ref median, ref + 1.0s) — the jitter-proof
   bar (ratio alone flags 0.1s -> 0.2s scheduling noise);
4. writes scripts/bench_ab_result.json and prints one JSON summary.

Usage:
    python scripts/bench_ab.py <ref> [query ...]
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_REPEATS=1 \
        python scripts/bench_ab.py HEAD~5 tpch_q1 graph_pagerank
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], cwd: str = REPO) -> str:
    return subprocess.run(
        args, cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def run_bench(tree: str, queries: list[str]) -> dict:
    """Run bench.py in `tree`, return its full sidecar dict."""
    sidecar = os.path.join(tree, "bench_result.json")
    keep = None
    if os.path.exists(sidecar):  # don't clobber a committed sidecar
        with open(sidecar) as f:
            keep = f.read()
    try:
        subprocess.run(
            [sys.executable, os.path.join(tree, "bench.py"), *queries],
            cwd=tree, check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, env=os.environ,
        )
        with open(sidecar) as f:
            return json.load(f)
    finally:
        if keep is not None:
            with open(sidecar, "w") as f:
                f.write(keep)
        elif os.path.exists(sidecar):
            os.unlink(sidecar)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    ref, queries = sys.argv[1], sys.argv[2:]
    sha = sh(["git", "rev-parse", "--short", ref])
    tree = f"/tmp/spark_graft_bench_ab_{sha}"
    created = False
    if not os.path.isdir(tree):
        sh(["git", "worktree", "add", "--detach", tree, sha])
        created = True
    try:
        print(f"# bench A: {ref} ({sha}) in {tree}", file=sys.stderr)
        a = run_bench(tree, queries)
        print("# bench B: HEAD (working tree)", file=sys.stderr)
        b = run_bench(REPO, queries)
    finally:
        if created and os.environ.get("BENCH_AB_KEEP") != "1":
            sh(["git", "worktree", "remove", "--force", tree])

    rows, regressions = [], []
    for q in sorted(set(a["queries"]) | set(b["queries"])):
        ra, rb = a["queries"].get(q), b["queries"].get(q)
        row = {"query": q, f"sec_{sha}": ra, "sec_head": rb}
        if ra is not None and rb is not None:
            row["ratio"] = round(rb / max(ra, 0.05), 2)
            row["regressed"] = rb > max(1.5 * ra, ra + 1.0)
            if row["regressed"]:
                regressions.append(q)
        elif rb is None and ra is not None:
            row["regressed"] = True  # worked at ref, fails at HEAD
            regressions.append(q)
        rows.append(row)

    out = {
        "ref": ref,
        "sha": sha,
        "sf": b.get("sf"),
        "passes_ref": a.get("passes"),
        "passes_head": b.get("passes"),
        "total_ref": a.get("value"),
        "total_head": b.get("value"),
        "n_queries": len(rows),
        "regressions": regressions,
        "rows": rows,
    }
    with open(os.path.join(REPO, "scripts", "bench_ab_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
