"""Same-machine A/B/N bench: HEAD vs one or more git refs, one command.

Persists the round-7 variance methodology (ROUND7_NOTES
"Bench-environment variance", VERDICT r7 'do this' #5): raw
round-over-round bench walls carry environment drift (measured ~1.5x
between rounds with up to 4x per-query jitter), so the ONLY comparison
that identifies a real regression is all code versions on the SAME
machine in the SAME session window. r12 (VERDICT r11 'do this' #2)
generalized the script from one ref to N refs so a full
"HEAD vs r11-final vs r10-final" three-way runs as one session. This
script:

1. checks each ref out into a throwaway git worktree
   (/tmp/spark_graft_bench_ab_<sha>);
2. runs `python bench.py` in every tree back-to-back oldest-first, then
   HEAD, same env (subset + repeats/budget pass through; default
   repeats from bench.py = median-of-3);
3. joins the sidecars per query; flags regressions between ADJACENT
   versions: newer median > max(1.5x older, older + 1.0s) — the
   jitter-proof bar (ratio alone flags 0.1s -> 0.2s scheduling noise);
   the VERDICT r11 adjudication bar (>1.25x between adjacent rounds)
   is reported per row as adj_ratios for manual review;
4. writes scripts/bench_ab_result.json and prints one JSON summary.

Refs are given oldest-first; HEAD (the working tree) is always the
final, newest version. Args that `git rev-parse` resolves are refs;
the rest are query-name filters.

Usage:
    python scripts/bench_ab.py <ref> [moreRefs ...] [query ...]
    python scripts/bench_ab.py 3b5f4b6 019e576          # three-way
    SPARK_GRAFT_BENCH_REPEATS=1 python scripts/bench_ab.py HEAD~5 tpch_q1
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


def try_rev_parse(ref: str) -> str | None:
    try:
        return sh(["git", "rev-parse", "--short", ref])
    except subprocess.CalledProcessError:
        return None


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
    refs: list[tuple[str, str]] = []  # (ref, sha), oldest first
    queries: list[str] = []
    for arg in sys.argv[1:]:
        sha = None if queries else try_rev_parse(arg)
        if sha is not None:
            refs.append((arg, sha))
        else:
            queries.append(arg)
    if not refs:
        print("no resolvable git refs given", file=sys.stderr)
        return 2

    versions: list[tuple[str, dict]] = []  # (label, sidecar)
    created: list[str] = []
    try:
        for ref, sha in refs:
            tree = f"/tmp/spark_graft_bench_ab_{sha}"
            if not os.path.isdir(tree):
                sh(["git", "worktree", "add", "--detach", tree, sha])
                created.append(tree)
            print(f"# bench {ref} ({sha}) in {tree}", file=sys.stderr)
            versions.append((sha, run_bench(tree, queries)))
        print("# bench HEAD (working tree)", file=sys.stderr)
        versions.append(("head", run_bench(REPO, queries)))
    finally:
        if os.environ.get("BENCH_AB_KEEP") != "1":
            for tree in created:
                sh(["git", "worktree", "remove", "--force", tree])

    labels = [lb for lb, _ in versions]
    all_queries = sorted(set().union(*(v["queries"] for _, v in versions)))
    rows, regressions = [], []
    for q in all_queries:
        row: dict = {"query": q}
        secs = []
        for lb, v in versions:
            s = v["queries"].get(q)
            row[f"sec_{lb}"] = s
            secs.append(s)
        adj = []
        regressed = False
        for older, newer in zip(secs, secs[1:]):
            if older is None or newer is None:
                adj.append(None)
                regressed = regressed or (older is not None and newer is None)
                continue
            adj.append(round(newer / max(older, 0.05), 2))
            regressed = regressed or newer > max(1.5 * older, older + 1.0)
        row["adj_ratios"] = adj
        # Cumulative bar (ADVICE r12 #3): adjacent-only gating lets a
        # compounding regression (1.4x per step over two steps = 1.96x
        # oldest-to-HEAD) pass silently in an N-way run — apply the same
        # 1.5x/+1.0s bar to the oldest-vs-HEAD pair directly.
        oldest, head = secs[0], secs[-1]
        if len(secs) > 2 and oldest is not None and head is not None:
            row["cum_ratio"] = round(head / max(oldest, 0.05), 2)
            regressed = regressed or head > max(1.5 * oldest, oldest + 1.0)
        row["regressed"] = regressed
        if regressed:
            regressions.append(q)
        rows.append(row)

    # Comparable-set wall ratio oldest-vs-HEAD (VERDICT r15 #8's
    # standing round-close metric): totals over ONLY the queries both
    # versions ran, so registry growth between rounds cannot inflate
    # the ratio. Bar: <= 1.05 or the named per-query regressions above
    # explain it.
    comparable = [
        (r[f"sec_{labels[0]}"], r[f"sec_{labels[-1]}"])
        for r in rows
        if r.get(f"sec_{labels[0]}") is not None
        and r.get(f"sec_{labels[-1]}") is not None
    ]
    comp_old = round(sum(a for a, _ in comparable), 2)
    comp_head = round(sum(b for _, b in comparable), 2)
    out = {
        "versions": labels,
        "sf": versions[-1][1].get("sf"),
        "totals": {lb: v.get("value") for lb, v in versions},
        "synthetic": {lb: v.get("synthetic_sec") for lb, v in versions},
        "passes": {lb: v.get("passes") for lb, v in versions},
        "n_queries": len(rows),
        "n_comparable": len(comparable),
        "comparable_totals": {labels[0]: comp_old, labels[-1]: comp_head},
        "comparable_ratio": (
            round(comp_head / comp_old, 3) if comp_old else None
        ),
        "regressions": regressions,
        "rows": rows,
    }
    # VERDICT r16 #5: distinct artifact per purpose — targeted re-runs
    # must not clobber the close's full-run summary. BENCH_AB_OUT names
    # the file (roundclose sets bench_ab_r{N}_close.json; manual
    # targeted runs should set bench_ab_r{N}_targeted.json).
    out_name = os.environ.get("BENCH_AB_OUT", "bench_ab_result.json")
    with open(os.path.join(REPO, "scripts", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
