"""Standing round-close gate — one command for the full checklist.

VERDICT r8 'do this' #4 promoted the replica oracle gates (which found
q1/q17's only-at-scale oracle defects in r8 and text_tfidf_audit's
unsound witness bound in r9) from round extras to REQUIRED round-close
steps. This script is that promotion made executable: every step the
round-close block of ROUND{N}_NOTES.md reports, in order, with one
summary JSON the notes can quote.

Steps (each recorded with wall seconds + pass/fail; a failure does NOT
stop later steps — the close block needs the whole picture):

  1. pytest          — `pytest tests/ -q` (full suite, no -x: count all)
  2. harness_sf0.001 — full-registry driver-style oracle gate
  3. harness_sf0.01  —   "        (the driver's own SF)
  4. harness_sf0.1   —   "
  5. harness_10x     — fourth distribution: uniform 10x clone replica
                       (built via stress_registry_10x.py if absent)
  6. harness_zipf    — fifth distribution: zipf(1)-skewed replica
                       (built via make_skewed_replica.py if absent);
                       rotating quarter-slice since r13 (offset 1)
  7. harness_adversarial — sixth distribution: the content edge-case
                       replica (NULL keys, unicode/CRLF, malformed JSON,
                       epoch/far-future timestamps, zero-norm vectors;
                       VERDICT r10 #4 promoted it to round-close)
  8. harness_empty   — seventh: every table 0 rows (schema preserved);
                       rows-only queries legitimately return 0 rows, so
                       this gate passes --allow-empty-rows-only
  9. harness_single  — eighth: every table truncated to its first row
                       (same flag)
 10. harness_adv_zipf — ninth: the content corruption applied ON the
                       zipf-10x replica — skew x NULLs interact (this
                       combination caught tpch_q16's NOT-IN NULL
                       divergence that six single-axis gates missed)
 11. harness_dup     — tenth: referential/duplicate corruption (dup PKs
                       in every keyed table + dangling FKs; the r12
                       axis, VERDICT r11 #3)
 12. harness_dup_zipf — eleventh: duplicate-PK corruption ON the
                       zipf-10x replica (r12's richest gate: caught a
                       nested-loop-join hang, a nondeterministic
                       oracle, and a semi-vs-inner divergence that no
                       single-axis gate saw); rotating quarter-slice
 12b. harness_hotdup_zipf — fourteenth: hot-dup corruption ON the
                       zipf-10x replica (built r13, standing since r14
                       per VERDICT r13 #4); rotating quarter-slice
 13. harness_hotdup  — thirteenth distribution (r13, VERDICT r12 #2):
                       skew OF duplicates — one key per table
                       duplicated ~1000x, half the copies full-row
                       identical, half payload-distinct; full registry
 14. harness_adv_sf01 — the content corruption applied on
                       sf0.1 (promoted per VERDICT r11 #4 — the
                       sf0.1-sourced corpus caught the IVF nprobe
                       recall margin that six sf0.01 gates missed);
                       rotating quarter-slice + floor sentinels
 15. bench           — bench.py median-of-3 at sf0.1 -> bench_result.json
 16. bench_ab        — STANDING (VERDICT r15 #8): full-registry
                       fresh-JVM A/B vs the previous round-final
                       commit, auto-resolved as the latest driver
                       round-boundary commit ('round N: ...');
                       records the comparable-set wall ratio (bar:
                       <= 1.05 or named regressions). ROUNDCLOSE_REF
                       overrides the ref; ROUNDCLOSE_REF=skip disables.

Slice offsets (r13): sliced gates pass distinct offsets to the
rotating quarter (10x:0, zipf:1, adv_zipf:2, dup_zipf:3, adv_sf01:2),
so one close covers all four quarters across gates and each gate
still covers the registry over any four consecutive rounds.

Wall-time control (VERDICT r11 #5): the uniform-10x step alone was
3354 s of a ~100 min close, so by default it now runs a DETERMINISTIC
QUARTER-SLICE of the registry that rotates by round number (derived
from the highest CORRECTNESS_r{N}.json present + 1, so each round
exercises a different quarter and any four consecutive rounds cover
the registry) — set ROUNDCLOSE_10X_FULL=1 for the full run.

Replica staleness (ADVICE r11 #2): adversarial replicas are stamped
with a recipe fingerprint (hash of make_adversarial_replica.py +
mode + src) at build time and are REBUILT when the stamp mismatches,
instead of silently reusing a stale /tmp replica.

Usage:
    python scripts/roundclose.py
    ROUNDCLOSE_REF=<git-ref> python scripts/roundclose.py   # + bench_ab
    ROUNDCLOSE_SKIP=pytest,bench python scripts/roundclose.py

Writes scripts/roundclose_result.json. Exit 0 iff every executed step
passed.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
SKIP = set(filter(None, os.environ.get("ROUNDCLOSE_SKIP", "").split(",")))
def _default_ref() -> str | None:
    """STANDING bench_ab reference (VERDICT r15 #8): the previous
    round's final commit is the latest driver round-boundary commit
    ('round N: verdict/advice/correctness/bench'). ROUNDCLOSE_REF
    overrides; ROUNDCLOSE_REF=skip disables."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo, check=True, capture_output=True, text=True,
        ).stdout.strip()
        # ADVICE r16 #2: search from HEAD~1 so a re-run after the
        # current round's boundary commit never A/Bs HEAD against
        # itself, and re-anchor the match to the SUBJECT line (git's
        # --grep matches any body line).
        out = subprocess.run(
            ["git", "log", "HEAD~1", "--grep", "^round [0-9]*:",
             "-n", "20", "--format=%H %s"],
            cwd=repo, check=True, capture_output=True, text=True,
        ).stdout
        for line in out.splitlines():
            sha, _, subject = line.partition(" ")
            if sha != head and re.match(r"round [0-9]+:", subject):
                return sha
        return None
    except Exception:
        return None


REF = os.environ.get("ROUNDCLOSE_REF") or _default_ref()
if REF == "skip":
    REF = None

REPLICA_10X = "/tmp/spark_graft_stress10x_full"
REPLICA_ZIPF = "/tmp/spark_graft_zipf"
REPLICA_ADV = "/tmp/spark_graft_adversarial"
REPLICA_EMPTY = "/tmp/spark_graft_empty"
REPLICA_SINGLE = "/tmp/spark_graft_single"
REPLICA_ADV_ZIPF = "/tmp/spark_graft_adv_zipf"
REPLICA_DUP = "/tmp/spark_graft_dup"
REPLICA_ADV_SF01 = "/tmp/spark_graft_adversarial_sf01"
REPLICA_DUP_ZIPF = "/tmp/spark_graft_dup_zipf"
REPLICA_HOTDUP = "/tmp/spark_graft_hotdup"
REPLICA_HOTDUP_ZIPF = "/tmp/spark_graft_hotdup_zipf"
REPLICA_ALLNULL = "/tmp/spark_graft_allnull"

_HARNESS_TAIL = re.compile(r"(\d+)/(\d+) passed")


def _round_number() -> int:
    """Current round = highest CORRECTNESS_r{N}.json on disk + 1 (the
    driver writes the current round's file only after the round)."""
    import glob

    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 0


def _registry_keys() -> list[str]:
    """Registry key list via a subprocess (keeps this process JVM-free)."""
    code, out, _ = _run([
        PY, "-c",
        "import __spark_entry__ as e; print('\\n'.join(e.queries()))",
    ])
    if code != 0:
        print(out[-2000:], flush=True)
        return []
    return [
        ln.strip()
        for ln in out.splitlines()
        if re.fullmatch(r"[a-z0-9_]+", ln.strip())
    ]


def _run(cmd: list[str], env: dict | None = None) -> tuple[int, str, float]:
    t0 = time.perf_counter()
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(
        cmd, cwd=REPO, env=e, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    return p.returncode, p.stdout, time.perf_counter() - t0


def _step(results: list, name: str, fn) -> None:
    if name in SKIP:
        results.append({"step": name, "skipped": True})
        print(f"== {name}: SKIPPED (ROUNDCLOSE_SKIP)", flush=True)
        return
    print(f"== {name} ...", flush=True)
    rec = fn()
    rec["step"] = name
    results.append(rec)
    print(
        f"== {name}: {'PASS' if rec['ok'] else 'FAIL'}"
        f" ({rec['sec']:.0f}s) {rec.get('detail', '')}",
        flush=True,
    )


def step_pytest() -> dict:
    code, out, sec = _run([PY, "-m", "pytest", "tests/", "-q"])
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    return {"ok": code == 0, "sec": round(sec, 1), "detail": tail}


def step_harness(
    sf_dir: str, allow_empty: bool = False, queries: list[str] | None = None
) -> dict:
    cmd = [PY, "tests/harness.py", "--sf", sf_dir]
    if allow_empty:
        cmd.append("--allow-empty-rows-only")
    if queries:
        cmd.extend(queries)
    code, out, sec = _run(cmd)
    m = _HARNESS_TAIL.search(out)
    detail = m.group(0) if m else out.strip().splitlines()[-1:]
    failed = []
    fm = re.search(r"FAILED: (\[.*\])", out)
    if fm:
        failed = fm.group(1)
    return {
        "ok": code == 0,
        "sec": round(sec, 1),
        "detail": detail,
        "sf_dir": sf_dir,
        **({"failed": failed} if failed else {}),
    }


def _ensure_10x() -> bool:
    if os.path.isdir(os.path.join(REPLICA_10X, "lineitem.parquet")):
        return True
    print(f"   building {REPLICA_10X} (stress_registry_10x.py)...", flush=True)
    code, out, _ = _run(
        [PY, "scripts/stress_registry_10x.py"],
        env={"STRESS_ONLY": "filter_pred", "STRESS_KEEP_REPLICA": "1"},
    )
    if code != 0:
        print(out[-2000:], flush=True)
    return code == 0


def _adv_fingerprint(mode: str, src: str) -> str:
    """Mirror of make_adversarial_replica.recipe_fingerprint, imported
    from the script itself so the two can never drift (ADVICE r11 #2)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_mar", os.path.join(REPO, "scripts", "make_adversarial_replica.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.recipe_fingerprint(mode, src)


def _make_adv(mode: str, dst: str, src: str | None = None):
    def ensure() -> bool:
        src_eff = src if src is not None else "/root/testdata/sf0.01"
        marker = os.path.join(dst, "_recipe_fingerprint.json")
        if os.path.isdir(os.path.join(dst, "lineitem.parquet")):
            # a replica without a matching recipe stamp is STALE — the
            # corruption recipe changed since it was built (r11's recipe
            # change silently reused an r10 replica; ADVICE r11 #2)
            try:
                with open(marker) as f:
                    stamped = json.load(f).get("fingerprint")
            except (OSError, json.JSONDecodeError):
                stamped = None
            if stamped == _adv_fingerprint(mode, src_eff):
                return True
            print(f"   {dst}: recipe fingerprint stale -> rebuilding",
                  flush=True)
        env = {"ADV_MODE": mode, "ADV_DST": dst}
        if src is not None:
            env["ADV_SRC"] = src
        print(f"   building {dst} (make_adversarial_replica.py)...", flush=True)
        code, out, _ = _run([PY, "scripts/make_adversarial_replica.py"], env=env)
        if code != 0:
            print(out[-2000:], flush=True)
        return code == 0

    return ensure


def _ensure_zipf() -> bool:
    if os.path.isdir(os.path.join(REPLICA_ZIPF, "lineitem.parquet")):
        return True
    print(f"   building {REPLICA_ZIPF} (make_skewed_replica.py)...", flush=True)
    code, out, _ = _run([PY, "scripts/make_skewed_replica.py"])
    if code != 0:
        print(out[-2000:], flush=True)
    return code == 0


def step_harness_replica(
    ensure, sf_dir: str, allow_empty: bool = False,
    queries: list[str] | None = None,
) -> dict:
    if not ensure():
        return {"ok": False, "sec": 0.0, "detail": f"replica build failed: {sf_dir}"}
    return step_harness(sf_dir, allow_empty=allow_empty, queries=queries)


def _10x_slice(offset: int = 0) -> list[str] | None:
    """Deterministic rotating quarter of the registry for the heavy
    gates (VERDICT r11 #5 — uniform-10x was >half the close wall; r12
    #6 extended the slicing to zipf/adv_zipf). Each sliced gate passes
    a distinct ``offset`` so one round's close covers DIFFERENT
    quarters across gates while every gate still covers the registry
    over any four consecutive rounds. Returns None (= full registry)
    when ROUNDCLOSE_10X_FULL=1 or when the registry can't be
    enumerated (fail loud by running everything)."""
    if os.environ.get("ROUNDCLOSE_10X_FULL"):
        return None
    keys = _registry_keys()
    if not keys:
        return None
    rnd = _round_number()
    picked = [
        k for i, k in enumerate(sorted(keys)) if i % 4 == (rnd + offset) % 4
    ]
    # sentinels run EVERY round regardless of the rotation: the flagship
    # (tier-0 adjudication slot) and the queries with measured-headroom
    # contract floors asserted in-plan (the IVF nprobe margin was an
    # adv_sf01 catch — a rotating slice must never skip the floors)
    for sentinel in ("training_set_flagship", "sim_ivf_topk",
                     "sim_ivf_quantized", "sim_ann_lsh"):
        if sentinel in keys and sentinel not in picked:
            picked.insert(0, sentinel)
    print(
        f"   slice: round {rnd} offset {offset} -> quarter "
        f"{(rnd + offset) % 4}, "
        f"{len(picked)}/{len(keys)} queries",
        flush=True,
    )
    return picked


def step_bench() -> dict:
    code, out, sec = _run([PY, "bench.py"])
    detail = ""
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            try:
                j = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" not in j:  # per-pass progress lines also JSON
                continue
            detail = f"{j.get('value')}s / {len(j.get('queries', {}))} queries"
            break
    return {"ok": code == 0, "sec": round(sec, 1), "detail": detail}


def step_bench_ab() -> dict:
    # VERDICT r16 #5: the close's full-run summary gets its own
    # round-stamped artifact so targeted re-runs can't clobber it.
    env = dict(os.environ)
    env["BENCH_AB_OUT"] = f"bench_ab_r{_round_number()}_close.json"
    code, out, sec = _run([PY, "scripts/bench_ab.py", REF], env=env)
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    return {
        "ok": code == 0, "sec": round(sec, 1), "detail": tail, "ref": REF,
        "artifact": env["BENCH_AB_OUT"],
    }


def main() -> int:
    results: list[dict] = []
    _step(results, "pytest", step_pytest)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        _step(results, f"harness_{sf.rsplit('/', 1)[-1]}", lambda sf=sf: step_harness(sf))
    _step(
        results, "harness_10x",
        lambda: step_harness_replica(
            _ensure_10x, REPLICA_10X, queries=_10x_slice()
        ),
    )
    # zipf runs a rotating quarter at offset 1 (VERDICT r12 #6 — the
    # full zipf pass was 359 s; four consecutive rounds still cover
    # the registry, and a DIFFERENT quarter than the 10x gate runs in
    # the same close)
    _step(
        results, "harness_zipf",
        lambda: step_harness_replica(
            _ensure_zipf, REPLICA_ZIPF, queries=_10x_slice(1)
        ),
    )
    _step(
        results, "harness_adversarial",
        lambda: step_harness_replica(
            _make_adv("content", REPLICA_ADV), REPLICA_ADV
        ),
    )
    _step(
        results, "harness_empty",
        lambda: step_harness_replica(
            _make_adv("empty", REPLICA_EMPTY), REPLICA_EMPTY, allow_empty=True
        ),
    )
    _step(
        results, "harness_single",
        lambda: step_harness_replica(
            _make_adv("single", REPLICA_SINGLE), REPLICA_SINGLE,
            allow_empty=True,
        ),
    )

    # fifteenth distribution (r14): allnull — keys intact, every payload
    # column NULL. Degenerate VALUES at full cardinality; allow_empty
    # because 0 rows IS the correct output for text/near-dup queries on
    # an all-NULL corpus (same convention as empty/single).
    _step(
        results, "harness_allnull",
        lambda: step_harness_replica(
            _make_adv("allnull", REPLICA_ALLNULL), REPLICA_ALLNULL,
            allow_empty=True,
        ),
    )

    def _ensure_adv_zipf() -> bool:
        # the combined replica corrupts the zipf replica, so build that
        # first (it normally already exists from the harness_zipf step)
        return _ensure_zipf() and _make_adv(
            "content", REPLICA_ADV_ZIPF, src=REPLICA_ZIPF
        )()

    # adv_zipf: rotating quarter at offset 2 (VERDICT r12 #6)
    _step(
        results, "harness_adv_zipf",
        lambda: step_harness_replica(
            _ensure_adv_zipf, REPLICA_ADV_ZIPF, queries=_10x_slice(2)
        ),
    )
    _step(
        results, "harness_dup",
        lambda: step_harness_replica(
            _make_adv("dup", REPLICA_DUP), REPLICA_DUP
        ),
    )
    # thirteenth distribution (VERDICT r12 #2): skew OF duplicates —
    # one key per table duplicated ~1000x (half identical copies, half
    # payload-distinct). Full registry: the axis is new in r13 and the
    # sf0.01-sourced replica gates in ~3 min.
    _step(
        results, "harness_hotdup",
        lambda: step_harness_replica(
            _make_adv("hotdup", REPLICA_HOTDUP), REPLICA_HOTDUP
        ),
    )
    def _ensure_dup_zipf() -> bool:
        # duplicate-PK corruption ON the zipf-10x replica — the
        # combination that caught the dq_fk_orphans nested-loop hang,
        # the gram-oracle rid nondeterminism, and q11's semi-vs-inner
        # divergence in r12 (three finds no single-axis gate saw).
        # Runs the rotating quarter-slice for wall discipline; its
        # first FULL run is recorded in ROUND12_NOTES.
        return _ensure_zipf() and _make_adv(
            "dup", REPLICA_DUP_ZIPF, src=REPLICA_ZIPF
        )()

    _step(
        results, "harness_dup_zipf",
        lambda: step_harness_replica(
            _ensure_dup_zipf, REPLICA_DUP_ZIPF, queries=_10x_slice(3)
        ),
    )

    def _ensure_hotdup_zipf() -> bool:
        # hot-dup (skew-of-duplicates) corruption ON the zipf-10x
        # replica — the combined axis built in r13; standing rotating
        # quarter-slice per VERDICT r13 #4 (offset 4 == the 10x gate's
        # quarter, on a different distribution)
        return _ensure_zipf() and _make_adv(
            "hotdup", REPLICA_HOTDUP_ZIPF, src=REPLICA_ZIPF
        )()

    _step(
        results, "harness_hotdup_zipf",
        lambda: step_harness_replica(
            _ensure_hotdup_zipf, REPLICA_HOTDUP_ZIPF, queries=_10x_slice(4)
        ),
    )
    # adv_sf01 runs the same rotating quarter-slice as the 10x gate (a
    # full sf0.1 oracle pass is ~15-20 min; the slice keeps the close
    # inside its wall budget while four consecutive rounds still cover
    # the registry at this scale — ROUNDCLOSE_10X_FULL=1 forces full)
    _step(
        results, "harness_adv_sf01",
        lambda: step_harness_replica(
            _make_adv("content", REPLICA_ADV_SF01, src="/root/testdata/sf0.1"),
            REPLICA_ADV_SF01, queries=_10x_slice(2),
        ),
    )
    _step(results, "bench", step_bench)
    if REF:
        _step(results, "bench_ab", step_bench_ab)

    ok = all(r.get("ok", True) for r in results)
    # staleness stamps (VERDICT r13 #2, third-time order: the artifact
    # shipped byte-identical to the prior round twice) — the result now
    # records the commit and registry size it was produced at, so a
    # stale artifact is self-evident instead of needing a ledger diff
    code, head, _ = _run(["git", "rev-parse", "--short", "HEAD"])
    out = {
        "ok": ok,
        "round": _round_number(),
        "git_head": head.strip() if code == 0 else None,
        "n_registry": len(_registry_keys()),
        "steps": results,
        "ref": REF,
    }
    with open(os.path.join(REPO, "scripts", "roundclose_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"roundclose_ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
