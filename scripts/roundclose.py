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
                       (built via make_skewed_replica.py if absent)
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
 11. bench           — bench.py median-of-3 at sf0.1 -> bench_result.json
 12. bench_ab        — full-registry A/B vs the previous round-final
                       commit (only when ROUNDCLOSE_REF is set)

Usage:
    python scripts/roundclose.py                      # steps 1-7
    ROUNDCLOSE_REF=<git-ref> python scripts/roundclose.py   # + step 8
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
REF = os.environ.get("ROUNDCLOSE_REF")

REPLICA_10X = "/tmp/spark_graft_stress10x_full"
REPLICA_ZIPF = "/tmp/spark_graft_zipf"
REPLICA_ADV = "/tmp/spark_graft_adversarial"
REPLICA_EMPTY = "/tmp/spark_graft_empty"
REPLICA_SINGLE = "/tmp/spark_graft_single"
REPLICA_ADV_ZIPF = "/tmp/spark_graft_adv_zipf"

_HARNESS_TAIL = re.compile(r"(\d+)/(\d+) passed")


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


def step_harness(sf_dir: str, allow_empty: bool = False) -> dict:
    cmd = [PY, "tests/harness.py", "--sf", sf_dir]
    if allow_empty:
        cmd.append("--allow-empty-rows-only")
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


def _make_adv(mode: str, dst: str, src: str | None = None):
    def ensure() -> bool:
        if os.path.isdir(os.path.join(dst, "lineitem.parquet")):
            return True
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


def step_harness_replica(ensure, sf_dir: str, allow_empty: bool = False) -> dict:
    if not ensure():
        return {"ok": False, "sec": 0.0, "detail": f"replica build failed: {sf_dir}"}
    return step_harness(sf_dir, allow_empty=allow_empty)


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
    code, out, sec = _run([PY, "scripts/bench_ab.py", REF])
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    return {"ok": code == 0, "sec": round(sec, 1), "detail": tail, "ref": REF}


def main() -> int:
    results: list[dict] = []
    _step(results, "pytest", step_pytest)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        _step(results, f"harness_{sf.rsplit('/', 1)[-1]}", lambda sf=sf: step_harness(sf))
    _step(
        results, "harness_10x",
        lambda: step_harness_replica(_ensure_10x, REPLICA_10X),
    )
    _step(
        results, "harness_zipf",
        lambda: step_harness_replica(_ensure_zipf, REPLICA_ZIPF),
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

    def _ensure_adv_zipf() -> bool:
        # the combined replica corrupts the zipf replica, so build that
        # first (it normally already exists from the harness_zipf step)
        return _ensure_zipf() and _make_adv(
            "content", REPLICA_ADV_ZIPF, src=REPLICA_ZIPF
        )()

    _step(
        results, "harness_adv_zipf",
        lambda: step_harness_replica(_ensure_adv_zipf, REPLICA_ADV_ZIPF),
    )
    _step(results, "bench", step_bench)
    if REF:
        _step(results, "bench_ab", step_bench_ab)

    ok = all(r.get("ok", True) for r in results)
    out = {
        "ok": ok,
        "steps": results,
        "ref": REF,
    }
    with open(os.path.join(REPO, "scripts", "roundclose_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"roundclose_ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
