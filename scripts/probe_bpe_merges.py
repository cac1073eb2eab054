"""Measured BPE driver-loop scale probe (VERDICT r16 #2b).

text_bpe_learn commits ONE merge per distributed argmax job — exact
Sennrich order, but a real 32k-merge tokenizer would be 32k sequential
Spark jobs. This probe runs the exact learner at PROBE_MERGES (default
128) merges on the 10x replica and records the wall-per-merge curve, so
the claim "the driver loop is the bottleneck, batching is the fix" is a
measurement, not an assertion. The batched learner
(text_bpe_learn_batched, BPE_BATCH_TOPK merges per job wave) is run at
an equivalent merge budget for the direct comparison.

Writes scripts/probe_bpe_merges.json; the analysis lives in SCALE.md
(BPE section).

Usage:
    python scripts/probe_bpe_merges.py [sf_dir]
    PROBE_MERGES=64 python scripts/probe_bpe_merges.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N = int(os.environ.get("PROBE_MERGES", "128"))
SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_stress10x_full"


def main() -> int:
    from pyspark.sql import SparkSession

    from databricks_feature_store_poc_spark.llm.text import (
        BPE_BATCH_TOPK,
        _bpe_learn_merges,
        _bpe_pair_counts,
        _bpe_sym_table,
    )
    from databricks_feature_store_poc_spark.session import (
        ensure_session_confs,
    )
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_confs(spark)

    walls: list = []
    t0 = time.perf_counter()
    merges = _bpe_learn_merges(spark, SF, N, round_walls=walls)
    exact_total = round(time.perf_counter() - t0, 2)

    # Batched learner at the same merge budget: same loop shape as the
    # registered query but rounds run until >= len(merges) merges land,
    # so the comparison is merges-for-merges.
    syms = _bpe_sym_table(spark, SF)
    batched_walls: list = []
    committed = 0
    waves = 0
    t0 = time.perf_counter()
    while committed < len(merges) and waves < N:
        tw = time.perf_counter()
        top = (
            _bpe_pair_counts(syms)
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(BPE_BATCH_TOPK)
            .collect()
        )
        if not top:
            break
        kept = []
        for idx, c in enumerate(top):
            cs = {c["lhs"], c["rhs"], c["lhs"] + c["rhs"]}
            if all(
                cs.isdisjoint({h["lhs"], h["rhs"], h["lhs"] + h["rhs"]})
                for h in top[:idx]
            ):
                kept.append(c)
        for c in kept:
            syms = syms.withColumn(
                "sym",
                F.expr(
                    f"replace(sym, ' {c['lhs']}  {c['rhs']} ',"
                    f" ' {c['lhs']}{c['rhs']} ')"
                ),
            )
        syms = syms.localCheckpoint(eager=False)
        committed += len(kept)
        waves += 1
        batched_walls.append(round(time.perf_counter() - tw, 3))
    batched_total = round(time.perf_counter() - t0, 2)

    def quartiles(xs: list) -> dict:
        if not xs:
            return {}
        s = sorted(xs)
        return {
            "min": s[0],
            "p50": s[len(s) // 2],
            "p90": s[int(len(s) * 0.9)],
            "max": s[-1],
            "mean": round(sum(s) / len(s), 3),
        }

    out = {
        "sf_dir": SF,
        "n_merges_requested": N,
        "n_merges_learned": len(merges),
        "exact": {
            "total_sec": exact_total,
            "per_merge": quartiles(walls),
            "first_10": walls[:10],
            "last_10": walls[-10:],
            "jobs": len(walls),
        },
        "batched": {
            "total_sec": batched_total,
            "merges_committed": committed,
            "waves": waves,
            "per_wave": quartiles(batched_walls),
            "topk": BPE_BATCH_TOPK,
        },
        "speedup_merges_for_merges": (
            round(exact_total / batched_total, 2) if batched_total else None
        ),
        "extrapolated_32k_exact_hours": round(
            32768 * (sum(walls) / len(walls)) / 3600, 1
        )
        if walls
        else None,
        "extrapolated_32k_batched_hours": round(
            32768
            / max(committed / waves, 1)
            * (sum(batched_walls) / len(batched_walls))
            / 3600,
            1,
        )
        if batched_walls
        else None,
    }
    with open(os.path.join(REPO, "scripts", "probe_bpe_merges.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k not in ()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
