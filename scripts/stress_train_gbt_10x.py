"""train_gbt at 10x: the distributed-training scale datapoint
(VERDICT r7 'do this' #7).

The reference trains CatBoost on a driver-side pandas frame
(02_model_training.py:422-436) — the 100 TB cliff SURVEY §7 names.
`train_gbt` is the documented replacement (pyspark.ml GBTClassifier,
executor-distributed); it has unit tests but, until this script, no
at-scale datapoint. Here: assemble the FLAGSHIP training set on the
10x FK-consistent replica (~1.5M spine rows), train a binary GBT on
the same feature triple the unit test uses (numeric c_acctbal +
o_totalprice, categorical c_mktsegment via StringIndexer->nominal
metadata), score the training frame, and compute exact ROC AUC with
the eval_auc_roc machinery (Mann-Whitney in doubled integer rank
units) as the sanity gate.

Label: the natural label (o_orderstatus) is UNIFORM NOISE in the
synthetic testdata (measured corr with every feature ~0.0007 — a
first run against it scored AUC 0.513, i.e. nothing to learn), so the
sanity label is a constructed nonlinear interaction of the REAL
feature columns: (c_acctbal > 4500) XOR (c_mktsegment in
{BUILDING, AUTOMOBILE}). A depth-3 GBT separates that only if the
distributed fit, the StringIndexer->nominal-metadata categorical
path, AND the assembled-vector scoring all work — a linear model (or
a broken categorical pipeline) stays at ~0.5, so the >0.9 bar is a
real end-to-end assertion, not decoration.

Writes scripts/stress_train_gbt_10x.json:
  {rows_10x, fit_sec, score_sec, auc, auc_sanity_ok}

Usage: python scripts/stress_train_gbt_10x.py    # ~minutes
       STRESS_KEEP_REPLICA=1 ... to reuse the replica across runs
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def exact_auc(scored, label_col: str, score_col: str) -> float:
    """Exact Mann-Whitney AUC — the eval_auc_roc formulation (doubled
    integer rank units, one groupBy(score) collapse + one window over
    the distinct-score table; the raw frame is never globally sorted)."""
    g = scored.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(label_col).cast("long").alias("n_pos"),
    )
    w = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, -1)
    c = g.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    t = c.agg(
        F.sum(F.col("n_pos") * (2 * F.col("cum_before") + F.col("n") + 1))
        .cast("long").alias("s2r"),
        F.sum("n_pos").cast("long").alias("p"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("nn"),
    ).first()
    denom = 2 * t["p"] * t["nn"]
    return float(t["s2r"] - t["p"] * (t["p"] + 1)) / denom if denom else float("nan")


def main() -> int:
    os.environ.setdefault("STRESS_CLONES", "10")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import stress_registry_10x as stress
    from databricks_feature_store_poc_spark.featurestore.mlpath import train_gbt
    from databricks_feature_store_poc_spark.registry import (
        QUERIES,
        load_all_queries,
    )
    from databricks_feature_store_poc_spark.session import get_spark

    load_all_queries()
    spark = get_spark("stress-train-gbt-10x")
    stress.build_replica(spark)

    ts = QUERIES["training_set_flagship"](spark, stress.DST)
    # XOR label over the real feature columns (see module docstring:
    # the testdata's o_orderstatus is uniform noise, AUC-unlearnable)
    train = ts.select(
        F.col("c_acctbal").cast("double").alias("f1"),
        F.col("o_totalprice").cast("double").alias("f2"),
        F.col("c_mktsegment").alias("segment"),
        (
            (F.col("c_acctbal") > 4500)
            != F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        ).cast("int").alias("label"),
    )
    n = train.count()
    print(f"# 10x training rows: {n}", file=sys.stderr)

    t0 = time.perf_counter()
    model = train_gbt(train, ["f1", "f2", "segment"], "label", max_iter=10)
    fit_sec = time.perf_counter() - t0
    print(f"# fit: {fit_sec:.1f}s", file=sys.stderr)

    from pyspark.ml.functions import vector_to_array

    t0 = time.perf_counter()
    scored = model.transform(train).select(
        "label",
        # P(class=1) as the ranking score, rounded so groupBy(score)
        # collapses float noise into a bounded distinct-score table
        F.round(vector_to_array(F.col("probability"))[1], 6).alias("score"),
    )
    auc = exact_auc(scored, "label", "score")
    score_sec = time.perf_counter() - t0
    print(f"# score+auc: {score_sec:.1f}s, auc={auc:.4f}", file=sys.stderr)

    out = {
        "rows_10x": n,
        "fit_sec": round(fit_sec, 1),
        "score_sec": round(score_sec, 1),
        "auc": round(auc, 4),
        "auc_sanity_ok": auc > 0.9,
        "label": "xor(c_acctbal>4500, segment in {BUILDING,AUTOMOBILE})",
        "clones": stress.CLONES,
    }
    with open(os.path.join(REPO, "scripts", "stress_train_gbt_10x.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if not os.environ.get("STRESS_KEEP_REPLICA"):
        shutil.rmtree(stress.DST, ignore_errors=True)
    return 0 if out["auc_sanity_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
