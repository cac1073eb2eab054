"""Dump explain("formatted") for named queries into plans/r18/.

    python scripts/dump_plans_r18.py <suffix> <query> [query ...]

suffix is "before" or "after". Run from the tree whose plans you want
(a worktree of the round boundary for "before", the working tree for
"after"). sf0.01 — plan shape is scale-invariant for these queries.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# plans always land in the MAIN repo's plans/r18, even when this script
# runs from a throwaway worktree of the round boundary
OUT_DIR = os.environ.get(
    "PLANS_OUT", os.path.join(REPO, "plans", "r18")
)


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from databricks_feature_store_poc_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("dump-plans-r18")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} bytes, {n_ex} Exchange -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
