"""Dev-loop harness mimicking the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle side-by-side on the
same parquet tables and compares row count, column names/types, and an
order-insensitive value hash — the same three checks the driver records in
CORRECTNESS_r{N}.json. Usable as a pytest helper and as a CLI:

    python tests/harness.py [query ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.sources.catalog import TABLES  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.01"


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part-files (the stress
        # replicas); driver testdata is single-file. Glob the former so
        # the harness runs against either layout.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v) -> str:
    """Normalize one cell for order-insensitive hashing (engine-agnostic)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        # Type-sensitive on purpose: the driver's hash distinguishes
        # BIGINT 63058 from DOUBLE 63058.0 (fn_math went red in r3 while
        # this harness, which used to collapse integral floats to int,
        # stayed green). repr keeps the ".0" so int-vs-float oracle type
        # mismatches fail HERE first. Rounding to 9 decimals stays — the
        # queries own their cross-engine float contracts by rounding
        # in-plan where bits can differ.
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # The driver's normalizer evidently fetches DECIMAL through a
        # pandas/Arrow path that renders one engine's Decimal('-130')
        # against the other's float -130.0 (text_zipf_fit was
        # CORRECTNESS_r15's only red: rows+schema green, hash red, values
        # bit-identical — VERDICT r15 #1). Mirror the worst case here:
        # normalize Decimal down the float path so a DECIMAL output
        # column that would be driver-fragile fails THIS harness too.
        # (Queries should not emit DECIMAL at all — tests/test_plans.py
        # lints the whole registry for it.)
        return _norm_cell(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(
    name: str,
    spark,
    sf_dir: str = DEFAULT_SF,
    verbose: bool = True,
    allow_empty_rows_only: bool = False,
) -> dict:
    load_all_queries()
    fn = QUERIES[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    result = {
        "name": name,
        "rows_spark": len(spark_rows),
        "cols_spark": spark_cols,
        "ok": None,
    }
    if name not in ORACLES:
        # rows > 0 required: a zero-row rows-only query proves nothing and
        # the driver's weak check would read as green — keep local green
        # strictly harder than driver green. On DEGENERATE replicas
        # (empty/single tables) zero rows IS the correct output, so the
        # gate passes --allow-empty-rows-only there.
        result["ok"] = len(spark_rows) > 0 or allow_empty_rows_only
        result["mode"] = "rows-only"
        if verbose:
            status = "rows-only" if result["ok"] else "FAIL rows-only 0 rows"
            print(f"  {name}: {status}, {len(spark_rows)} rows")
        return result

    con = duckdb_conn(sf_dir)
    rel = con.sql(ORACLES[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    con.close()

    issues = []
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    else:
        hs = value_hash(spark_rows, spark_cols)
        hd = value_hash(duck_rows, duck_cols)
        if hs != hd:
            issues.append("value-hash mismatch")
            if verbose:
                _show_diff(spark_rows, spark_cols, duck_rows, duck_cols)
    result["ok"] = not issues
    result["issues"] = issues
    result["mode"] = "oracle"
    if verbose:
        status = "OK" if result["ok"] else f"FAIL {issues}"
        print(f"  {name}: {status} ({len(spark_rows)} rows)")
    return result


def _show_diff(srows, scols, drows, dcols, limit=5):
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = {"|".join(_norm_cell(r[i]) for i in sorder) for r in srows}
    dset = {"|".join(_norm_cell(r[i]) for i in dorder) for r in drows}
    cols = sorted(scols)
    print(f"    columns: {cols}")
    for line in list(sset - dset)[:limit]:
        print(f"    spark-only: {line}")
    for line in list(dset - sset)[:limit]:
        print(f"    duck-only:  {line}")


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    sf_dir = DEFAULT_SF
    allow_empty = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":  # value-taking form: --sf PATH
            i += 1
            sf_dir = argv[i]
        elif a == "--allow-empty-rows-only":
            allow_empty = True
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    from databricks_feature_store_poc_spark.session import get_spark

    spark = get_spark("oracle-harness")
    load_all_queries()
    names = args or sorted(QUERIES)
    failed = []
    from databricks_feature_store_poc_spark.cacheutil import (
        release_checkpoints,
    )

    for name in names:
        try:
            r = compare(
                name, spark, sf_dir, allow_empty_rows_only=allow_empty
            )
            if not r["ok"]:
                failed.append(name)
        except Exception as e:
            print(f"  {name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
        # the collect above fully consumed the plan: release this
        # query's localCheckpoint blocks (r18, VERDICT r17 #5)
        release_checkpoints(spark)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
