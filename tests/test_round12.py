"""Round-12 pins: duplicate-PK / dangling-FK contracts (VERDICT r11 #3)
and the resample span-probe short-circuit (VERDICT r11 #6).

The r12 axis attacks the PK-uniqueness invariant every earlier
distribution preserved: duplicate primary keys with CONFLICTING
payloads, and foreign keys that reference rows that don't exist. The
adjudicated contracts pinned here:

- EXCEPT is set-difference, not multiset-cancel-then-distinct: a
  duplicated left key with one right occurrence must NOT survive.
- rolling_prefix_sums preserves row multiplicity for duplicate
  (key, id) rows instead of silently collapsing them.
- stream_dedup_exactly_once keeps a DETERMINISTIC representative
  (payload minimum) per key — invariant under partitioning.
- the resample span probe takes the cheap path on in-span data and the
  median-clamp path on outlier data, with identical results where both
  paths are defined (span <= half-span).
- replica builds stamp a recipe fingerprint (ADVICE r11 #2).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

TS = datetime.datetime


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_set_except_is_true_set_difference(spark, tmp_path):
    # customer 7 appears TWICE; it has one 1-URGENT order. EXCEPT must
    # drop it entirely — exceptAll().distinct() (the pre-r12 form) kept
    # one surviving copy.
    spark.createDataFrame(
        [(7, "a", 1, 0.0, "X"), (7, "b", 1, 0.0, "X"), (8, "c", 1, 0.0, "X")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(
        [(1, 7, "O", 1.0, TS(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    from databricks_feature_store_poc_spark.operators.relational import (
        set_except,
    )

    got = {r["custkey"] for r in set_except(spark, str(tmp_path)).collect()}
    assert got == {8}


def test_rolling_prefix_sums_preserves_duplicate_id_multiplicity(spark):
    from databricks_feature_store_poc_spark.operators.rolling import (
        rolling_prefix_sums,
    )

    # event_id 1 duplicated at the same ts with different values — both
    # rows must appear in the output, each seeing the tie-inclusive
    # frame (both values included in both rows' windows).
    df = spark.createDataFrame(
        [
            (1, 10, TS(2024, 1, 1, 0, 0), 1.0),
            (1, 10, TS(2024, 1, 1, 0, 0), 2.0),
            (2, 10, TS(2024, 1, 2, 0, 0), 4.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = rolling_prefix_sums(
        df, "user_id", "ts", "event_id", "value", (7,)
    ).collect()
    assert len(out) == 3
    by_id = sorted(out, key=lambda r: (r["event_id"], r["sum_7d"]))
    # both duplicate rows: identical tie-inclusive 7d sum = 1 + 2
    assert by_id[0]["sum_7d"] == 3.0 and by_id[1]["sum_7d"] == 3.0
    assert by_id[2]["sum_7d"] == 7.0  # day-2 row sees all three


def test_stream_dedup_keeps_payload_minimum_deterministically(
    spark, tmp_path
):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 5, "view", TS(2024, 1, 1), 9.0, "{}"),
            (1, 5, "duplicate", TS(2024, 1, 1), 19.0, "{}"),
            (2, 6, "click", TS(2024, 1, 2), 1.0, "{}"),
        ],
    )
    from databricks_feature_store_poc_spark.streaming.windows import (
        stream_dedup_exactly_once,
    )

    rows = {
        r["event_id"]: (r["event_type"], r["value"])
        for r in stream_dedup_exactly_once(spark, sf).collect()
    }
    assert len(rows) == 2
    # payload minimum: 'duplicate' < 'view' on (user_id, event_type, value)
    assert rows[1] == ("duplicate", 19.0)


def test_resample_probe_fast_path_matches_clamp_path(spark, tmp_path):
    """On in-span data the probe skips the median pass; the result must
    equal the clamp formulation exactly (lo=mn, hi=mx when span <= half
    — the med-in-[mn,mx] argument)."""
    from databricks_feature_store_poc_spark.operators import rolling

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1, "view", TS(2024, 1, 10, 10, 5), 1.0, "{}"),
            (2, 1, "view", TS(2024, 1, 10, 14, 55), 2.0, "{}"),
            (3, 2, "view", TS(2024, 1, 11, 3, 0), 4.0, "{}"),
        ],
    )
    out = {
        (r["user_id"], r["hb"]): (r["n_events"], r["filled_value"])
        for r in rolling.feature_resample_1h(spark, sf).collect()
    }
    # user 1: hourly grid 10:00..14:00 = 5 rows, gaps forward-filled
    u1 = sorted(k for k in out if k[0] == 1)
    assert len(u1) == 5
    assert out[u1[0]] == (1, 1.0)
    assert out[u1[1]] == (0, 1.0)  # gap hour carries last value
    assert out[u1[4]] == (1, 2.0)
    assert len([k for k in out if k[0] == 2]) == 1


def test_adversarial_replica_stamps_recipe_fingerprint(tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_mar",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "make_adversarial_replica.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fp1 = mod.recipe_fingerprint("dup", "/root/testdata/sf0.01")
    fp2 = mod.recipe_fingerprint("content", "/root/testdata/sf0.01")
    assert fp1 != fp2 and len(fp1) == 64  # mode is part of the key


def test_dq_pk_violations_reports_duplicates(spark, tmp_path):
    import pyspark.sql.functions as F  # noqa: F401

    # customer 7 duplicated; everything else unique
    spark.createDataFrame(
        [(7, "a", 1, 0.0, "X"), (7, "b", 1, 0.0, "X"), (8, "c", 1, 0.0, "X")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(
        [(1, 9, "O", 1.0, TS(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    for t, schema, rows in (
        ("lineitem",
         "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
         " l_quantity double, l_extendedprice double, l_discount double,"
         " l_tax double, l_returnflag string, l_linestatus string,"
         " l_shipdate timestamp",
         [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(2024, 1, 2))]),
        ("events",
         "event_id long, ts timestamp, user_id long, event_type string,"
         " value double, props string",
         [(1, TS(2024, 1, 1), 7, "view", 1.0, "{}")]),
        ("documents",
         "doc_id long, text string, lang string, source string, n_chars long",
         [(1, "t", "en", "src1", 1)]),
        ("embeddings", "vec_id long, embedding array<float>, label int",
         [(1, [0.1] * 4, 0)]),
    ):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{t}.parquet"))

    from databricks_feature_store_poc_spark.featurestore.quality import (
        dq_fk_orphans,
        dq_pk_violations,
    )

    pk = {r["tbl"]: r for r in dq_pk_violations(spark, str(tmp_path)).collect()}
    assert pk["customer"]["n_dup_keys"] == 1
    assert pk["customer"]["n_rows_in_violation"] == 2
    assert pk["customer"]["max_multiplicity"] == 2
    assert pk["orders"]["n_dup_keys"] == 0

    # orders.o_custkey=9 dangles (no customer 9); lineitem's FKs resolve
    # except l_suppkey=1 (no supplier table rows -> need supplier file)
    spark.createDataFrame(
        [(2, "s", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    fk = {r["fk"]: r for r in dq_fk_orphans(spark, str(tmp_path)).collect()}
    assert fk["orders.o_custkey"]["n_orphans"] == 1
    assert fk["orders.o_custkey"]["n_orphan_keys"] == 1
    assert fk["lineitem.l_orderkey"]["n_orphans"] == 0
    assert fk["lineitem.l_suppkey"]["n_orphans"] == 1


def test_fk_orphans_plans_hash_existence_not_nested_loop(spark):
    """`NOT (fk IN (subquery))` as one expression plans a null-aware
    BroadcastNestedLoopJoin — O(fact x dim), which hung the dup x zipf
    replica. The positive-membership form must plan hash existence
    joins on every edge and no nested loop anywhere."""
    from databricks_feature_store_poc_spark.featurestore.quality import (
        dq_fk_orphans,
    )

    plan = (
        dq_fk_orphans(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ExistenceJoin") == 3
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
