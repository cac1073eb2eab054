"""Round-7 hardening tests: memo short-circuits, staging invalidation,
and the new confirmation queries (simhash audit twin, streaming parity,
quantized-IVF ANN).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_TEST
from tests.harness import compare

load_all_queries()


def test_kmeans_fit_runs_once_per_corpus(spark, monkeypatch):
    """ADVICE r6: the SECOND caller must hit the assignment memo before
    the collect-driven fit re-executes — patch the fit internals to
    explode and prove they are never touched on a warm call."""
    from databricks_feature_store_poc_spark.llm import vectors

    first = vectors.kmeans_fit_assign(spark, SF_TEST)
    assert first is not None

    def boom(*a, **k):  # any fit work on the warm path is a bug
        raise AssertionError("fit re-executed despite memo hit")

    monkeypatch.setattr(vectors, "kmeans_assign", boom)
    monkeypatch.setattr(vectors, "kmeans_update", boom)
    warm = vectors.kmeans_fit_assign(spark, SF_TEST)
    assert warm is first


def test_binary_staging_invalidates_on_fingerprint(spark, tmp_path, monkeypatch):
    """Regenerating the corpus in place (same row count, different
    bytes) must re-stage, and re-staging must clear stale files."""
    import os
    import shutil

    src = str(tmp_path / "sfX")
    os.makedirs(src)
    shutil.copy(f"{SF_TEST}/documents.parquet", f"{src}/documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(tmp_path / "stage"))

    r1 = QUERIES["scan_binary_files"](spark, src).count()
    stage_dir = os.path.join(str(tmp_path / "stage"), "spark_graft_binfiles_sfX")
    # plant a stale file that only a directory reset would remove
    with open(os.path.join(stage_dir, "999999990.txt"), "w") as f:
        f.write("stale")
    # rewrite the source in place: same count, fresh mtime/fingerprint
    spark.read.parquet(f"{src}/documents.parquet").write.mode("overwrite").parquet(
        f"{src}/doc_tmp.parquet"
    )
    os.remove(f"{src}/documents.parquet")
    os.rename(f"{src}/doc_tmp.parquet", f"{src}/documents.parquet")

    r2 = QUERIES["scan_binary_files"](spark, src).count()
    assert r2 == r1  # stale planted file did not survive the re-stage
    assert not os.path.exists(os.path.join(stage_dir, "999999990.txt"))


def test_simhash_audit_oracle_and_booleans(spark):
    r = compare("dedup_simhash_audit", spark, SF_TEST, verbose=False)
    assert r["ok"], r.get("issues")
    row = QUERIES["dedup_simhash_audit"](spark, SF_TEST).collect()[0]
    assert row["guarantee_recall_ok"] and row["radius_ok"] and row["signal_ok"]
    assert row["n_exact_pairs"] > 0


def test_simhash_fingerprints_memoized(spark):
    from databricks_feature_store_poc_spark.llm.dedup import simhash_fingerprints

    a = simhash_fingerprints(spark, SF_TEST)
    b = simhash_fingerprints(spark, SF_TEST)
    assert a is b  # second consumer reuses the persisted table


def test_overwrite_barrier_modes(spark):
    """VERDICT r6 #5: the cluster path must keep lineage recomputable
    (persist, NOT localCheckpoint) when no checkpoint dir is set; the
    local path truncates lineage via localCheckpoint."""
    from databricks_feature_store_poc_spark.featurestore.merge import (
        _overwrite_barrier,
    )

    df = spark.range(100).withColumn("v", F.col("id") * 2)

    local = _overwrite_barrier(spark, df, is_local=True)
    # a checkpoint replaces the plan with a scan of materialized blocks
    assert "LogicalRDD" in local._jdf.queryExecution().analyzed().toString()

    cluster = _overwrite_barrier(spark, df, is_local=False)
    analyzed = cluster._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" not in analyzed  # lineage intact (recomputable)
    assert cluster.storageLevel.useDisk  # disk-backed persist
    assert cluster.count() == 100
    cluster.unpersist()


def test_stream_true_parity_query(spark):
    r = compare("stream_true_parity", spark, SF_TEST, verbose=False)
    assert r["ok"], r.get("issues")
    row = QUERIES["stream_true_parity"](spark, SF_TEST).collect()[0]
    assert row["n_diff_rows"] == 0 and row["n_windows"] > 0


def test_ivf_quantized_oracle_and_agreement(spark):
    r = compare("sim_ivf_quantized", spark, SF_TEST, verbose=False)
    assert r["ok"], r.get("issues")
    rows = QUERIES["sim_ivf_quantized"](spark, SF_TEST).collect()
    assert all(x["recall_ok"] and x["delta_ok"] for x in rows)


def test_ivf_fit_memoized_across_variants(spark):
    """Float and quantized searches must share one fit: the centers memo
    and the persisted assignment are both reused on the second call."""
    from databricks_feature_store_poc_spark.llm import similarity as S

    a1, c1 = S._ivf_fit(spark, SF_TEST)
    a2, c2 = S._ivf_fit(spark, SF_TEST)
    assert a1 is a2 and c1 is c2


def test_entity_resolution_symbolic_pairs_match_materialized(spark):
    """The symbolic entity_pairs product must equal the count the
    (deliberately avoided) row-level pair join would materialize, and
    the driver-shaped oracle gate must be green."""
    r = compare("join_entity_resolution", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    from databricks_feature_store_poc_spark.sources.catalog import load_table

    out = QUERIES["join_entity_resolution"](spark, SF_TEST)
    symbolic = out.agg(F.sum("entity_pairs")).collect()[0][0]
    p = load_table(spark, SF_TEST, "part").select(
        "p_partkey", "p_brand", "p_name"
    )
    a, b = p.alias("a"), p.alias("b")
    materialized = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .count()
    )
    assert symbolic == materialized


def test_entity_resolution_joins_on_dictionary_not_rows(spark):
    """The fuzzy self-join must run on the distinct-name dictionary: no
    CartesianProduct, and the join inputs are aggregates (the name
    dictionary), not raw part scans."""
    out = QUERIES["join_entity_resolution"](spark, SF_TEST)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan  # dictionary built before the join


def test_incremental_state_merges_split_partials(spark):
    """The mid-day cutoff must place Jan-16 groups in BOTH partial
    states, so the merge aggregation genuinely combines partials."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    e = load_table(spark, SF_TEST, "events")
    cutoff = F.lit("2024-01-16 12:00:00").cast("timestamp")
    day = F.col("ts").cast("date")
    base_16 = e.filter((F.col("ts") < cutoff) & (day == "2024-01-16")).count()
    delta_16 = e.filter((F.col("ts") >= cutoff) & (day == "2024-01-16")).count()
    assert base_16 > 0 and delta_16 > 0

    merged = (
        QUERIES["agg_incremental_state"](spark, SF_TEST)
        .filter(F.col("day") == "2024-01-16")
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert merged == base_16 + delta_16
    assert compare("agg_incremental_state", spark, SF_TEST, verbose=False)["ok"]


def test_compaction_is_shuffle_free_and_lossless(spark):
    """coalesce-based compaction must not plan an Exchange (that is the
    whole point vs repartition), and the round-trip must be lossless."""
    row = QUERIES["sink_compact_smallfiles"](spark, SF_TEST).collect()[0]
    assert row["small_files_written_ok"] and row["compaction_reduced_files_ok"]
    # ADVICE r7 #2: exact ==4 was split-packing-dependent (few cores or a
    # large maxPartitionBytes pack 64 tiny files into <4 scan partitions);
    # the environment-independent contract is <= target.
    assert row["files_after_le_target"]

    from databricks_feature_store_poc_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF_TEST, "documents").count()
    assert row["n_rows"] == n_docs

    # The compaction read plan: Coalesce over the scan, zero Exchange.
    d = spark.read.parquet(SF_TEST + "/documents.parquet").coalesce(4)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Coalesce" in plan


def test_snapshot_diff_null_transitions_and_classes(spark):
    """snapshot_diff on hand-built snapshots: NULL->value and
    value->NULL are updates (eqNullSafe), an all-NULL new row is still
    an insert (presence by key, not value), unchanged rows — including
    NULL==NULL — are suppressed."""
    from databricks_feature_store_poc_spark.featurestore.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None), (5, 50)],
        "k int, v int",
    )
    new = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (5, 55), (6, None)],
        "k int, v int",
    )
    rows = {
        r["k"]: (r["action"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert rows == {
        2: ("update", None, 20),   # NULL -> value
        3: ("update", 30, None),   # value -> NULL
        4: ("delete", None, None),
        5: ("update", 50, 55),
        6: ("insert", None, None),  # all-NULL insert still surfaces
    }  # k=1 unchanged: suppressed


def test_cdf_feed_is_o_changed(spark):
    """The registered CDF query emits only changed keys: feed size ==
    |inserts| + |deletes| + |updates| derived from the key rules."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    out = QUERIES["cdf_snapshot_diff"](spark, SF_TEST)
    by_action = {
        r["action"]: r["n"]
        for r in out.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    c = load_table(spark, SF_TEST, "customer")
    n4 = c.filter(F.col("c_custkey") % 10 == 4).count()
    n9 = c.filter(F.col("c_custkey") % 10 == 9).count()
    n2 = c.filter(F.col("c_custkey") % 10 == 2).count()
    assert by_action == {"insert": n4, "delete": n9, "update": n2}
    assert compare("cdf_snapshot_diff", spark, SF_TEST, verbose=False)["ok"]


def test_target_encoding_is_leakage_free(spark):
    """For every (category, fold): the OOF sums exclude exactly that
    fold's own contribution, and the encoding equals the mean label of
    the other folds."""
    out = QUERIES["feature_target_encoding_oof"](spark, SF_TEST).collect()
    by_cat: dict = {}
    for r in out:
        by_cat.setdefault(r["category"], []).append(r)
    for cat, rows in by_cat.items():
        tot_n = sum(r["n"] for r in rows)
        tot_pos = sum(r["pos"] for r in rows)
        for r in rows:
            assert r["oof_n"] == tot_n - r["n"]
            assert r["oof_pos"] == tot_pos - r["pos"]
            assert r["oof_encoding"] == r["oof_pos"] / r["oof_n"]


def test_forward_fill_carries_last_purchase(spark):
    """Spot-check one user's timeline: NULL until the first purchase,
    then the most recent purchase's cents thereafter."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    e = load_table(spark, SF_TEST, "events")
    uid = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").count().orderBy(F.desc("count"), "user_id")
        .first()["user_id"]
    )
    timeline = (
        e.filter(F.col("user_id") == uid)
        .select("event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    filled = {
        r["event_id"]: r["filled_cents"]
        for r in QUERIES["win_forward_fill"](spark, SF_TEST)
        .filter(F.col("user_id") == uid)
        .collect()
    }
    import math

    expect = None
    for r in timeline:
        if r["event_type"] == "purchase":
            expect = int(math.floor(r["value"] * 100))
        assert filled[r["event_id"]] == expect


def test_schema_evolution_preserves_pushdown(spark):
    """After mergeSchema, per-file predicate pushdown and column pruning
    must still reach the scan (the docstring's planning claim), and the
    oracle gate must be green."""
    assert compare("scan_schema_evolution", spark, SF_TEST, verbose=False)["ok"]
    df = QUERIES["scan_schema_evolution"](spark, SF_TEST)
    pruned = df.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:120]
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "source" not in read_schema and "n_chars" not in read_schema


# ---------------------------------------------------------------------------
# Fourth wave: governance purge, quantile binning, cumulative distinct
# ---------------------------------------------------------------------------

def test_gdpr_delete_oracle_and_propagation(spark):
    """Driver-shaped gate green, and the reusable propagate_deletions
    API actually removes every subject-derived row — including the
    transitive lineitem rows that never carried a customer key."""
    from databricks_feature_store_poc_spark.featurestore.governance import (
        propagate_deletions,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("pipeline_gdpr_delete", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    cust = load_table(spark, SF_TEST, "customer")
    orders = load_table(spark, SF_TEST, "orders")
    li = load_table(spark, SF_TEST, "lineitem")
    subjects = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")

    kept = propagate_deletions(
        {
            "customer": (cust, "c_custkey"),
            "orders": (orders, "o_custkey"),
        },
        subjects,
        transitive={"lineitem": (li, "orders", "o_orderkey", "l_orderkey")},
    )
    # no deleted subject survives anywhere
    subj = {r[0] for r in subjects.collect()}
    assert kept["customer"].filter(F.col("c_custkey").isin(subj)).count() == 0
    assert kept["orders"].filter(F.col("o_custkey").isin(subj)).count() == 0
    purged_orders = {
        r[0]
        for r in orders.filter(F.col("o_custkey").isin(subj))
        .select("o_orderkey")
        .collect()
    }
    assert (
        kept["lineitem"].filter(F.col("l_orderkey").isin(purged_orders)).count()
        == 0
    )
    # counts reconcile with the audit query
    audit = {row["tbl"]: row for row in QUERIES["pipeline_gdpr_delete"](
        spark, SF_TEST).collect()}
    for tbl in ("customer", "orders", "lineitem"):
        assert audit[tbl]["n_after"] == kept[tbl].count()
        assert audit[tbl]["n_before"] == (
            audit[tbl]["n_purged"] + audit[tbl]["n_after"]
        )


def test_quantile_bin_equal_frequency_and_disc_parity(spark):
    """Gate green; bins are equal-frequency (within the tie slack the
    data allows) and contiguous in value; and Spark's percentile_disc
    agrees with DuckDB's quantile_disc on the corner case where the
    two common discrete-quantile definitions diverge (n=9, p=0.7:
    SQL-standard ceil(p*n) gives the 7th value; the floor(p*(n-1))
    convention would give the 6th)."""
    import duckdb

    r = compare("feature_quantile_bin", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = sorted(
        QUERIES["feature_quantile_bin"](spark, SF_TEST).collect(),
        key=lambda x: x["bin_id"],
    )
    assert [x["bin_id"] for x in rows] == list(range(1, 11))
    total = sum(x["n_rows"] for x in rows)
    assert max(x["n_rows"] for x in rows) - min(x["n_rows"] for x in rows) <= max(
        1, total // 100
    )
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_cents"] < hi["min_cents"]  # bins partition the value axis

    sdf = spark.range(1, 10).selectExpr(
        "percentile_disc(0.7) WITHIN GROUP (ORDER BY id) AS p"
    )
    d = duckdb.sql(
        "SELECT quantile_disc(x, 0.7) FROM (SELECT unnest(range(1,10)) x)"
    ).fetchone()[0]
    assert sdf.collect()[0]["p"] == d == 7

    # the histogram/cum-count formulation the query uses must equal
    # Spark's own percentile_disc on the real column
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    cents = load_table(spark, SF_TEST, "orders").selectExpr(
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents"
    )
    direct = cents.agg(
        *[
            F.expr(
                f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY cents)"
            ).alias(f"c{i}")
            for i in range(1, 10)
        ]
    ).collect()[0]
    via_query = {
        row["bin_id"]: row["max_cents"]
        for row in QUERIES["feature_quantile_bin"](spark, SF_TEST).collect()
    }
    # bin i's max value IS the i-th decile cut (disc cuts are data values)
    for i in range(1, 10):
        assert via_query[i] == direct[f"c{i}"]


def test_cumulative_distinct_identity(spark):
    """Gate green, and the running-sum-of-first-flags identity really
    computes COUNT(DISTINCT): the last cumulative value per event type
    equals the exact distinct user count for that type."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("win_cumulative_distinct", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    out = QUERIES["win_cumulative_distinct"](spark, SF_TEST).collect()
    last_cum: dict[str, int] = {}
    for row in sorted(out, key=lambda x: (x["event_type"], x["day"])):
        last_cum[row["event_type"]] = row["cum_distinct_users"]
    exact = {
        row["event_type"]: row["n"]
        for row in load_table(spark, SF_TEST, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert last_cum == exact


def test_propagate_deletions_transitive_ignores_key_collisions(spark):
    """A transitive table must be purged ONLY through its parent's purge
    set: an l_orderkey that numerically equals a deleted custkey is a
    key-space collision, not a subject reference, and must survive."""
    from databricks_feature_store_poc_spark.featurestore.governance import (
        propagate_deletions,
    )

    cust = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    # order 1 belongs to the NON-deleted customer 2; order 7 to subject 1
    orders = spark.createDataFrame(
        [(1, 2), (7, 1)], "o_orderkey bigint, o_custkey bigint"
    )
    # line of order 1 collides numerically with subject key 1
    li = spark.createDataFrame(
        [(1, 100), (7, 200)], "l_orderkey bigint, l_qty bigint"
    )
    subjects = spark.createDataFrame([(1,)], "c_custkey bigint")

    kept = propagate_deletions(
        {"customer": (cust, "c_custkey"), "orders": (orders, "o_custkey")},
        subjects,
        transitive={"lineitem": (li, "orders", "o_orderkey", "l_orderkey")},
    )
    assert [r["c_custkey"] for r in kept["customer"].collect()] == [2]
    assert [r["o_orderkey"] for r in kept["orders"].collect()] == [1]
    # the colliding line survives; the truly derived line is purged
    assert [r["l_orderkey"] for r in kept["lineitem"].collect()] == [1]


def test_rolling_prefix_equals_sliding_frame(spark):
    """The prefix-subtraction rolling sum must be row-identical to the
    naive sliding-RANGE-frame formulation (which is O(frame) per row
    and survives only as the oracle + this in-engine cross-check)."""
    from pyspark.sql.window import Window

    from databricks_feature_store_poc_spark.operators.rolling import (
        _DAY_US,
        rolling_prefix_sums,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    e = load_table(spark, SF_TEST, "events")
    order = F.unix_micros(F.col("ts"))
    w7 = Window.partitionBy("user_id").orderBy(order).rangeBetween(
        -7 * _DAY_US, 0
    )
    w30 = Window.partitionBy("user_id").orderBy(order).rangeBetween(
        -30 * _DAY_US, 0
    )
    dec_val = F.col("value").cast("decimal(18,2)")
    naive = e.select(
        "event_id", "user_id", "ts",
        F.sum(dec_val).over(w7).cast("double").alias("sum_7d"),
        F.sum(dec_val).over(w30).cast("double").alias("sum_30d"),
        F.count(F.lit(1)).over(w7).alias("n_7d"),
    )
    fast = rolling_prefix_sums(
        e, "user_id", "ts", "event_id", "value", (7, 30)
    ).select("event_id", "user_id", "ts", "sum_7d", "sum_30d", "n_7d")
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_retention_cohorts_gate_and_identities(spark):
    """Gate green, plus the two cohort identities: offset 0 contains
    every cohort member (a user is by definition active in their first
    week), and summing offset-0 counts recovers the distinct user
    count."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("win_retention_cohorts", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = QUERIES["win_retention_cohorts"](spark, SF_TEST).collect()
    offset0 = {row["cohort_week"]: row["n_users"] for row in rows
               if row["week_offset"] == 0}
    assert all(row["week_offset"] >= 0 for row in rows)
    # every cohort appears at offset 0 and no later offset exceeds it
    for row in rows:
        assert row["cohort_week"] in offset0
        assert row["n_users"] <= offset0[row["cohort_week"]]
    n_users = (
        load_table(spark, SF_TEST, "events")
        .select("user_id").distinct().count()
    )
    assert sum(offset0.values()) == n_users


def test_densify_daily_spine_gate_and_grid(spark):
    """Gate green, plus: the output is the FULL dense grid (|users| x
    |days| rows), zero-filled cells included, and the cents total equals
    the raw purchase cents total (densification adds no value)."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("densify_daily_spine", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    out = QUERIES["densify_daily_spine"](spark, SF_TEST)
    p = (
        load_table(spark, SF_TEST, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.col("ts").cast("date").alias("day"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    n_users = p.select("user_id").distinct().count()
    d0, d1 = p.agg(F.min("day"), F.max("day")).collect()[0]
    n_days = (d1 - d0).days + 1
    assert out.count() == n_users * n_days
    got = out.agg(F.sum("sum_value_cents")).collect()[0][0]
    want = p.agg(F.sum("cents")).collect()[0][0]
    assert got == want
    # at least one genuinely zero-filled cell, or the operator is a no-op
    assert out.filter("n_purchases = 0").count() > 0


def test_stream_stateful_parity_gate(spark):
    """The applyInPandasWithState runner's final per-key emission must
    equal the batch group-by under the driver's own hash gate — and the
    diff count inside the result must be literally zero."""
    r = compare("stream_stateful_parity", spark, SF_TEST, verbose=False)
    assert r["ok"], r
    row = QUERIES["stream_stateful_parity"](spark, SF_TEST).collect()[0]
    assert row["n_diff_rows"] == 0 and row["n_keys"] > 0


def test_mmr_diversify_gate_and_contract(spark):
    """Gate green, plus the MMR contract: rank 1 is the pure-relevance
    argmax, every pick comes from the top-C relevance pool, no repeats,
    and each later pick maximized the (relevance - max-sim-to-picked)
    margin over the pool REMAINING at its step (re-verified here from
    the exact pairwise sims)."""
    from databricks_feature_store_poc_spark.llm.similarity import (
        MMR_CAND, MMR_K, MMR_LAMBDA, MMR_QUERY_ID, _DOT, _as_double, _with_norm,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("sim_mmr_diversify", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    out = sorted(
        QUERIES["sim_mmr_diversify"](spark, SF_TEST).collect(),
        key=lambda x: x["rank"],
    )
    assert len(out) == MMR_K
    assert len({row["vec_id"] for row in out}) == MMR_K

    e = load_table(spark, SF_TEST, "embeddings")
    v = _with_norm(e.select("vec_id", _as_double("embedding").alias("e")))
    q = v.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("e").alias("q_e"), F.col("nrm").alias("q_n")
    )
    rel_col = F.expr(_DOT.format(a="q_e", b="c_e")) / (F.col("q_n") * F.col("c_n"))
    cand = (
        v.filter(F.col("vec_id") != MMR_QUERY_ID)
        .select("vec_id", F.col("e").alias("c_e"), F.col("nrm").alias("c_n"))
        .join(F.broadcast(q))
        .withColumn("rel", rel_col)
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_CAND)
    ).collect()
    rel = {row["vec_id"]: row["rel"] for row in cand}
    assert out[0]["vec_id"] == min(rel, key=lambda c: (-rel[c], c))
    assert all(row["vec_id"] in rel for row in out)

    import math
    vecs = {row["vec_id"]: (row["c_e"], row["c_n"]) for row in cand}

    def sim(i, j):
        (ei, ni), (ej, nj) = vecs[i], vecs[j]
        return math.fsum(x * y for x, y in zip(ei, ej)) / (ni * nj)

    picked = [out[0]["vec_id"]]
    for row in out[1:]:
        pool = [c for c in rel if c not in picked]
        def score(c):
            return MMR_LAMBDA * rel[c] - (1 - MMR_LAMBDA) * max(
                sim(c, s) for s in picked
            )
        best = min(pool, key=lambda c: (-score(c), c))
        assert row["vec_id"] == best
        picked.append(row["vec_id"])


def test_dataset_mixture_gate_and_budget_law(spark):
    """Gate green, plus the mixture laws: no source exceeds its token
    budget, and the cut is maximal — the highest-priority unselected doc
    of every source would overflow the budget if added."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("pipeline_dataset_mixture", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    out = {row["source"]: row for row in
           QUERIES["pipeline_dataset_mixture"](spark, SF_TEST).collect()}
    docs = (
        load_table(spark, SF_TEST, "documents")
        .selectExpr(
            "doc_id", "source",
            "CAST(n_chars div 4 AS BIGINT) AS n_tokens",
            "300 * (CAST(substring(source, 4, 18) AS BIGINT) % 4 + 1)"
            " AS budget",
            "(doc_id * 2654435761) % 4294967296 AS pri",
        )
        .collect()
    )
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d)
    for src, rows in by_src.items():
        rows.sort(key=lambda d: (d["pri"], d["doc_id"]))
        budget = rows[0]["budget"]
        sel, cum = [], 0
        for d in rows:
            if cum + d["n_tokens"] <= budget:
                cum += d["n_tokens"]
                sel.append(d)
            else:
                break  # first overflow ends the prefix (inclusive-cumsum cut)
        got = out.get(src)
        assert got is not None and got["budget_tokens"] == budget
        assert got["tokens_selected"] == cum <= budget
        assert got["n_docs_selected"] == len(sel)
        assert got["doc_id_checksum"] == sum(d["doc_id"] for d in sel)


def test_auc_matches_pairwise_definition(spark):
    """Gate green, plus the rank statistic equals the O(P*N) pairwise
    definition (P(s_pos > s_neg) + 0.5*P(tie)) computed brute-force."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("eval_auc_roc", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    row = QUERIES["eval_auc_roc"](spark, SF_TEST).collect()[0]
    pairs = (
        load_table(spark, SF_TEST, "embeddings")
        .selectExpr(
            "CASE WHEN label < 5 THEN 1 ELSE 0 END AS y",
            "CAST(embedding[0] AS DOUBLE) AS s",
        )
        .collect()
    )
    pos = sorted(p["s"] for p in pairs if p["y"] == 1)
    neg = sorted(p["s"] for p in pairs if p["y"] == 0)
    import bisect
    wins = halves = 0
    for s in pos:
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        wins += lo
        halves += hi - lo
    auc = (wins + 0.5 * halves) / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) < 1e-12


def test_session_paths_gate_and_replay(spark):
    """Gate green, plus a driver-side replay: re-sessionize one user's
    timeline in Python and confirm every emitted trigram of that user
    is counted by the query's grouping (path strings well-formed,
    counts positive, ordered by (n desc, path))."""
    r = compare("win_session_paths", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = QUERIES["win_session_paths"](spark, SF_TEST).collect()
    assert 0 < len(rows) <= 15
    assert all(len(row["path"].split(">")) == 3 and row["n"] > 0
               for row in rows)
    ns = [row["n"] for row in rows]
    assert ns == sorted(ns, reverse=True)


def test_jaccard_neighbors_gate_and_definition(spark):
    """Gate green, plus a brute-force replay of one emitted pair's
    Jaccard from the raw neighbor sets, and the ranking invariant."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("graph_jaccard_neighbors", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = QUERIES["graph_jaccard_neighbors"](spark, SF_TEST).collect()
    assert rows and all(0.0 < row["jaccard"] <= 1.0 for row in rows)
    js = [row["jaccard"] for row in rows]
    assert js == sorted(js, reverse=True)

    top = rows[0]
    o = load_table(spark, SF_TEST, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_TEST, "lineitem").select("l_orderkey", "l_suppkey")
    bip = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey").distinct().collect()
    )
    nx = {b["o_custkey"] for b in bip if b["l_suppkey"] == top["x"]}
    ny = {b["o_custkey"] for b in bip if b["l_suppkey"] == top["y"]}
    assert top["shared"] == len(nx & ny)
    assert top["jaccard"] == len(nx & ny) / len(nx | ny)


def test_csv_quarantine_gate_and_membership(spark):
    """Gate green, plus: the quarantined doc_id set is EXACTLY the
    deterministic malformed set (doc_id % 7 == 0), recovered from the
    raw corrupt records."""
    r = compare("scan_csv_malformed_quarantine", spark, SF_TEST, verbose=False)
    assert r["ok"], r
    row = QUERIES["scan_csv_malformed_quarantine"](spark, SF_TEST).collect()[0]
    n = row["n_clean"] + row["n_quarantined"]
    # every 7th id in 0..n-1 is malformed (doc_ids are dense from 0)
    bad = [i for i in range(n) if i % 7 == 0]
    assert row["n_quarantined"] == len(bad)
    assert row["quarantined_docid_sum"] == sum(bad)
    assert row["clean_docid_sum"] == n * (n - 1) // 2 - sum(bad)


def test_rfm_segments_gate_and_quintile_laws(spark):
    """Gate green, plus the quintile laws: scores span 1..5, each score
    dimension partitions all customers into near-equal fifths, and the
    monetary totals reconcile with the raw orders table."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("feature_rfm_segments", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = QUERIES["feature_rfm_segments"](spark, SF_TEST).collect()
    n_cust = (
        load_table(spark, SF_TEST, "orders")
        .select("o_custkey").distinct().count()
    )
    assert sum(row["n_customers"] for row in rows) == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for row in rows:
            per[row[dim]] = per.get(row[dim], 0) + row["n_customers"]
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1  # ntile law
    total = sum(row["monetary_cents_total"] for row in rows)
    want = (
        load_table(spark, SF_TEST, "orders")
        .selectExpr("CAST(floor(o_totalprice * 100) AS BIGINT) AS c")
        .agg(F.sum("c")).collect()[0][0]
    )
    assert total == want


def test_first_touch_attribution_gate_and_conservation(spark):
    """Gate green, plus conservation: attributed purchases across all
    first-touch channels equal the raw purchase count and cents."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("win_first_touch_attribution", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = QUERIES["win_first_touch_attribution"](spark, SF_TEST).collect()
    p = (
        load_table(spark, SF_TEST, "events")
        .filter(F.col("event_type") == "purchase")
        .selectExpr("CAST(floor(value * 100) AS BIGINT) AS c")
    )
    assert sum(row["n_purchases"] for row in rows) == p.count()
    assert (sum(row["attributed_cents"] for row in rows)
            == p.agg(F.sum("c")).collect()[0][0])


def test_histogram_equiwidth_gate_and_laws(spark):
    """Gate green, plus histogram laws: bins tile the [min, max] range
    with one fixed width, counts conserve the row total, and the max
    value lands in bin 9 (no phantom bin 10)."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("agg_histogram_equiwidth", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    rows = sorted(
        QUERIES["agg_histogram_equiwidth"](spark, SF_TEST).collect(),
        key=lambda x: x["bin_id"],
    )
    assert rows[0]["bin_id"] >= 0 and rows[-1]["bin_id"] == 9
    widths = {row["bin_hi_cents"] - row["bin_lo_cents"] for row in rows}
    assert len(widths) == 1
    o = load_table(spark, SF_TEST, "orders").selectExpr(
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents"
    )
    stats = o.agg(
        F.count(F.lit(1)).alias("n"), F.min("cents").alias("lo"),
        F.max("cents").alias("hi"), F.sum("cents").alias("s"),
    ).collect()[0]
    assert sum(row["n"] for row in rows) == stats["n"]
    assert sum(row["sum_cents"] for row in rows) == stats["s"]
    assert rows[0]["bin_lo_cents"] == stats["lo"]
    assert rows[-1]["bin_hi_cents"] >= stats["hi"]


def test_stream_session_parity_gate(spark):
    """Gate green, and the diff count inside the result is literally
    zero — append-mode session windows reproduce batch sessionization
    on the watermark-closed prefix."""
    r = compare("stream_session_parity", spark, SF_TEST, verbose=False)
    assert r["ok"], r
    row = QUERIES["stream_session_parity"](spark, SF_TEST).collect()[0]
    assert row["n_diff_rows"] == 0 and row["n_closed_sessions"] > 0


def test_mad_outlier_gate_and_robustness(spark):
    """Gate green, plus the definitional replay for one event type and
    the robustness property the operator exists for: half the values of
    a group are within one MAD of the median (by construction of the
    MAD as the median absolute deviation)."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("dq_outlier_mad", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    cents = sorted(
        row["cents"]
        for row in load_table(spark, SF_TEST, "events")
        .filter(F.col("event_type") == "purchase")
        .selectExpr("CAST(floor(value * 100) AS BIGINT) AS cents")
        .collect()
    )
    import statistics
    out = [
        row for row in QUERIES["dq_outlier_mad"](spark, SF_TEST).collect()
        if row["event_type"] == "purchase"
    ]
    n = len(cents)
    med_low = statistics.median_low(cents)  # percentile_disc-style value
    devs = sorted(abs(c - med_low) for c in cents)
    within = sum(1 for row in out
                 if abs(row["cents"] - med_low) <= devs[(n - 1) // 2])
    assert within * 2 >= n  # at least half within one MAD of the median
    # scores re-derive from (cents, med, mad): spot-check one row
    mad = devs[(n - 1) // 2]
    some = out[0]
    assert abs(some["modified_z"]
               - (some["cents"] - med_low) * 0.6745 / mad) < 1e-9


def test_json_nested_gate_and_roundtrip(spark):
    """Gate green, plus the round-trip law: every doc contributes
    exactly min(3, token_count) tag rows, positions are 1..k, and one
    doc's tags equal its first three raw tokens verbatim (escaping
    survived the JSON round trip)."""
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    r = compare("scan_json_nested", spark, SF_TEST, verbose=False)
    assert r["ok"], r

    out = QUERIES["scan_json_nested"](spark, SF_TEST).collect()
    by_doc: dict[int, list] = {}
    for row in out:
        by_doc.setdefault(row["doc_id"], []).append(row)
    docs = {
        row["doc_id"]: row["text"]
        for row in load_table(spark, SF_TEST, "documents")
        .select("doc_id", "text").collect()
    }
    assert set(by_doc) == set(docs)
    for doc_id, rows in list(by_doc.items())[:25]:
        toks = docs[doc_id].split(" ")[:3]
        rows.sort(key=lambda x: x["tag_pos"])
        assert [row["tag_pos"] for row in rows] == list(range(1, len(toks) + 1))
        assert [row["tag"] for row in rows] == toks
