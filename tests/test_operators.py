"""Property / invariant tests for the relational operator suite.

The DuckDB oracle harness (tests/harness.py, and the driver's gate)
checks value equality; these tests pin the properties equality can't see:
orderedness of sorts, disjointness of splits, approximation bounds, and
per-group cardinality contracts.
"""

from __future__ import annotations

from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_TEST

load_all_queries()


def test_split_hash_disjoint_exhaustive(spark):
    rows = {r["split"]: r for r in QUERIES["split_hash_8020"](spark, SF_TEST).collect()}
    assert set(rows) == {"train", "test"}
    total = rows["train"]["n"] + rows["test"]["n"]
    assert total == 15000  # every order in exactly one split
    # keys are partitioned, not rows duplicated across splits
    assert rows["train"]["n_keys"] + rows["test"]["n_keys"] == total
    # roughly 80/20 (multiplicative hash is uniform; allow 3% absolute)
    assert 0.77 <= rows["train"]["n"] / total <= 0.83


def test_split_hash_deterministic(spark):
    a = sorted(map(tuple, QUERIES["split_hash_8020"](spark, SF_TEST).collect()))
    b = sorted(map(tuple, QUERIES["split_hash_8020"](spark, SF_TEST).collect()))
    assert a == b


def test_approx_distinct_within_rsd(spark):
    rows = QUERIES["agg_approx_distinct"](spark, SF_TEST).collect()
    assert rows
    for r in rows:
        # rsd 0.05: HLL++ should land within ~3 sigma = 15%; the query
        # emits the band check itself so the oracle can assert it
        assert r["within_band"] is True


def test_sort_multi_is_sorted(spark):
    rows = QUERIES["sort_multi"](spark, SF_TEST).collect()
    keys = [(-r["l_shipdate"].timestamp(), r["l_extendedprice"], r["l_orderkey"]) for r in rows]
    assert keys == sorted(keys)


def test_limit_topk_is_true_topk(spark):
    top = QUERIES["limit_topk"](spark, SF_TEST).collect()
    assert len(top) == 100
    prices = [r["o_totalprice"] for r in top]
    assert prices == sorted(prices, reverse=True)
    # the cut is the global top: nothing outside beats the minimum inside
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    mx = load_table(spark, SF_TEST, "orders").agg({"o_totalprice": "max"}).collect()[0][0]
    assert prices[0] == mx


def test_win_topk_per_group_cardinality(spark):
    df = QUERIES["win_topk_per_group"](spark, SF_TEST)
    from pyspark.sql import functions as F

    per_group = df.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per_group <= 3


def test_rolling_sum_30d_dominates_7d(spark):
    df = QUERIES["feature_rolling_sum"](spark, SF_TEST)
    from pyspark.sql import functions as F

    bad = df.filter(F.col("sum_30d") < F.col("sum_7d")).count()
    assert bad == 0  # 7d window is a subset of the 30d window


def test_sink_roundtrip_preserves_rows(spark):
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    out = QUERIES["sink_feature_table"](spark, SF_TEST)
    src = load_table(spark, SF_TEST, "customer")
    assert out.count() == src.count()
    assert set(out.columns) == set(src.columns)


def test_approx_percentile_within_rank_error(spark):
    """approx_percentile(accuracy=1000) guarantees rank error <= n/1000;
    translate to a value tolerance via the observed spread."""
    rows = QUERIES["agg_approx_percentile"](spark, SF_TEST).collect()
    assert rows
    for r in rows:
        # the query emits the 1% band check itself for the oracle
        assert r["within_band"] is True


def test_training_set_sampled_load(spark):
    df = QUERIES["training_set_flagship"](spark, SF_TEST)
    # sample through the TrainingSet surface
    from databricks_feature_store_poc_spark.featurestore.lookup import (
        FeatureLookup,
        create_training_set,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    orders = load_table(spark, SF_TEST, "orders")
    customer = load_table(spark, SF_TEST, "customer")
    ts = create_training_set(
        spark,
        orders.select("o_orderkey", "o_custkey"),
        [FeatureLookup("customer", ("c_acctbal",), ("c_custkey",),
                       spine_keys=("o_custkey",))],
        resolve_table={"customer": customer}.__getitem__,
    )
    full = ts.load_df().count()
    sampled = ts.load_df(sample_fraction=0.1).count()
    assert 0 < sampled < full
    # deterministic under the same seed
    assert sampled == ts.load_df(sample_fraction=0.1).count()


def test_incremental_rollup_equals_full_rebuild(spark):
    """merge(build(first half), second half) == build(everything) — the
    mergeable-partial invariant that makes O(batch) refresh sound."""
    from databricks_feature_store_poc_spark.operators.rollup_maintenance import (
        build_rollup,
        merge_rollup,
        rollup_to_features,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    cutoff = events.approxQuantile("event_id", [0.5], 0.0)[0]
    first = events.filter(F.col("event_id") <= cutoff)
    second = events.filter(F.col("event_id") > cutoff)
    assert first.count() > 0 and second.count() > 0

    incremental = merge_rollup(build_rollup(first), second)
    full = build_rollup(events)

    def norm(df):
        return sorted(
            (r["user_id"], r["bucket_start"], r["n_events"], str(r["sum_value"]))
            for r in df.collect()
        )

    assert norm(incremental) == norm(full)

    feats = rollup_to_features(full).collect()
    by_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
    ).collect()
    fmap = {r["user_id"]: (r["total_events"], r["total_value"]) for r in feats}
    bmap = {r["user_id"]: (r["n"], r["tv"]) for r in by_user}
    assert fmap == bmap


def test_sorted_sink_files_are_clustered(spark):
    """Each parquet file written by sink_sorted_parquet must be internally
    sorted by ship date (the property row-group stats skipping needs)."""
    import tempfile as _tf
    import os as _os

    from pyspark.sql import functions as F

    QUERIES["sink_sorted_parquet"](spark, SF_TEST).count()  # ensure written
    out = _os.path.join(_tf.gettempdir(), "spark_graft_sorted_lineitem")
    df = spark.read.parquet(out).withColumn("f", F.input_file_name())
    from pyspark.sql.window import Window

    w = Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    disordered = (
        df.withColumn("prev", F.lag("l_shipdate").over(w))
        .filter(F.col("prev") > F.col("l_shipdate"))
        .count()
    )
    assert disordered == 0


def test_corr_covar_matches_builtin_statistically(spark):
    """The deterministic moment-sum formulation must agree with Spark's
    built-in corr/covar_pop to float tolerance (the builtins are the
    statistical ground truth; ours trades their order-dependent double
    accumulation for exact-decimal reproducibility)."""
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.sources.catalog import load_table

    ours = {
        r["l_returnflag"]: (r["covar_pop"], r["corr_qty_price"])
        for r in QUERIES["agg_corr_covar"](spark, SF_TEST).collect()
    }
    builtin = {
        r["l_returnflag"]: (r["cv"], r["cr"])
        for r in load_table(spark, SF_TEST, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.covar_pop("l_quantity", "l_extendedprice").alias("cv"),
            F.corr("l_quantity", "l_extendedprice").alias("cr"),
        )
        .collect()
    }
    assert ours.keys() == builtin.keys()
    for k in ours:
        assert abs(ours[k][0] - builtin[k][0]) <= 1e-6 * abs(builtin[k][0])
        assert abs(ours[k][1] - builtin[k][1]) <= 1e-9


def test_weighted_bernoulli_is_size_biased_and_deterministic(spark):
    """Longer documents must be sampled at a higher rate than short ones
    (the point of size-biasing), the longest document is always kept
    (p = max/max = 1), and the sample is identical across runs."""
    from pyspark.sql import functions as F

    out = QUERIES["sample_weighted_bernoulli"](spark, SF_TEST)
    rows = out.collect()
    again = out.collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    from databricks_feature_store_poc_spark.sources.catalog import load_table

    d = load_table(spark, SF_TEST, "documents").select(
        "doc_id",
        F.expr(
            "cast(size(filter(split(text, '\\\\s+'), x -> x != '')) as long)"
        ).alias("n_tokens"),
    )
    all_rows = d.collect()
    assert 0 < len(rows) < len(all_rows)
    max_tok = max(r["n_tokens"] for r in all_rows)
    kept = {r["doc_id"] for r in rows}
    assert all(r["doc_id"] in kept for r in all_rows if r["n_tokens"] == max_tok)
    median = sorted(r["n_tokens"] for r in all_rows)[len(all_rows) // 2]
    long_ids = {r["doc_id"] for r in all_rows if r["n_tokens"] > median}
    short_ids = {r["doc_id"] for r in all_rows if r["n_tokens"] <= median}
    rate_long = len(kept & long_ids) / max(len(long_ids), 1)
    rate_short = len(kept & short_ids) / max(len(short_ids), 1)
    assert rate_long > rate_short


def test_resample_grid_is_dense_and_carries_forward(spark):
    """Every user's hourly grid must be gapless between their first and
    last event hour; gap rows have 0 events but a non-null carried value
    (the first grid row is always an observed hour, so carry-forward
    never runs dry)."""
    from pyspark.sql import functions as F

    df = QUERIES["feature_resample_1h"](spark, SF_TEST)
    stats = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("rows"),
        ((F.unix_timestamp(F.max("hb")) - F.unix_timestamp(F.min("hb"))) / 3600
         + 1).alias("span_hours"),
    )
    assert stats.filter(F.col("rows") != F.col("span_hours")).count() == 0
    assert df.filter(F.col("filled_value").isNull()).count() == 0
    gaps = df.filter(F.col("n_events") == 0)
    assert gaps.count() > 0  # the fixture's streams are sparse enough
