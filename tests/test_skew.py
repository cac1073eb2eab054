"""Salted join correctness + bucketed/partitioned table tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.store import FeatureStore
from databricks_feature_store_poc_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 5k rows on one hot key + 1k spread over 100 keys
    fact = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    return fact, dim


def test_salted_inner_join_equals_plain(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, ["k"], n_salts=8).select("k", "payload", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_fact_rows(spark):
    fact, dim = _skewed_frames(spark)
    small_dim = dim.filter(F.col("k") < 50)  # some fact keys unmatched
    out = salted_join(fact, small_dim, ["k"], n_salts=8, how="left")
    assert out.count() == fact.count()
    plain = fact.join(small_dim, "k", "left")
    assert out.filter(F.col("attr").isNull()).count() == plain.filter(
        F.col("attr").isNull()
    ).count()


def test_bucketed_partitioned_create_table(spark, tmp_path):
    fs = FeatureStore(spark, meta_dir=str(tmp_path))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("shard"),
        (F.col("id") * 2.0).alias("v"),
    )
    meta = fs.create_table(
        "fs_bucketed", ["k"], df,
        partition_by=["shard"], bucket_by=(4, ["k"]),
    )
    assert meta.extra["partition_by"] == ["shard"]
    assert meta.extra["bucket_by"] == [4, ["k"]]
    back = fs.read_table("fs_bucketed")
    assert back.count() == 100
    # partition pruning: filtering the partition column prunes at scan
    assert back.filter(F.col("shard") == 1).count() == 25
    fs.drop_table("fs_bucketed")
