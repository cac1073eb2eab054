"""Property-based tests (hypothesis) on operator algebra — SURVEY §5 item 3.

Each property runs on small generated inputs (Spark jobs are the cost
driver, so examples are capped) and pins an algebraic law rather than a
golden value: dedup idempotence, lookup spine preservation, hash-split
partition laws, fingerprint determinism.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=24), min_size=1, max_size=12
)


@given(texts=texts)
@_settings
def test_dedup_exact_idempotent(spark, texts):
    """dedup(dedup(X)) == dedup(X): one row per distinct text, total
    conserved."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = (
        df.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
    )
    kept = once.count()
    assert kept == len(set(texts))
    twice = once.groupBy("h").agg(F.count(F.lit(1)).alias("n2"))
    assert twice.filter(F.col("n2") > 1).count() == 0


@given(
    spine_keys=st.lists(st.integers(0, 20), min_size=1, max_size=30),
    feat_keys=st.sets(st.integers(0, 20), min_size=0, max_size=21),
)
@_settings
def test_lookup_preserves_spine_count(spark, spine_keys, feat_keys):
    """Left lookup against a unique-PK feature table NEVER changes the
    spine row count — with any duplication pattern in the spine and any
    match/unmatch mix (the reference's 21-dup-pair invariant, generalized)."""
    spine = spark.createDataFrame([(k,) for k in spine_keys], ["k"])
    feat = spark.createDataFrame(
        [(k, float(k)) for k in sorted(feat_keys)], schema="k bigint, v double"
    )
    ts = create_training_set(
        spark, spine, [FeatureLookup.of("f", ["v"], "k")],
        resolve_table={"f": feat}.__getitem__,
    )
    out = ts.load_df()
    assert out.count() == len(spine_keys)
    matched = out.filter(F.col("v").isNotNull()).count()
    assert matched == sum(1 for k in spine_keys if k in feat_keys)


@given(keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=200))
@_settings
def test_hash_split_partition_laws(spark, keys):
    """The multiplicative-hash split is disjoint, exhaustive, and
    deterministic for arbitrary key sets."""
    df = spark.createDataFrame([(k,) for k in sorted(keys)], ["k"])
    bucket = ((F.col("k") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(100)
    labeled = df.withColumn("split", F.when(bucket < 80, "train").otherwise("test"))
    n = labeled.count()
    n_train = labeled.filter(F.col("split") == "train").count()
    n_test = labeled.filter(F.col("split") == "test").count()
    assert n_train + n_test == n == len(keys)
    again = {
        r["k"]: r["split"] for r in df.withColumn(
            "split", F.when(bucket < 80, "train").otherwise("test")
        ).collect()
    }
    first = {r["k"]: r["split"] for r in labeled.collect()}
    assert first == again
