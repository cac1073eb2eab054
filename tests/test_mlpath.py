"""ML-path tests: dtype classification, lineage replay, gated GBT train."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)
from databricks_feature_store_poc_spark.featurestore.mlpath import (
    classify_dtypes,
    log_model,
    score_batch,
    train_gbt,
)
from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from databricks_feature_store_poc_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE, SF_TEST

load_all_queries()


def test_classify_dtypes(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = classify_dtypes(li)
    assert "l_returnflag" in out["categorical"]
    assert "l_quantity" in out["numeric"]
    assert "l_shipdate" in out["other"]


def test_eval_metrics_identities(spark):
    r = QUERIES["eval_metrics"](spark, SF_TEST).collect()[0]
    n = r["tp"] + r["fp"] + r["fn"] + r["tn"]
    assert n == 500
    assert 0 <= r["accuracy"] <= 1
    p, rec = r["precision_1"], r["recall_1"]
    assert abs(r["f1_1"] - 2 * p * rec / (p + rec)) < 1e-12


def test_log_model_score_batch_roundtrip(spark, tmp_path):
    class Doubler:
        def predict(self, feats):
            return feats.iloc[:, 0].fillna(0.0) * 2.0

    customer = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    spine = orders.select("o_orderkey", "o_custkey").limit(50)
    ts = create_training_set(
        spark, spine,
        [FeatureLookup("customer", ("c_acctbal",), ("c_custkey",), spine_keys=("o_custkey",))],
        exclude_columns=["o_custkey"],
        resolve_table={"customer": customer}.__getitem__,
    )
    log_model(Doubler(), str(tmp_path / "m"), ts)
    scored = score_batch(
        spark, str(tmp_path / "m"), spine,
        resolve_table={"customer": customer}.__getitem__,
        predict_cols=["c_acctbal"],
    )
    rows = scored.collect()
    assert len(rows) == 50
    for r in rows:
        expect = (r["c_acctbal"] or 0.0) * 2.0
        assert abs(r["prediction"] - expect) < 1e-9


def test_train_gbt_smoke(spark):
    ts = QUERIES["training_set_flagship"](spark, SF_SMOKE)
    train = ts.select(
        F.col("c_acctbal").cast("double").alias("f1"),
        F.col("o_totalprice").cast("double").alias("f2"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("label"),
    ).na.fill(0.0)
    model = train_gbt(train, ["f1", "f2"], "label")
    assert model.stages[-1].numFeatures == 2


def test_train_gbt_categorical_flagship(spark):
    """Training must work on the matrix the engine itself builds —
    including its StringType feature (the reference trains CatBoost with
    cat_features=['category'], 02:87-97): StringIndexer in the returned
    pipeline, nominal splits in the trees, unseen categories scored into
    the handleInvalid='keep' bucket instead of failing."""
    ts = QUERIES["training_set_flagship"](spark, SF_SMOKE)
    train = (
        ts.select(
            F.col("c_acctbal").cast("double").alias("f1"),
            F.col("o_totalprice").cast("double").alias("f2"),
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("o_orderstatus") == "F", 1.0)
            .otherwise(0.0)
            .alias("label"),
        )
        .na.fill(0.0, subset=["f1", "f2"])
        .na.fill("UNKNOWN", subset=["segment"])
    )
    model = train_gbt(train, ["f1", "f2", "segment"], "label")
    # 2 numeric + 1 indexed categorical assembled
    assert model.stages[-1].numFeatures == 3
    scored = model.transform(train)
    assert "prediction" in scored.columns
    assert scored.count() == train.count()
    # score_batch-style roundtrip on a frame with an UNSEEN category
    probe = train.limit(5).withColumn("segment", F.lit("NEVER_SEEN"))
    assert model.transform(probe).select("prediction").count() == 5


def test_train_gbt_early_stopping(spark):
    """A pure-noise label gives the held-out set nothing to improve on
    (train loss still falls as the trees memorize noise), so
    validationIndicatorCol/validationTol must stop boosting well before
    maxIter — Spark's counterpart of the reference's eval_set +
    od_type=Iter early stop (02:428-436)."""
    rows = [
        (float(i % 21 - 10) / 10.0, float((i * 2654435761) % 97 % 2))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "f1 double, label double")
    model = train_gbt(
        df, ["f1"], "label",
        max_iter=30, validation_fraction=0.3, validation_tol=0.01,
    )
    n_trees = len(model.stages[-1].trees)
    assert n_trees < 30, f"early stop never fired: {n_trees} trees"


def test_model_registry_versioning(spark, tmp_path):
    from databricks_feature_store_poc_spark.featurestore.mlpath import ModelRegistry

    class M:
        def __init__(self, v):
            self.v = v

        def predict(self, feats):
            return feats.iloc[:, 0] * self.v

    reg = ModelRegistry(str(tmp_path / "registry"))
    assert reg.latest_version("sales.purchase_model") is None
    v1 = reg.register("sales.purchase_model", M(1), params={"lr": 0.1},
                      metrics={"auc": 0.9})
    v2 = reg.register("sales.purchase_model", M(2))
    assert (v1, v2) == (1, 2)
    assert reg.latest_version("sales.purchase_model") == 2
    assert reg.load("sales.purchase_model").v == 2
    assert reg.load("sales.purchase_model", version=1).v == 1
    assert reg.run_info("sales.purchase_model", version=1)["metrics"]["auc"] == 0.9
    reg.delete("sales.purchase_model")
    reg.delete("sales.purchase_model")  # idempotent, like the reference's
    assert reg.latest_version("sales.purchase_model") is None


def test_score_batch_replays_on_demand_features(spark, tmp_path):
    """On-demand features must survive the log_model -> score_batch
    round-trip: the serve-side spine gets the SAME computed columns from
    the lineage, not just the table lookups."""
    import pickle

    from databricks_feature_store_poc_spark.featurestore.lookup import (
        FeatureLookup,
        create_training_set,
    )
    from databricks_feature_store_poc_spark.featurestore.mlpath import (
        log_model,
        score_batch,
    )

    features = spark.createDataFrame([(10, 2.0), (20, 4.0)], ["k", "f"])
    resolve = {"t": features}.__getitem__
    train_spine = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 400.0)], ["id", "k", "amount"]
    )
    ts = create_training_set(
        spark,
        train_spine,
        [FeatureLookup("t", ("f",), ("k",))],
        exclude_columns=["k"],
        resolve_table=resolve,
        on_demand_features={"ratio": "amount / f"},
    )

    class RatioModel:  # predict = the on-demand column, proving it exists
        feature_names = ["ratio"]

        def predict(self, X):
            return X["ratio"].to_numpy()

    log_model(RatioModel(), str(tmp_path), ts)
    serve_spine = spark.createDataFrame([(3, 10, 50.0)], ["id", "k", "amount"])
    scored = score_batch(
        spark, str(tmp_path), serve_spine, resolve, predict_cols=["ratio"]
    )
    row = scored.collect()[0]
    assert row["ratio"] == 25.0 and row["prediction"] == 25.0
