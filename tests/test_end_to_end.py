"""End-to-end pipeline: the reference's whole lifecycle in one test.

The reference POC's story (SURVEY §0): raw purchase history → rolling
feature tables → registered feature store → training set via declarative
lookups → model train → model logged with lineage → batch scoring that
auto-joins features. The reference executes this against a managed
service; this test executes every step against this engine, end to end,
starting from the raw `events` table — including the upstream
rolling-window computation the reference left implicit
(total_purchase_7d/30d arrive pre-computed in its CSVs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)
from databricks_feature_store_poc_spark.featurestore.mlpath import (
    ModelRegistry,
    log_model,
    score_batch,
)
from databricks_feature_store_poc_spark.featurestore.online import OnlineStore
from databricks_feature_store_poc_spark.featurestore.store import FeatureStore
from databricks_feature_store_poc_spark.operators.rolling import rolling_range_sum
from databricks_feature_store_poc_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_full_pipeline_events_to_scores(spark, tmp_path):
    fs = FeatureStore(spark, meta_dir=str(tmp_path / "meta"))

    # 1. Upstream feature computation: per-user trailing 7d/30d sums from
    #    raw events (the computation behind the reference's
    #    customer_features.csv), snapshotted at each user's last event.
    events = load_table(spark, SF_SMOKE, "events")
    with_features = rolling_range_sum(
        rolling_range_sum(events, "user_id", "ts", "value", 7, "total_purchase_7d"),
        "user_id", "ts", "value", 30, "total_purchase_30d",
    )
    latest = (
        with_features.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "total_purchase_7d", "total_purchase_30d")
    )

    # 2. Feature table registration with PK enforcement.
    fs.create_table("e2e_user_features", ["user_id"], latest,
                    description="trailing purchase sums from events")
    feat = fs.read_table("e2e_user_features")
    n_users = feat.count()
    assert n_users > 0

    # 3. Training set: spine = one row per (user, label) from event types.
    spine = (
        events.groupBy("user_id")
        .agg(F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             .alias("purchased"))
    )
    ts = create_training_set(
        spark, spine,
        [FeatureLookup.of("e2e_user_features",
                          ["total_purchase_7d", "total_purchase_30d"], "user_id")],
        label="purchased",
        resolve_table=lambda _: feat,
    )
    matrix = ts.load_df()
    assert matrix.count() == spine.count()  # spine preserved

    # 4. Train (distributed GBT) on the materialized-lazy matrix.
    from databricks_feature_store_poc_spark.featurestore.mlpath import train_gbt

    train_df = matrix.na.fill(0.0).select(
        F.col("total_purchase_7d").alias("f1"),
        F.col("total_purchase_30d").alias("f2"),
        F.col("purchased").cast("double").alias("label"),
    )
    model = train_gbt(train_df, ["f1", "f2"], "label")

    # 5. Log a (simple, pickleable) scoring model with lineage + register.
    class MeanThreshold:
        def __init__(self, thr):
            self.thr = thr

        def predict(self, feats):
            return (feats.iloc[:, 0].fillna(0.0) > self.thr).astype(float)

    reg = ModelRegistry(str(tmp_path / "registry"))
    artifact = str(tmp_path / "registry" / "purchase_model" / "v1")
    log_model(MeanThreshold(5.0), artifact, ts)
    v = reg.register("e2e.purchase_model", MeanThreshold(5.0), training_set=ts)
    assert v == 1

    # 6. score_batch on a FRESH spine replays the lookup joins from
    #    lineage (the reference's automated-feature-join contract).
    fresh_spine = spine.select("user_id").limit(20)
    n_spine = fresh_spine.count()
    scored = score_batch(
        spark, artifact, fresh_spine,
        resolve_table=lambda _: feat,
        predict_cols=["total_purchase_7d"],
    )
    rows = scored.collect()
    assert len(rows) == n_spine > 0
    assert all(r["prediction"] in (0.0, 1.0) for r in rows)

    # 7. Online serving emulation from the same registered table.
    store = OnlineStore.from_table(feat, ["user_id"])
    some_user = rows[0]["user_id"]
    online = store.lookup(some_user)
    offline = feat.filter(F.col("user_id") == some_user).collect()[0]
    assert online["total_purchase_7d"] == offline["total_purchase_7d"]

    # GBT sanity: the returned PipelineModel assembles its own features,
    # so it scores the RAW training frame directly
    preds = model.transform(train_df)
    assert preds.count() == train_df.count()

    fs.drop_table("e2e_user_features")
