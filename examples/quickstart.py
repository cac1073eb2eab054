"""Quickstart: the reference POC's whole lifecycle on this engine.

Mirrors the two reference notebooks end to end (see MIGRATION.md for the
call-site mapping): compute features from raw events, register them with
PK enforcement, assemble a training set declaratively, train, log the
model with lineage, batch-score a fresh spine, and serve online lookups.

    python examples/quickstart.py [sf_dir]     # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from databricks_feature_store_poc_spark.featurestore.lookup import (  # noqa: E402
    FeatureLookup,
    create_training_set,
)
from databricks_feature_store_poc_spark.featurestore.mlpath import (  # noqa: E402
    ModelRegistry,
    score_batch,
    train_gbt,
)
from databricks_feature_store_poc_spark.featurestore.online import OnlineStore  # noqa: E402
from databricks_feature_store_poc_spark.featurestore.store import FeatureStore  # noqa: E402
from databricks_feature_store_poc_spark.operators.rolling import rolling_range_sum  # noqa: E402
from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("quickstart", master="local[8]", shuffle_partitions=8)
    fs = FeatureStore(spark)

    # 1. Feature engineering: trailing purchase sums from raw events
    #    (the computation behind the reference's customer_features.csv).
    events = load_table(spark, sf_dir, "events")
    feats = rolling_range_sum(
        rolling_range_sum(events, "user_id", "ts", "value", 7, "total_purchase_7d"),
        "user_id", "ts", "value", 30, "total_purchase_30d",
    )
    latest = (
        feats.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "total_purchase_7d", "total_purchase_30d")
    )

    # 2. Register (PK-enforced), like fs.create_table in the reference.
    fs.create_table("qs_user_features", ["user_id"], latest,
                    description="trailing purchase sums")
    table = fs.read_table("qs_user_features")
    print(f"feature table: {table.count()} users")

    # 3. Declarative training set (fs.create_training_set equivalent).
    spine = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchased")
    )
    ts = create_training_set(
        spark, spine,
        [FeatureLookup.of("qs_user_features",
                          ["total_purchase_7d", "total_purchase_30d"], "user_id")],
        label="purchased",
        resolve_table=lambda _: table,
    )
    matrix = ts.load_df().na.fill(0.0)
    print(f"training matrix: {matrix.count()} rows x {len(matrix.columns)} cols")

    # 4. Distributed train (the scale path; CatBoost-on-driver also works
    #    at fixture scale via matrix.toPandas()).
    train_df = matrix.select(
        F.col("total_purchase_7d").alias("f1"),
        F.col("total_purchase_30d").alias("f2"),
        F.col("purchased").cast("double").alias("label"),
    )
    train_gbt(train_df, ["f1", "f2"], "label")
    print("GBT trained")

    # 5. Log a scoring model with lineage + register it.
    class Threshold:
        def predict(self, f):
            return (f.iloc[:, 0].fillna(0.0) > 100.0).astype(float)

    reg = ModelRegistry(os.path.join(tempfile.gettempdir(), "qs_registry"))
    reg.delete("sales.purchase_model")
    version = reg.register("sales.purchase_model", Threshold(), training_set=ts,
                           metrics={"n_train": matrix.count()})
    print(f"registered sales.purchase_model v{version}")

    # 6. Batch scoring: lineage replays the feature joins on a new spine.
    scored = score_batch(
        spark, reg.artifact_dir("sales.purchase_model"),
        spine.select("user_id"),
        resolve_table=lambda _: table,
        predict_cols=["total_purchase_7d"],
    )
    print("scored sample:", scored.select("user_id", "prediction").head(3))

    # 7. Online serving emulation (<1 ms point lookups).
    store = OnlineStore.from_table(table, ["user_id"])
    uid = table.head()["user_id"]
    print(f"online lookup user {uid}:", store.lookup(uid))

    # 8. Leak-safe composition: on-demand expressions over a
    #    point-in-time lookup — each purchase enriched with the user's
    #    balance AS OF that moment (timestamp_lookup_key), plus
    #    request-context features derived from spine + PIT columns in
    #    the same plan. This is the serve-time shape of the platform.
    versions = events.select(
        "user_id",
        F.col("ts").alias("fts"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros(F.col("ts")))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("double")
        .alias("balance"),
    ).distinct()
    pit_spine = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    pit_ts = create_training_set(
        spark, pit_spine,
        [FeatureLookup(
            table_name="user_balance_versions",
            feature_names=("balance",),
            lookup_key=("user_id",),
            spine_keys=("user_id",),
            timestamp_lookup_key=("ts", "fts"),
        )],
        resolve_table={"user_balance_versions": versions}.__getitem__,
        on_demand_features={
            "value_to_balance": "round(value / nullif(balance, 0), 6)",
            "is_funded": "balance >= value",
        },
    )
    print("PIT + on-demand sample:",
          pit_ts.load_df().select("event_id", "balance", "is_funded").head(3))

    fs.drop_table("qs_user_features")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
