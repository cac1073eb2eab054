from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    TrainingSet,
    create_training_set,
)
from databricks_feature_store_poc_spark.featurestore.online import OnlineStore
from databricks_feature_store_poc_spark.featurestore.store import (
    FeatureStore,
    FeatureTableMetadata,
    PrimaryKeyViolation,
)

__all__ = [
    "FeatureLookup",
    "FeatureStore",
    "FeatureTableMetadata",
    "OnlineStore",
    "PrimaryKeyViolation",
    "TrainingSet",
    "create_training_set",
]
