from databricks_feature_store_poc_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)
from databricks_feature_store_poc_spark.sources.csv import read_csv_inferred

__all__ = ["TABLES", "load_table", "register_views", "read_csv_inferred"]
