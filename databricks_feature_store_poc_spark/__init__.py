"""PySpark-native feature-store / analytics engine.

A from-scratch re-expression of the capabilities of the reference POC
(``Gnanasarathy-alagesan/databricks-feature-store-poc``) on open-source
PySpark: feature tables with declared primary keys, declarative feature
lookups compiled to broadcast left joins, training-set assembly, plus the
relational / streaming / LLM-data-pipeline operator surface documented in
SURVEY.md §2.

Design rules (SURVEY.md §7):
- DataFrame/SQL first: declare logical plans, let Catalyst/AQE pick physical.
- UDFs are the slow path; Arrow-batched pandas UDFs when unavoidable.
- Every operator is designed for a multi-executor cluster at ~100 TB even
  though tests run on local[*]: broadcast small dims, partial aggregation,
  pushdown-friendly scans, no driver-side collect loops in the hot path.
"""

from databricks_feature_store_poc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
