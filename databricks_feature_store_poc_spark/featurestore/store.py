"""Feature-table registry: the open-Spark equivalent of the reference's
``databricks.feature_store.FeatureStoreClient`` table operations.

Reference parity (citations into /root/reference):
- S4 create database:  01_feature_table_creation.py:109-115 (``CREATE
  DATABASE IF NOT EXISTS``) — identical SQL here.
- S5 create_table:     01:162-191 passes name, primary_keys, df, schema,
  description to ``fs.create_table``; PK *presence* is checked driver-side
  (01:172-174) but uniqueness is delegated to the managed service
  (SURVEY.md §4). Here uniqueness is enforced explicitly with one
  aggregate before the write.
- S6 drop_table:       01:153-160 (idempotent drop).
- S8 read_table:       02_model_training.py:140-148.

Storage: managed tables via ``saveAsTable`` (parquet; Delta is not in this
container) + a JSON metadata sidecar per table carrying primary keys /
description / lineage — the role Databricks' catalog service plays for the
reference.

Scale: the PK-uniqueness gate is a single hash aggregate
(groupBy(pk).count > 1) — one shuffle, partial-agg'd map-side, and AQE
handles skewed keys. The write itself is a distributed parquet write; no
driver materialization anywhere.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PrimaryKeyViolation(ValueError):
    """Raised when a feature table's declared PK is absent or non-unique."""


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


def _check_ident(name: str) -> str:
    """Reject names that could break out of SQL strings or the metadata
    path (quotes, slashes, '..') — they are interpolated into both."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid table/database identifier: {name!r}")
    return name


@dataclass
class FeatureTableMetadata:
    name: str
    primary_keys: list[str]
    description: str = ""
    schema_json: str = ""
    extra: dict = field(default_factory=dict)


def _default_meta_dir(spark: SparkSession) -> str:
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    return os.path.join(warehouse, "_feature_store_meta")


class FeatureStore:
    """Minimal feature-store client over a Spark catalog.

    >>> fs = FeatureStore(spark)
    >>> fs.create_database("sales")
    >>> fs.create_table("sales.customer_features", ["customer_id"], df,
    ...                 description="7/30-day purchase aggregates")
    >>> feat = fs.read_table("sales.customer_features")
    """

    def __init__(self, spark: SparkSession, meta_dir: str | None = None):
        self.spark = spark
        self.meta_dir = meta_dir or _default_meta_dir(spark)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- S4 -----------------------------------------------------------------
    def create_database(self, name: str) -> None:
        """Idempotent namespace creation (reference 01:112)."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {_check_ident(name)}")

    # -- S5 + S7 ------------------------------------------------------------
    def create_table(
        self,
        name: str,
        primary_keys: list[str],
        df: DataFrame,
        description: str = "",
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, list[str]] | None = None,
        format: str | None = None,
    ) -> FeatureTableMetadata:
        """Register + write a feature table.

        Validates PK presence (reference 01:172-174) and — stronger than the
        reference, which delegates this to the managed service — PK
        uniqueness, via one distributed aggregate.

        ``format="delta"`` writes a Delta table when delta-spark is
        importable (the reference's managed-runtime storage; ACID MERGE via
        merge.merge_into_table) and degrades to parquet otherwise —
        the metadata records both the requested and the actual format so
        the degradation is observable.

        Scale knobs:
        - ``partition_by``: directory partitioning; equality/IN filters on
          these columns prune whole partitions at scan time.
        - ``bucket_by``: ``(n_buckets, cols)`` hash-bucketing; a join or
          aggregate keyed on the bucket columns between two tables
          bucketed the same way is shuffle-free (Catalyst reuses the
          bucketing as the required distribution). Bucket feature tables
          on their PK so repeated training-set builds against a bucketed
          spine never reshuffle the fact side.
        """
        _check_ident(name)
        from .deltafmt import resolve_write_format

        requested_format, actual_format = resolve_write_format(format)
        if actual_format == "delta" and bucket_by:
            raise ValueError("Delta tables do not support bucketBy")
        missing = [k for k in primary_keys if k not in df.columns]
        if missing:
            raise PrimaryKeyViolation(
                f"primary keys {missing} not in columns {df.columns}"
            )
        # Persist around the two actions (uniqueness check + write): without
        # it a recomputed df runs its whole upstream pipeline twice — the
        # exact double-materialization the reference itself exhibits
        # (SURVEY.md §4) and a doubled 100 TB pipeline at scale.
        df.persist()
        try:
            dupes = (
                df.groupBy(*primary_keys)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .filter(F.col("cnt") > 1)
            )
            if not dupes.isEmpty():
                sample = [r.asDict() for r in dupes.limit(5).collect()]
                raise PrimaryKeyViolation(
                    f"duplicate primary-key values in {name}: sample={sample}"
                )
            if mode == "overwrite":
                # An orphaned managed-table directory (e.g. from a crashed
                # run: files on disk, no catalog entry) makes saveAsTable
                # fail with LOCATION_ALREADY_EXISTS — clear both.
                self.spark.sql(f"DROP TABLE IF EXISTS {name}")
                warehouse = self.spark.conf.get(
                    "spark.sql.warehouse.dir", "spark-warehouse"
                ).removeprefix("file:")
                orphan = os.path.join(warehouse, name.replace(".", ".db/", 1)
                                      if "." in name else name)
                if os.path.isdir(orphan):
                    import shutil

                    shutil.rmtree(orphan, ignore_errors=True)
            writer = df.write.format(actual_format).mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            if bucket_by:
                n_buckets, cols = bucket_by
                writer = writer.bucketBy(n_buckets, *cols).sortBy(*cols)
            writer.saveAsTable(name)
        finally:
            df.unpersist()
        meta = FeatureTableMetadata(
            name=name,
            primary_keys=list(primary_keys),
            description=description,
            schema_json=df.schema.json(),
            extra={
                "partition_by": list(partition_by or []),
                "bucket_by": [bucket_by[0], list(bucket_by[1])] if bucket_by else None,
                "requested_format": requested_format,
                "format": actual_format,
            },
        )
        self._write_meta(meta)
        return meta

    # -- S8 -----------------------------------------------------------------
    def read_table(self, name: str) -> DataFrame:
        """Load a registered feature table (reference 02:145)."""
        return self.spark.table(name)

    # -- S6 -----------------------------------------------------------------
    def drop_table(self, name: str) -> None:
        """Idempotent drop (reference 01:156 wraps in try/except)."""
        self.spark.sql(f"DROP TABLE IF EXISTS {_check_ident(name)}")
        path = self._meta_path(name)
        if os.path.exists(path):
            os.remove(path)

    # -- metadata sidecar -----------------------------------------------------
    def get_metadata(self, name: str) -> FeatureTableMetadata:
        with open(self._meta_path(name)) as f:
            return FeatureTableMetadata(**json.load(f))

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.meta_dir, f"{name}.json")

    def _write_meta(self, meta: FeatureTableMetadata) -> None:
        with open(self._meta_path(meta.name), "w") as f:
            json.dump(asdict(meta), f, indent=2)
