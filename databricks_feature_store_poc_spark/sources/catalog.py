"""Parquet source catalog for the driver test tables.

Centralizes the one real cross-engine hazard in the testdata: the ``events``
table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4 only reads
via ``spark.sql.legacy.parquet.nanosAsLong=true`` (raw int64 nanoseconds).
``load_table`` normalizes that to TimestampType truncated to microseconds —
byte-identical to what DuckDB produces when it reads the same file — so the
driver's value-hash comparison sees the same instants from both engines.

Scale note: these are plain ``spark.read.parquet`` scans, so Catalyst's
predicate pushdown / column pruning / partition pruning all apply to every
query built on top (SURVEY.md §4). Nothing here materializes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table, normalizing types for cross-engine parity.

    - ``events.ts``: int64 nanoseconds (via nanosAsLong) -> TimestampType at
      microsecond precision (integer division truncates, matching DuckDB).
    - ``embeddings.embedding``: already ``array<float>``; left as-is.
    """
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) must read as LTZ, not
        # NTZ — see session.py DEFAULT_CONFS for the rationale.
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            # Static in some builds; if it is and events can't be read, the
            # error surfaces at scan time with a clear parquet-type message.
            pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # Defensive: if an externally-created session pinned NTZ inference on
    # before our conf.set (parquet confs are read at scan creation), cast
    # any NTZ column to LTZ. Under the UTC session TZ this is value-stable
    # and a no-op when the conf above took effect.
    ntz_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def parquet_row_count(sf_dir: str, name: str) -> int | None:
    """Table row count from parquet FOOTER metadata only — no data scan,
    no Spark job. Sums ``num_rows`` across footers, handling both the
    driver's single-file layout and Spark-written directory datasets
    (the replica harness). Returns None when footers can't be read so
    callers can fall back to a columnless ``df.count()`` scan.

    Exists because ``spark.sql.parquet.aggregatePushdown`` is off by
    default, so ``load_table(...).count()`` is a real (if cheap,
    columnless) scan job — cardinality gates that advertise a
    metadata-only probe route through here instead.
    """
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        else:
            files = [path]
        if not files:
            # Partitioned/nested layout (no top-level .parquet parts) or a
            # marker-only dir: the footer probe can't see the data, so honor
            # the None-on-unreadable contract instead of reporting 0 rows —
            # callers fall back to a columnless df.count() scan.
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
