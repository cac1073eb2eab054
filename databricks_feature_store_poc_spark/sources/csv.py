"""CSV ingestion with the reference's semantics, minus its inefficiencies.

Reference behavior (cited into /root/reference):
- S1 CSV scan with header + schema inference:
  notebooks/01_feature_table_creation.py:69-75,139 and
  notebooks/02_model_training.py:106-112,213 use
  ``spark.read.load(path, format="csv", sep=",", inferSchema=True,
  header=True)``.
- S2 source validation: 01:79-107 / 02:121-138 assert the path exists and
  required files are present *before* any Spark job.
- S3 empty-input check: 01:142-143 / 02:216-217 reject zero-row inputs —
  but call ``df.count()`` twice (01:142,145), a double full scan flagged in
  SURVEY.md §4. We use ``df.isEmpty()``, which stops at the first row.

CRLF note (SURVEY.md §1.2): the reference CSVs use CRLF endings; Spark's
CSV reader normalizes them, so no special handling is needed here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SourceValidationError(ValueError):
    """Raised when a source path/file preflight fails (reference S2)."""


def validate_source_path(path: str) -> None:
    """Assert the source directory exists (reference 01:79-88)."""
    if not os.path.isdir(path):
        raise SourceValidationError(f"source path does not exist: {path}")


def validate_required_files(path: str, required: list[str]) -> None:
    """Assert required file names are present (reference 01:90-107)."""
    missing = set(required) - set(os.listdir(path))
    if missing:
        raise SourceValidationError(
            f"missing required files in {path}: {sorted(missing)}"
        )


def read_csv_inferred(
    spark: SparkSession,
    path: str,
    *,
    reject_empty: bool = True,
    null_value: str | None = None,
) -> DataFrame:
    """Reference S1+S3: header + inferSchema CSV scan, fail on empty input.

    ``null_value``: explicit NULL marker (e.g. ``\\N``) matching the
    writer's — required to keep empty string and NULL distinct through a
    round trip (r11); without it Spark folds both to NULL on read.
    """
    reader = spark.read.options(header=True, inferSchema=True, sep=",")
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    df = reader.csv(path)
    if reject_empty and df.isEmpty():
        raise SourceValidationError(f"empty input: {path}")
    return df
