"""Versioned feature tables: snapshot writes + time travel over parquet.

The Delta-style capability (SURVEY §0: "Spark SQL + Delta-style storage")
without Delta in the container: every write is an immutable snapshot
directory plus a JSON manifest entry; readers resolve a version number or
an `as_of` timestamp to a snapshot path. What this buys a feature store:

- **Reproducible training**: a model's lineage can pin `version=N` and
  score_batch replays against the exact bytes training saw.
- **Safe concurrent reads**: writers never mutate a snapshot a reader may
  be scanning — a new version is a new directory; the manifest flip is
  the only metadata change (written atomically via rename).
- **Point-in-time + versions compose**: `as_of` picks the snapshot; the
  timestamp_lookup_key lookup then picks rows within it.

Scale: a snapshot is a normal distributed parquet write (optionally
partitioned); the manifest is O(#versions) JSON. Retention/vacuum is a
deployment policy — `prune(keep_last=k)` implements the mechanism.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTableError(ValueError):
    pass


class VersionedFeatureTable:
    """Path-based snapshot versioning for one logical feature table."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "_manifest.json")

    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["versions"]

    def _write_manifest(self, versions: list[dict]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"versions": versions}, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic flip

    # -- write -------------------------------------------------------------
    def write(self, df: DataFrame, *, timestamp: float | None = None) -> int:
        """Write a new immutable snapshot; returns its version number."""
        versions = self._read_manifest()
        version = (versions[-1]["version"] + 1) if versions else 1
        path = os.path.join(self.dir, f"v={version}")
        df.write.mode("errorifexists").parquet(path)
        versions.append(
            {
                "version": version,
                "timestamp": timestamp if timestamp is not None else time.time(),
                "path": path,
            }
        )
        self._write_manifest(versions)
        return version

    # -- read / time travel -------------------------------------------------
    def read(
        self, version: int | None = None, as_of: float | None = None
    ) -> DataFrame:
        """Latest snapshot by default; a specific `version`; or the newest
        snapshot written at or before `as_of` (epoch seconds)."""
        versions = self._read_manifest()
        if not versions:
            raise VersionedTableError(f"no versions in {self.dir}")
        if version is not None and as_of is not None:
            raise VersionedTableError("pass version OR as_of, not both")
        if version is not None:
            matches = [v for v in versions if v["version"] == version]
            if not matches:
                raise VersionedTableError(f"version {version} not found")
            entry = matches[0]
        elif as_of is not None:
            eligible = [v for v in versions if v["timestamp"] <= as_of]
            if not eligible:
                raise VersionedTableError(f"no version at or before {as_of}")
            entry = eligible[-1]
        else:
            entry = versions[-1]
        return self.spark.read.parquet(entry["path"])

    def history(self) -> list[dict]:
        return list(self._read_manifest())

    def read_evolved(self) -> DataFrame:
        """Read ALL snapshots as one relation with schema evolution:
        columns added in later versions surface as NULL on earlier rows
        (parquet mergeSchema). This is the time-travel-union view a
        backfill job wants when a feature column was added mid-history;
        per-version reads keep their exact written schema. A version
        column tags provenance."""
        versions = self._read_manifest()
        if not versions:
            raise VersionedTableError(f"no versions in {self.dir}")
        merged = self.spark.read.option("mergeSchema", "true").parquet(
            *[v["path"] for v in versions]
        )
        # recover the version tag from the directory name (v=<n>)
        return merged.withColumn(
            "version",
            F.regexp_extract(F.input_file_name(), r"v=(\d+)", 1).cast("int"),
        )

    # -- retention ----------------------------------------------------------
    def prune(self, keep_last: int) -> list[int]:
        """Drop all but the newest `keep_last` snapshots; returns dropped
        version numbers. The manifest flips before directories are removed
        so a concurrent reader resolving via the manifest never sees a
        dangling path."""
        versions = self._read_manifest()
        if keep_last < 1:
            raise VersionedTableError("keep_last must be >= 1")
        drop, keep = versions[:-keep_last], versions[-keep_last:]
        self._write_manifest(keep)
        for v in drop:
            shutil.rmtree(v["path"], ignore_errors=True)
        return [v["version"] for v in drop]
