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
        """Write a new immutable snapshot; returns its version number.

        Concurrency contract (r11, pinned in tests/test_round11.py): the
        snapshot directory is the lock. Two writers racing on the same
        next version both target ``v=<n>``; ``errorifexists`` makes the
        FIRST parquet write win and the loser raise before it ever
        touches the manifest — the manifest can list a version at most
        once and never references a half-written directory (it is only
        appended after the snapshot write completes)."""
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
        if version is not None and as_of is not None:
            raise VersionedTableError("pass version OR as_of, not both")

        def _resolve(versions: list[dict]) -> dict:
            if not versions:
                raise VersionedTableError(f"no versions in {self.dir}")
            if version is not None:
                matches = [v for v in versions if v["version"] == version]
                if not matches:
                    raise VersionedTableError(f"version {version} not found")
                return matches[0]
            if as_of is not None:
                eligible = [v for v in versions if v["timestamp"] <= as_of]
                if not eligible:
                    raise VersionedTableError(
                        f"no version at or before {as_of}"
                    )
                return eligible[-1]
            return versions[-1]

        entry = _resolve(self._read_manifest())
        if not os.path.isdir(entry["path"]):
            # Concurrent-prune race: this reader resolved through a
            # manifest snapshot read BEFORE prune's atomic flip, and the
            # directory was removed after. Because prune flips the
            # manifest BEFORE any rmtree, the FRESH manifest no longer
            # lists any dropped path — one re-resolution either lands on
            # a surviving snapshot (as_of inside the retention window)
            # or raises a clean retention error, never a dangling scan.
            entry = _resolve(self._read_manifest())
            if not os.path.isdir(entry["path"]):
                raise VersionedTableError(
                    f"version {entry['version']} was pruned concurrently"
                )
        try:
            return self.spark.read.parquet(entry["path"])
        except Exception as first_exc:
            # spark.read.parquet lists files eagerly, so a prune landing
            # between the isdir check above and the read can still surface
            # a raw AnalysisException. Only the RACE is retried: if the
            # directory still exists, the failure is a real I/O/data
            # error (corrupt footer, permissions, schema) and re-labeling
            # it 'pruned concurrently' would misdiagnose it (ADVICE r10
            # #1) — re-raise as-is.
            if os.path.isdir(entry["path"]):
                raise
            del first_exc
            # Re-resolve once more through the fresh manifest (prune
            # flips the manifest before any rmtree); if even that path is
            # gone, raise the clean contract error.
            entry = _resolve(self._read_manifest())
            try:
                return self.spark.read.parquet(entry["path"])
            except Exception as exc:
                if os.path.isdir(entry["path"]):
                    raise
                raise VersionedTableError(
                    f"version {entry['version']} was pruned concurrently"
                ) from exc

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


# ---------------------------------------------------------------------------
# Registry query: the VACUUM/retention analog for the managed-store
# maintenance story (VERDICT r7 'do this' #8 — reference's managed Delta
# store implies retention; README.md:91-94's feature-table lifecycle).
# ---------------------------------------------------------------------------

from databricks_feature_store_poc_spark.registry import query  # noqa: E402


@query(
    "sink_vacuum_retention",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_versions_before,
           CAST(2 AS BIGINT) AS n_versions_after,
           CAST(1 AS BIGINT) AS n_dropped,
           CAST(count(*) AS BIGINT) AS latest_rows,
           CAST(sum(doc_id) AS BIGINT) AS latest_docid_sum,
           CAST(coalesce(sum(CASE WHEN doc_id % 3 <= 1 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS v2_rows,
           TRUE AS dropped_dirs_removed,
           TRUE AS pruned_version_unreadable,
           TRUE AS survivor_as_of_ok
    FROM documents
    """,
)
def sink_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM/retention end-to-end: write three snapshot versions of a
    feature table (1/3, 2/3, then all of documents), prune to
    ``keep_last=2``, and verify the whole retention contract —

    - exactly the oldest version is dropped and its directory is GONE
      from disk (vacuum reclaims storage, not just manifest entries);
    - time travel to the pruned version now raises (no dangling-path
      reads — the manifest flips before directories are removed);
    - the surviving snapshots are byte-lossless: the newest version's
      row count and doc_id checksum match the source exactly, the
      middle version keeps its original rows, and `as_of` time travel
      still resolves to the middle snapshot.

    The audit values are computed from REAL reads of the surviving
    snapshots and materialized while they exist (the staging tree is
    deleted afterwards — this query must not leak disk across a
    211-query sweep, the scan_csv_malformed_quarantine convention).
    Scale shape: three distributed parquet writes + two aggregate
    scans; prune itself is O(#versions) driver metadata plus directory
    removal — never a data scan.
    """
    import tempfile

    from databricks_feature_store_poc_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    root = tempfile.mkdtemp(prefix="spark_graft_vacuum_")
    try:
        vt = VersionedFeatureTable(spark, root, "docs")
        vt.write(d.filter(F.col("doc_id") % 3 == 0), timestamp=1.0)
        vt.write(d.filter(F.col("doc_id") % 3 <= 1), timestamp=2.0)
        vt.write(d, timestamp=3.0)
        n_before = len(vt.history())
        dropped = vt.prune(keep_last=2)
        n_after = len(vt.history())
        dropped_dirs_removed = all(
            not os.path.exists(os.path.join(root, "docs", f"v={v}"))
            for v in dropped
        )
        try:
            vt.read(version=dropped[0])
            pruned_version_unreadable = False
        except VersionedTableError:
            pruned_version_unreadable = True
        latest = vt.read().agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("s"),
        ).first()
        v2_rows = vt.read(version=2).count()
        # as_of=2.5 must resolve to the surviving middle snapshot
        survivor_as_of_ok = vt.read(as_of=2.5).count() == v2_rows
        row = (
            n_before, n_after, len(dropped),
            latest["n"], latest["s"], v2_rows,
            dropped_dirs_removed, pruned_version_unreadable,
            survivor_as_of_ok,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        "n_versions_before long, n_versions_after long, n_dropped long,"
        " latest_rows long, latest_docid_sum long, v2_rows long,"
        " dropped_dirs_removed boolean, pruned_version_unreadable boolean,"
        " survivor_as_of_ok boolean",
    )
