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
    listing. Simulated by lying isdir=True for the pruned path ONLY on
    the pre-check call — afterwards isdir tells the truth, because the
    r11 narrow-catch (ADVICE r10 #1) re-raises real I/O errors whenever
    the directory still exists."""
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
    lies = {"left": 1}

    def isdir_toctou(p):
        if p == v1_path and lies["left"] > 0:
            lies["left"] -= 1
            return True
        return real_isdir(p)

    monkeypatch.setattr(vmod.os.path, "isdir", isdir_toctou)
    # stale manifest + as_of=150 -> v1: the pre-check lie lets the eager
    # read throw; the except path sees the dir truly gone, re-resolves
    # the FRESH manifest where the as_of range is retired -> clean
    # retention error, never a raw AnalysisException
    with pytest.raises(VersionedTableError, match="at or before"):
        vt.read(as_of=150.0)


def test_read_retry_lands_on_survivor_after_eager_listing_race(
    spark, tmp_path, monkeypatch
):
    """The except-retry SUCCESS path (ADVICE r10 #3): the first eager
    read throws on a dangling path, the dir is truly gone, and the
    re-resolve through the fresh manifest returns the survivor's rows."""
    vt = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0)

    # stale manifest whose v2 entry points at a path that no longer
    # exists (the shape a prune/rewrite race leaves behind)
    bogus = str(tmp_path / "gone_v2")
    stale = [dict(e) for e in vt._read_manifest()]
    stale[1]["path"] = bogus

    real_read = VersionedFeatureTable._read_manifest
    calls = {"n": 0}

    def stale_then_fresh(self):
        calls["n"] += 1
        return [dict(e) for e in stale] if calls["n"] == 1 else real_read(self)

    monkeypatch.setattr(
        VersionedFeatureTable, "_read_manifest", stale_then_fresh
    )
    real_isdir = os.path.isdir
    lies = {"left": 1}

    def isdir_toctou(p):
        if p == bogus and lies["left"] > 0:
            lies["left"] -= 1
            return True  # pre-check passes; the eager read then throws
        return real_isdir(p)

    monkeypatch.setattr(vmod.os.path, "isdir", isdir_toctou)
    # resolve#1 -> stale v2 (bogus path), pre-check lies True, eager
    # read raises, except path: dir truly gone -> re-resolve FRESH ->
    # real v2 path -> the survivor's 2 rows come back
    assert vt.read(version=2).count() == 2


def test_read_reraises_real_io_errors_when_dir_exists(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 #1: a read failure over a directory that still EXISTS
    is a real I/O/data error and must surface as-is — not be retried and
    re-labeled 'pruned concurrently'."""
    vt = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    entry = vt._read_manifest()[0]
    # corrupt the snapshot: replace the parquet part with garbage bytes
    for name in os.listdir(entry["path"]):
        if name.endswith(".parquet"):
            with open(os.path.join(entry["path"], name), "wb") as f:
                f.write(b"not a parquet file")
    with pytest.raises(Exception) as exc_info:
        vt.read(version=1).count()
    assert not isinstance(exc_info.value, VersionedTableError)


def test_read_dangling_on_both_resolves_raises_contract_error(
    spark, tmp_path, monkeypatch
):
    """Always-stale manifest + pinned pruned version -> the clean
    contract error, never a raw AnalysisException."""
    vt = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0)
    stale = vt._read_manifest()
    assert vt.prune(keep_last=1) == [1]
    monkeypatch.setattr(
        VersionedFeatureTable, "_read_manifest", lambda self: list(stale)
    )
    with pytest.raises(VersionedTableError, match="pruned concurrently"):
        vt.read(version=1)
