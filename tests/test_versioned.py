"""Versioned feature table (time travel) tests."""

from __future__ import annotations

import pytest

from databricks_feature_store_poc_spark.featurestore.versioned import (
    VersionedFeatureTable,
    VersionedTableError,
)


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedFeatureTable(spark, str(tmp_path), "feat")


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "k long, v double")


def test_write_read_latest_and_pinned(spark, vt):
    assert vt.write(_df(spark, [1.0]), timestamp=100.0) == 1
    assert vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0) == 2
    assert vt.read().count() == 2                      # latest
    assert vt.read(version=1).count() == 1             # pinned
    assert [h["version"] for h in vt.history()] == [1, 2]


def test_as_of_time_travel(spark, vt):
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    vt.write(_df(spark, [2.0, 3.0]), timestamp=200.0)
    assert vt.read(as_of=150.0).count() == 1
    assert vt.read(as_of=250.0).count() == 2
    with pytest.raises(VersionedTableError, match="at or before"):
        vt.read(as_of=50.0)


def test_snapshots_immutable(spark, vt):
    vt.write(_df(spark, [1.0]), timestamp=100.0)
    v1_rows = vt.read(version=1).collect()
    vt.write(_df(spark, [9.0, 9.0, 9.0]), timestamp=200.0)
    assert vt.read(version=1).collect() == v1_rows  # old snapshot untouched


def test_errors(spark, vt):
    with pytest.raises(VersionedTableError, match="no versions"):
        vt.read()
    vt.write(_df(spark, [1.0]))
    with pytest.raises(VersionedTableError, match="not both"):
        vt.read(version=1, as_of=1.0)
    with pytest.raises(VersionedTableError, match="not found"):
        vt.read(version=9)


def test_prune_retention(spark, vt):
    for ts in (100.0, 200.0, 300.0):
        vt.write(_df(spark, [ts]), timestamp=ts)
    dropped = vt.prune(keep_last=1)
    assert dropped == [1, 2]
    assert [h["version"] for h in vt.history()] == [3]
    assert vt.read().count() == 1
    with pytest.raises(VersionedTableError):
        vt.read(version=1)
