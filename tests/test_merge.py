"""Upsert (MERGE emulation) + SCD2 history tests, incl. the SCD2 -> PIT
composition that makes write-side history and read-side point-in-time
lookups two halves of one contract."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.merge import (
    merge_upsert,
    scd2_apply,
)


def t(d):
    return datetime.datetime(2024, 1, d)


class TestUpsert:
    def test_update_and_insert(self, spark):
        target = spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"
        )
        updates = spark.createDataFrame(
            [(2, 99.0), (3, 30.0)], "k long, v double"
        )
        out = {r["k"]: r["v"] for r in merge_upsert(target, updates, ["k"]).collect()}
        assert out == {1: 10.0, 2: 99.0, 3: 30.0}

    def test_idempotent(self, spark):
        target = spark.createDataFrame([(1, 10.0)], "k long, v double")
        updates = spark.createDataFrame([(1, 99.0)], "k long, v double")
        once = merge_upsert(target, updates, ["k"])
        twice = merge_upsert(once, updates, ["k"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_schema_mismatch_rejected(self, spark):
        target = spark.createDataFrame([(1, 10.0)], "k long, v double")
        updates = spark.createDataFrame([(1, "x")], "k long, other string")
        with pytest.raises(ValueError, match="schema mismatch"):
            merge_upsert(target, updates, ["k"])


class TestSCD2:
    def _history(self, spark):
        return spark.createDataFrame(
            [(1, 10.0, t(1), None), (2, 20.0, t(1), None)],
            "k long, v double, valid_from timestamp, valid_to timestamp",
        )

    def test_update_closes_and_opens(self, spark):
        updates = spark.createDataFrame([(1, 11.0, t(5))], "k long, v double, ts timestamp")
        out = scd2_apply(self._history(spark), updates, ["k"], "ts")
        rows = sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in out.collect()
        )
        assert rows == [
            (1, 10.0, t(1), t(5)),   # closed at update time
            (1, 11.0, t(5), None),   # new open row
            (2, 20.0, t(1), None),   # untouched
        ]

    def test_closed_rows_never_rewritten(self, spark):
        h = self._history(spark)
        h2 = scd2_apply(h, spark.createDataFrame([(1, 11.0, t(5))], "k long, v double, ts timestamp"), ["k"], "ts")
        h3 = scd2_apply(h2, spark.createDataFrame([(1, 12.0, t(9))], "k long, v double, ts timestamp"), ["k"], "ts")
        closed = sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in h3.filter(F.col("valid_to").isNotNull()).collect()
        )
        assert closed == [(1, 10.0, t(1), t(5)), (1, 11.0, t(5), t(9))]

    def test_scd2_history_feeds_point_in_time_lookup(self, spark):
        """The SCD2 table's (k, valid_from, v) IS the versioned-rows input
        of a timestamp_lookup_key lookup: as-of day 7 the value is the
        day-5 update, not the day-9 one."""
        from databricks_feature_store_poc_spark.featurestore.lookup import (
            FeatureLookup,
            create_training_set,
        )

        h = self._history(spark)
        for day, v in ((5, 11.0), (9, 12.0)):
            h = scd2_apply(
                h,
                spark.createDataFrame([(1, v, t(day))], "k long, v double, ts timestamp"),
                ["k"], "ts",
            )
        versions = h.select("k", F.col("valid_from").alias("fts"), "v")
        spine = spark.createDataFrame([(1, t(7)), (1, t(10)), (2, t(7))],
                                      "k long, ts timestamp")
        lk = FeatureLookup("h", ("v",), ("k",), spine_keys=("k",),
                           timestamp_lookup_key=("ts", "fts"))
        ts_set = create_training_set(
            spark, spine, [lk], resolve_table={"h": versions}.__getitem__
        )
        out = sorted((r["k"], r["ts"], r["v"]) for r in ts_set.load_df().collect())
        assert out == [(1, t(7), 11.0), (1, t(10), 12.0), (2, t(7), 20.0)]

    def test_multi_update_batch_chains_versions(self, spark):
        """A batch with two rows for one key folds into a consecutive
        chain — the open row closed once at the FIRST update's ts, each
        update closed by its successor, exactly one open row per key
        (not two closed copies + two open rows)."""
        updates = spark.createDataFrame(
            [(1, 12.0, t(9)), (1, 11.0, t(5))], "k long, v double, ts timestamp"
        )
        out = scd2_apply(self._history(spark), updates, ["k"], "ts")
        rows = sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in out.collect()
        )
        assert rows == [
            (1, 10.0, t(1), t(5)),
            (1, 11.0, t(5), t(9)),
            (1, 12.0, t(9), None),
            (2, 20.0, t(1), None),
        ]
        open_per_key = (
            out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
        )
        assert all(r["count"] == 1 for r in open_per_key)

    def test_map_typed_attribute_folds(self, spark):
        """Map-typed attributes are unorderable and must be excluded from
        the (key, ts) tiebreak rather than crashing the window sort."""
        h = spark.createDataFrame(
            [(1, {"a": 1.0}, t(1), None)],
            "k long, m map<string,double>, valid_from timestamp, valid_to timestamp",
        )
        updates = spark.createDataFrame(
            [(1, {"b": 2.0}, t(5))], "k long, m map<string,double>, ts timestamp"
        )
        out = scd2_apply(h, updates, ["k"], "ts")
        rows = sorted((r["k"], r["valid_from"], r["valid_to"]) for r in out.collect())
        assert rows == [(1, t(1), t(5)), (1, t(5), None)]
