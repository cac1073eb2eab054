"""CSV source preflight + inference tests (reference S1/S2/S3)."""

from __future__ import annotations

import pytest

from databricks_feature_store_poc_spark.sources.csv import (
    SourceValidationError,
    read_csv_inferred,
    validate_required_files,
    validate_source_path,
)


def test_validate_source_path(tmp_path):
    validate_source_path(str(tmp_path))
    with pytest.raises(SourceValidationError, match="does not exist"):
        validate_source_path(str(tmp_path / "nope"))


def test_validate_required_files(tmp_path):
    (tmp_path / "a.csv").write_text("x\n1\n")
    validate_required_files(str(tmp_path), ["a.csv"])
    with pytest.raises(SourceValidationError, match="missing required"):
        validate_required_files(str(tmp_path), ["a.csv", "b.csv"])


def test_read_csv_inferred_types_and_crlf(spark, tmp_path):
    # CRLF endings like the reference CSVs (SURVEY §1.2): reader normalizes.
    p = tmp_path / "feat.csv"
    p.write_bytes(b"customer_id,total_purchase_7d,category\r\n1,10.5,Sports\r\n2,20.0,Books\r\n")
    df = read_csv_inferred(spark, str(p))
    dtypes = dict(df.dtypes)
    assert dtypes["customer_id"] == "int"
    assert dtypes["total_purchase_7d"] == "double"
    assert dtypes["category"] == "string"
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, 10.5, "Sports"), (2, 20.0, "Books")]


def test_read_csv_inferred_rejects_empty(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("a,b\n")
    with pytest.raises(SourceValidationError, match="empty input"):
        read_csv_inferred(spark, str(p))


class TestPythonDataSource:
    def test_batch_read_parallel_and_deterministic(self, spark):
        from databricks_feature_store_poc_spark.sources.pydatasource import (
            lcg_value,
            register,
        )

        register(spark)
        df = (
            spark.read.format("synthetic_telemetry")
            .option("n_rows", 1000).option("n_shards", 4).load()
        )
        assert df.rdd.getNumPartitions() == 4
        rows = {r["event_id"]: r for r in df.collect()}
        assert len(rows) == 1000
        assert rows[7]["payload"] == lcg_value(7)

    def test_stream_read_equals_batch(self, spark):
        """The offset-managed streaming reader must deliver exactly the
        batch rows, across multiple micro-batches, no dupes or gaps."""
        from databricks_feature_store_poc_spark.sources.pydatasource import register

        register(spark)
        opts = {"n_rows": 5000, "n_shards": 4, "batch_rows": 1024}
        stream = spark.readStream.format("synthetic_telemetry")
        for k, v in opts.items():
            stream = stream.option(k, v)
        q = (
            stream.load()
            .writeStream.format("memory")
            .queryName("pyds_sink")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()

        got = {tuple(r) for r in spark.table("pyds_sink").collect()}
        batch = spark.read.format("synthetic_telemetry")
        for k, v in opts.items():
            batch = batch.option(k, v)
        want = {tuple(r) for r in batch.load().collect()}
        assert got == want and len(got) == 5000
        assert n_batches >= 2  # actually incremental, not one gulp
