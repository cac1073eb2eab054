"""Round-9 pins: RFM oracle-branch immunity to the env override,
footer-metadata row-count probe, and the zipf-skew sampler's law.

ADVICE r8 items: the registered ``feature_rfm_segments`` (ntile oracle)
must stay on the ntile branch even when SPARK_GRAFT_RFM_NTILE_MAX is
exercised for its advertised purpose (tuning the ``rfm_segments``
library entry point); the branch gate's probe must be genuinely
metadata-only (parquet footers, no scan job).
"""

from __future__ import annotations

import pytest

from databricks_feature_store_poc_spark.featurestore import mlpath
from databricks_feature_store_poc_spark.sources.catalog import (
    parquet_row_count,
)

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_registered_rfm_pins_ntile_branch_under_env_override(
    spark, monkeypatch
):
    """A lowered RFM_NTILE_MAX (the env override's purpose) flips the
    LIBRARY path to histogram cuts but must NOT flip the registered
    ntile-oracle query — its oracle is ntile-form and the branches
    differ on ties by construction."""
    monkeypatch.setattr(mlpath, "RFM_NTILE_MAX", 1)
    registered = mlpath.QUERIES["feature_rfm_segments"](spark, SF)
    assert "ntile" in _executed_plan(registered)
    library = mlpath.rfm_segments(spark, SF)  # honors the override
    assert "ntile" not in _executed_plan(library)


def test_parquet_row_count_is_footer_exact(spark, tmp_path):
    # driver single-file layout
    assert parquet_row_count(SF, "customer") == 150
    # Spark directory layout (the replica-harness shape)
    df = spark.range(0, 1234).toDF("k")
    df.repartition(3).write.parquet(str(tmp_path / "t.parquet"))
    assert parquet_row_count(str(tmp_path), "t") == 1234
    # unreadable -> None so callers fall back to a scan
    assert parquet_row_count(str(tmp_path), "missing") is None


def test_zipf_sampler_follows_rank_frequency_law(spark):
    """The skewed-replica builder's in-plan sampler: P(k) must decay
    ~1/(k+1) and the head must own a double-digit share."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "make_skewed_replica",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "make_skewed_replica.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import functions as F

    n = 100
    df = spark.range(0, 50_000).select(
        mod._zipf(mod._unif(F.col("id"), seed=7), n).alias("k")
    )
    counts = {r["k"]: r["cnt"] for r in
              df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) <= set(range(n))
    total = sum(counts.values())
    # head share: P(0) = log(2)/log(100) ~ 15%
    assert 0.10 < counts[0] / total < 0.20
    # monotone-ish decay across decades: k=0 >> k=9 >> k=90
    assert counts[0] > 3 * counts.get(9, 0) > 3 * counts.get(90, 0)
    # determinism: same seed, same histogram
    df2 = spark.range(0, 50_000).select(
        mod._zipf(mod._unif(F.col("id"), seed=7), n).alias("k")
    )
    counts2 = {r["k"]: r["cnt"] for r in
               df2.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert counts == counts2
