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


def test_tfidf_audit_witness_is_theorem_bound_not_3x(spark, tmp_path):
    """Pins round 9's skew-gate find: the top-k witness must accept any
    corpus the SCORING itself allows. Here an omitted stopword holds
    tf=4 while the weakest emitted term has tf=1 — the r8 witness's
    empirical 3x cap flags this false, but the theorem bound
    tf_omitted <= tf_emitted * (ln((N+1)/2)+1) (~4.02 at N=40)
    correctly accepts it: 'the' scores 4*idf(1.0)=4.0, just under the
    rare terms' 1*4.0204."""
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.llm import text
    from databricks_feature_store_poc_spark.registry import QUERIES

    rows = [(0, "r1 r2 r3 the the the the")]
    rows += [(i, f"the f{i}a f{i}b") for i in range(1, 40)]
    docs = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("test"))
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    top0 = {
        r["term"]
        for r in text.text_tfidf_topterms(spark, str(tmp_path))
        .filter("doc_id = 0")
        .collect()
    }
    # 'the' (tf=4 > 3x the weakest emitted tf=1) is omitted by score —
    # the exact shape the old 3x constant mislabeled as a ranking bug
    assert top0 == {"r1", "r2", "r3"}

    audit = QUERIES["text_tfidf_audit"](spark, str(tmp_path)).collect()
    assert len(audit) == 40
    bad = [r for r in audit if not (r["tf_is_max"] and r["terms_in_doc"])]
    assert bad == []


def test_interval_overlap_pairs_matches_naive_crossjoin(spark):
    """interval_overlap_pairs lost its registry demonstration when
    join_interval_overlap switched to the rank-decomposition count
    (r9) — this pins the enumeration core directly: canonical-bucket
    dedup must reproduce the literal theta join exactly, for intra-day
    timestamps and for bucket widths both >= and < the interval spans
    (the canonical bucket is the first bucket both intervals cover,
    which holds for ANY width)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.operators.relational import (
        interval_overlap_pairs,
    )

    base = dt.datetime(2020, 1, 1)
    o_rows = [
        (i, base + dt.timedelta(hours=13 * i), base + dt.timedelta(hours=13 * i + (i % 70) * 12 + 5))
        for i in range(40)
    ]
    l_rows = [
        (j, base + dt.timedelta(hours=7 * j + 3), base + dt.timedelta(hours=7 * j + 3 + (j % 40) * 9 + 2))
        for j in range(60)
    ]
    o = spark.createDataFrame(o_rows, "o_id int, o_start timestamp, o_end timestamp")
    li = spark.createDataFrame(l_rows, "l_id int, l_start timestamp, l_end timestamp")
    naive = sorted(
        (r["o_id"], r["l_id"])
        for r in o.crossJoin(li)
        .filter((F.col("o_start") < F.col("l_end")) & (F.col("l_start") < F.col("o_end")))
        .select("o_id", "l_id")
        .collect()
    )
    assert naive  # non-degenerate fixture
    for w_days in (30, 2):  # wider and narrower than the longest span
        got = sorted(
            (r["o_id"], r["l_id"])
            for r in interval_overlap_pairs(o, li, w_days=w_days)
            .select("o_id", "l_id")
            .collect()
        )
        assert got == naive, f"w_days={w_days}"


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
