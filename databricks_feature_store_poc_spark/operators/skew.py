"""Skew-mitigation utilities: salted joins for pathological hot keys.

First resort is AQE's skew-join splitting (pinned on in session.py) — it
splits oversized shuffle partitions at runtime with no code change. A
salted join is the manual fallback for the cases AQE can't fix: a single
key so hot that even a split partition's *build side* row group is too
large, or a broadcast-ineligible dimension joined on a power-law key.

Mechanics: the fact side scatters each row into one of ``n_salts``
sub-keys via a deterministic hash of the whole row; the dimension side is
replicated ``n_salts`` times (explode over a literal range — cheap, dims
are small relative to facts). Joining on (key, salt) spreads the hot
key's rows over n_salts reducers. Result is row-identical to the unsalted
join because every fact row still meets every matching dim row exactly
once (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``n_salts`` ways.

    ``how`` supports 'inner' and 'left' (fact-preserving). The dim side
    must be unique on ``on`` — the usual dimension contract — otherwise
    replication would double-count.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_salted = fact.withColumn("__salt", salt)
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_salted.join(dim_salted, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# Oracle-checked query registration (driver correctness gate)
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from databricks_feature_store_poc_spark.registry import query  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402


@query(
    "join_salted_skew",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS hot_key,
               value
        FROM events
    ),
    dim AS (
        SELECT DISTINCT user_id AS hot_key,
               user_id % 7 AS segment
        FROM events
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM fact JOIN dim USING (hot_key)
    GROUP BY segment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join under the correctness gate, on a key made
    pathologically hot on purpose: a third of all events collapse onto
    key 0 (the single-hot-key shape AQE's skew splitting cannot fix when
    one KEY — not one partition — holds the skew). ``salted_join``
    scatters the fact side across 16 salts and replicates the dimension,
    so the hot key's rows spread over 16 reducers; the oracle runs the
    plain unsalted join, hash-verifying the salted plan is
    row-for-row identical — the invariant that makes salting safe to
    drop into any hot-key join.

    Scale: dim replication is n_salts x |dim| (dims are small by
    contract); the fact shuffles once on (key, salt)."""
    e = load_table(spark, sf_dir, "events")
    fact = e.select(
        F.when(F.col("user_id") % 3 == 0, 0)
        .otherwise(F.col("user_id"))
        .alias("hot_key"),
        "value",
    )
    dim = (
        e.select(F.col("user_id").alias("hot_key")).distinct()
        .withColumn("segment", F.col("hot_key") % 7)
    )
    joined = salted_join(fact, dim, on=["hot_key"], n_salts=16)
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
