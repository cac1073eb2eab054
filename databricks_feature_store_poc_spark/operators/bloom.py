"""Probabilistic membership + frequency sketches as pure relational
algebra: Bloom filter and count-min sketch.

The 100 TB join-pruning primitive: build a compact bit-set over the
small side's keys, broadcast it, and pre-filter the huge side before
the real join (Spark's own runtime row-level filtering does exactly
this under AQE; Delta/iceberg persist the same structure per file).
This module implements the filter itself with DataFrame ops so the
mechanics are inspectable and driver-checkable:

- build: k=5 hash positions per key (xxhash64 seeded by slot), explode
  to (word, bit) coordinates, ``bit_or`` aggregate into a ~m/64-row
  bitmap table — one shuffle of |keys| * k tiny rows;
- probe: recompute the k coordinates per probe key, broadcast-join the
  bitmap, a key passes iff all k bits are set.

The sketch bits are engine-specific (xxhash64), so — like
``agg_hll_sketch`` — the checked values are the exact counts plus
deterministic property booleans: zero false negatives (a Bloom filter's
hard guarantee) and a false-positive rate inside the analytic bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

M_BITS = 1 << 17  # floor: 131072 bits => 2048 words
N_HASH = 5
BITS_PER_KEY = 12  # sizing target; fp ~ (1-e^(-k/12))^5 ~ 0.3% at k=5


def bloom_size_bits(n_keys: int) -> int:
    """Next power of two >= BITS_PER_KEY * n (floor M_BITS): keeps kn/m —
    and therefore the analytic fp rate — constant at EVERY scale factor,
    instead of letting a fixed bitmap saturate past sf0.1."""
    m = M_BITS
    while m < n_keys * BITS_PER_KEY:
        m <<= 1
    return m


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = M_BITS) -> DataFrame:
    """(word, bits) bitmap over the distinct values of ``key_col``."""
    coords = keys.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                for i in range(N_HASH)
            ])
        ).alias("pos")
    )
    return (
        coords.select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = M_BITS
) -> DataFrame:
    """Append ``bloom_pass`` to ``probes``: true iff every one of the k
    hash positions is set in the (broadcast) bitmap. ``m_bits`` must
    match the value the bitmap was built with."""
    coords = probes.select(
        key_col,
        F.posexplode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                for i in range(N_HASH)
            ])
        ).alias("slot", "pos"),
    ).select(
        key_col,
        "slot",
        F.expr("pos div 64").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
    )
    hit = coords.join(F.broadcast(bloom), "word", "left").select(
        key_col,
        ((F.col("bits").isNotNull()) & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))).alias("bit_set"),
    )
    return hit.groupBy(key_col).agg(
        (F.count_if(F.col("bit_set")) == N_HASH).alias("bloom_pass")
    )


@query(
    "agg_bloom_filter",
    oracle="""
    WITH members AS (
        SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment =
            (SELECT min(c_mktsegment) FROM customer)
    ),
    probes AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_probes,
           CAST((SELECT count(*) FROM probes JOIN members
                 ON o_custkey = c_custkey) AS BIGINT) AS n_members,
           TRUE AS no_false_negatives,
           TRUE AS fp_rate_ok
    """,
)
def agg_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom filter over one market segment's customers, probe
    every ordering customer through it, and check the two properties
    that define the structure: no member is ever rejected, and the
    false-positive rate stays inside the sizing bound (k=5, m sized at
    {BITS_PER_KEY} bits per build-side key; analytic fp ~
    (1 - e^(-kn/m))^k — well under 1% at ANY scale factor; the 1%
    assertion leaves headroom for hash clustering).

    The member segment is picked as min(c_mktsegment) so the query is
    deterministic at any SF without naming generator-specific values.
    Sizing: m = next power of two >= {BITS_PER_KEY}*n from the build
    side's own count (one cheap job on the SMALL side — the side that
    is broadcastable by construction), so kn/m and the fp band are
    scale-invariant. At 100 TB a 10^9-key filter is still ~1.5 GB of
    bitmap, far under the exact key set.
    """
    c = load_table(spark, sf_dir, "customer")
    seg = c.agg(F.min("c_mktsegment").alias("seg"))
    members = (
        c.join(F.broadcast(seg), c["c_mktsegment"] == F.col("seg"))
        .select(F.col("c_custkey").alias("member_key")).distinct()
    )
    probes = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    m_bits = bloom_size_bits(members.count())
    bloom = bloom_build(members, "member_key", m_bits)
    passed = bloom_probe(probes, "o_custkey", bloom, m_bits)
    truth = passed.join(
        members, passed["o_custkey"] == members["member_key"], "left"
    ).select(
        "o_custkey",
        "bloom_pass",
        F.col("member_key").isNotNull().alias("is_member"),
    )
    return truth.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count_if(F.col("is_member")).alias("n_members"),
        (F.count_if(F.col("is_member") & ~F.col("bloom_pass")) == 0).alias(
            "no_false_negatives"
        ),
        (
            F.count_if(F.col("bloom_pass") & ~F.col("is_member"))
            <= F.greatest(
                (F.count_if(~F.col("is_member")) * 0.01).cast("bigint"), F.lit(1)
            )
        ).alias("fp_rate_ok"),
    )


# --- count-min sketch ------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(rows: DataFrame, key_col: str) -> DataFrame:
    """(row_i, bucket, cnt) counter table: CMS_DEPTH seeded hash rows of
    CMS_WIDTH counters each — one |rows| x depth shuffle, sketch size
    depth x width regardless of input size."""
    coords = rows.select(
        F.posexplode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(100 + i)), F.lit(CMS_WIDTH))
                for i in range(CMS_DEPTH)
            ])
        ).alias("row_i", "bucket")
    )
    return coords.groupBy("row_i", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(keys: DataFrame, key_col: str, cms: DataFrame) -> DataFrame:
    """Append ``est`` to ``keys``: min over the depth counters at the
    key's hash positions (the CMS point estimate; always >= truth)."""
    coords = keys.select(
        key_col,
        F.posexplode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(100 + i)), F.lit(CMS_WIDTH))
                for i in range(CMS_DEPTH)
            ])
        ).alias("row_i", "bucket"),
    )
    hit = coords.join(F.broadcast(cms), ["row_i", "bucket"], "left")
    return hit.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


@query(
    "agg_countmin_sketch",
    oracle=f"""
    WITH freq AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS true_cnt
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, true_cnt,
           TRUE AS never_underestimates,
           TRUE AS within_band
    FROM freq
    ORDER BY true_cnt DESC, o_custkey NULLS FIRST
    LIMIT 10
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch over order counts per customer, checked
    on the top-10 heaviest keys: the estimate may never undercount
    (CMS's hard guarantee — counters only collide upward) and must stay
    within the analytic band est <= true + 2N/width (Markov bound at
    twice the expected collision mass; depth 4 makes exceeding it
    vanishingly unlikely).

    The sketch is {CMS_DEPTH} x {CMS_WIDTH} counters no matter how many
    rows flow in — the fixed-size frequency summary a 100 TB pipeline
    ships between stages instead of a full GROUP BY (same role as the
    HLL sketch for distincts). Build is one narrow shuffle; estimation
    is a broadcast join against the 4 KB counter table.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    cms = cms_build(o, "o_custkey")
    truth = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    n1 = o.agg(F.count(F.lit(1)).alias("n_total"))
    est = cms_estimate(truth.select("o_custkey"), "o_custkey", cms)
    # NULL-key contract (r11): GROUP BY keeps NULL as a group on both
    # engines, so the truth<->estimate join must be NULL-SAFE (<=>) — a
    # NULL-heavy corpus makes the NULL key a true heavy hitter and plain
    # equality silently dropped it from the top-k; NULLS FIRST pins the
    # tie-break ordering with DuckDB.
    top = (
        truth.alias("t")
        .join(
            est.select(
                F.col("o_custkey").alias("e_key"), "est"
            ).alias("s"),
            F.expr("t.o_custkey <=> s.e_key"),
        )
        .crossJoin(F.broadcast(n1))
        .orderBy(F.desc("true_cnt"), F.asc_nulls_first("t.o_custkey"))
        .limit(10)
    )
    return top.select(
        F.col("t.o_custkey").alias("o_custkey"),
        "true_cnt",
        (F.col("est") >= F.col("true_cnt")).alias("never_underestimates"),
        (
            F.col("est")
            <= F.col("true_cnt") + (2 * F.col("n_total")) / CMS_WIDTH
        ).alias("within_band"),
    )
