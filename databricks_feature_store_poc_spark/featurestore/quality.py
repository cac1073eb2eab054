"""Data-quality expectations: the validation gate before a feature table
publishes.

The reference POC's pipeline trusts its inputs (the notebooks load CSVs
and write tables straight through, /root/reference/notebooks/
01_feature_engineering.py); a production feature store runs declared
expectations first and refuses to publish on failure. This module is that
gate: declarative checks evaluated as ONE Spark plan per table scan,
reported as a relation (check_name, metric, passed) so the results
themselves are queryable/joinable/storable.

Scale: every per-table check family (PK uniqueness + null counts + value
ranges) folds into a single aggregate over one scan — adding a check adds
a column to the aggregate, not a pass over the data. Referential checks
are left-anti joins that broadcast the dimension side when small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


@dataclass(frozen=True)
class Expectation:
    """One named check: `violations` counts offending rows (0 = pass)."""

    name: str
    violations: Column


def check_table(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations on `df` in ONE aggregate pass.

    Returns (check_name, metric, passed) — metric is the violation count
    as DOUBLE, passed is metric == 0. stack() pivots the single aggregate
    row into one row per check without a second scan.
    """
    agg = df.agg(
        *[e.violations.cast("double").alias(e.name) for e in expectations]
    )
    n = len(expectations)
    pairs = ", ".join(f"'{e.name}', `{e.name}`" for e in expectations)
    return agg.select(
        F.expr(f"stack({n}, {pairs}) AS (check_name, metric)")
    ).withColumn("passed", F.col("metric") == 0)


def check_referential(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Orphaned-key check as a left-anti join (dim side broadcastable).

    The join condition binds each side's column to its own DataFrame —
    an unqualified F.col(dim_key) would be AMBIGUOUS whenever the fact
    and dim key share a name, which is the common case for real FKs."""
    dim_sel = dim.select(dim_key)
    orphans = fact.join(
        F.broadcast(dim_sel),
        fact[fact_key] == dim_sel[dim_key],
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).cast("double").alias("metric"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )


def null_violations(col: str) -> Column:
    return F.count(F.lit(1)) - F.count(F.col(col))


def duplicate_pk_violations(col: str) -> Column:
    return F.count(F.lit(1)) - F.countDistinct(F.col(col))


@query(
    "dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE) AS metric,
           COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(COUNT(*) - COUNT(o_custkey) AS DOUBLE),
           COUNT(*) - COUNT(o_custkey) = 0
    FROM orders
    UNION ALL
    SELECT 'customer_acctbal_not_null',
           CAST(COUNT(*) - COUNT(c_acctbal) AS DOUBLE),
           COUNT(*) - COUNT(c_acctbal) = 0
    FROM customer
    UNION ALL
    SELECT 'events_value_non_negative',
           CAST(COUNT(*) FILTER (WHERE value < 0) AS DOUBLE),
           COUNT(*) FILTER (WHERE value < 0) = 0
    FROM events
    UNION ALL
    SELECT 'documents_n_chars_consistent',
           CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS DOUBLE),
           COUNT(*) FILTER (WHERE n_chars <> length(text)) = 0
    FROM documents
    UNION ALL
    SELECT 'orders_customer_fk',
           CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_orders_fk',
           CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse's standing expectation suite as one relation:
    PK uniqueness and null/range/consistency checks fold into one
    aggregate per table scan; the two referential checks are anti-joins
    with the dimension side broadcast. All seven results union into a
    single plan — a downstream publisher joins on passed = false to
    block a release."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")

    orders_checks = check_table(
        o,
        [
            Expectation("orders_pk_unique", duplicate_pk_violations("o_orderkey")),
            Expectation("orders_custkey_not_null", null_violations("o_custkey")),
        ],
    )
    customer_checks = check_table(
        c, [Expectation("customer_acctbal_not_null", null_violations("c_acctbal"))]
    )
    events_checks = check_table(
        e,
        [
            Expectation(
                "events_value_non_negative",
                F.count(F.when(F.col("value") < 0, 1)),
            )
        ],
    )
    documents_checks = check_table(
        d,
        [
            Expectation(
                "documents_n_chars_consistent",
                F.count(F.when(F.col("n_chars") != F.length("text"), 1)),
            )
        ],
    )
    fk1 = check_referential(o, "o_custkey", c, "c_custkey", "orders_customer_fk")
    fk2 = check_referential(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey",
                            "lineitem_orders_fk")
    return (
        orders_checks.unionByName(customer_checks)
        .unionByName(events_checks)
        .unionByName(documents_checks)
        .unionByName(fk1)
        .unionByName(fk2)
    )


@query(
    "feature_drift_chi2",
    oracle="""
    WITH b AS (
        SELECT event_type,
               least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket,
               ts >= TIMESTAMP '2024-01-16 00:00:00' AS is_cur
        FROM events
    ),
    agg AS (
        SELECT event_type, bucket,
               CAST(COUNT(*) FILTER (WHERE NOT is_cur) AS BIGINT) AS r_cnt,
               CAST(COUNT(*) FILTER (WHERE is_cur) AS BIGINT) AS c_cnt
        FROM b GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(r_cnt) AS BIGINT) AS n_ref,
               CAST(SUM(c_cnt) AS BIGINT) AS n_cur
        FROM agg GROUP BY 1
    ),
    terms AS (
        SELECT a.event_type, a.c_cnt,
               CAST(a.r_cnt * t.n_cur AS DOUBLE) / t.n_ref AS e
        FROM agg a JOIN tot t USING (event_type)
        WHERE a.r_cnt > 0 AND t.n_cur > 0
    )
    SELECT event_type,
           CAST(SUM(CAST(round((c_cnt - e) * (c_cnt - e) / e, 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM terms
    GROUP BY event_type
    """,
)
def feature_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: chi-square statistic of each event
    type's value distribution (10 fixed-width buckets) in the current
    half of the time range against the reference half — the check that
    catches train/serve skew before a stale feature table poisons a
    model. Large chi2 => the feature's distribution moved.

    Cross-engine exactness: expected counts are integer-product ratios
    (r*n_cur as DOUBLE / n_ref — identical bits on both engines), each
    bucket's term is plain IEEE arithmetic on those, and terms are
    rounded then summed in DECIMAL so partial-agg order cannot flip the
    result. Buckets absent from the reference window are excluded (their
    expectation is zero — chi-square is undefined there; a production
    monitor would alert on new-bucket appearance separately), as are
    types with an empty current window (0/0 terms).

    Scale: two grouped counts and a broadcastable per-type total — every
    shuffle is on (event_type, bucket) or event_type; no window, no sort.
    """
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias("bucket"),
        (F.col("ts") >= "2024-01-16").alias("is_cur"),
    )
    agg = b.groupBy("event_type", "bucket").agg(
        F.count(F.when(~F.col("is_cur"), 1)).alias("r_cnt"),
        F.count(F.when(F.col("is_cur"), 1)).alias("c_cnt"),
    )
    tot = agg.groupBy("event_type").agg(
        F.sum("r_cnt").alias("n_ref"), F.sum("c_cnt").alias("n_cur")
    )
    terms = (
        agg.join(F.broadcast(tot), "event_type")
        .filter((F.col("r_cnt") > 0) & (F.col("n_cur") > 0))
        .withColumn("e", F.expr("CAST(r_cnt * n_cur AS DOUBLE) / n_ref"))
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum(
                F.expr("CAST(round((c_cnt - e) * (c_cnt - e) / e, 6) AS DECIMAL(18,6))")
            ).cast("double").alias("chi2"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


@query(
    "dq_outlier_zscore",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS sx,
               SUM(CAST(value AS DECIMAL(18,2))
                   * CAST(value AS DECIMAL(18,2))) AS sxx
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
             / nullif(sqrt((CAST(m.sxx AS DOUBLE)
                       - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)
                         / CAST(m.n AS DOUBLE)) / CAST(m.n AS DOUBLE)), 0) AS z,
           abs((e.value - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
             / nullif(sqrt((CAST(m.sxx AS DOUBLE)
                       - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)
                         / CAST(m.n AS DOUBLE)) / CAST(m.n AS DOUBLE)), 0)) > 3
               AS is_outlier
    FROM events e JOIN m ON e.event_type = m.event_type
    """,
)
def dq_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flagging over the event stream — the
    distribution-level data-quality gate next to dq_expectations' row-
    level rules: every event scored against its type's population mean
    and stddev, |z| > 3 flagged.

    Scale shape: ONE map-side-combined pass computes each type's exact-
    decimal moment sums (n, Σx, Σx²); the per-type stats relation is
    dimension-sized so Catalyst broadcasts it back into the event scan and
    the z computation is map-only — the fact stream is never shuffled.
    Determinism: moments accumulate in DECIMAL (partition-order free) and
    mean/stddev/z derive from them in one fixed double formula written
    identically in the oracle (population stddev, same operation order),
    so both engines produce bit-equal z — same convention as
    agg_corr_covar.
    """
    e = load_table(spark, sf_dir, "events")
    x = "CAST(value AS DECIMAL(18,2))"
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(x)).alias("sx"),
        F.sum(F.expr(f"{x} * {x}")).alias("sxx"),
    )
    nd, sxd, sxxd = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sxx AS DOUBLE)"
    # nullif guard: a degenerate group (one event, or constant values) has
    # stddev 0 — Spark's non-ANSI divide already yields NULL there but
    # DuckDB's IEEE divide yields Inf/NaN; nullif on BOTH engines pins the
    # contract to NULL z / NULL is_outlier for such groups.
    z = (
        f"(value - {sxd} / {nd})"
        f" / nullif(sqrt(({sxxd} - {sxd} * {sxd} / {nd}) / {nd}), 0)"
    )
    return (
        e.select("event_id", "event_type", "value")
        .join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.expr(z).alias("z"),
            (F.abs(F.expr(z)) > 3).alias("is_outlier"),
        )
    )


def _leading_digit_cases(cents: str) -> str:
    """First significant digit of a positive BIGINT via a CASE ladder —
    pure integer arithmetic, identical in Spark and DuckDB (no log10 /
    string formatting, both of which differ cross-engine at edges)."""
    cases = " ".join(
        f"WHEN {cents} >= {10 ** k} THEN CAST({cents} DIV {10 ** (k)} AS INT)"
        for k in range(17, 0, -1)
    )
    return f"(CASE {cases} ELSE CAST({cents} AS INT) END)"


@query(
    "dq_benford_digits",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders WHERE o_totalprice > 0
    ),
    d AS (SELECT {_leading_digit_cases("c").replace(" DIV ", " // ")} AS digit
          FROM cents)
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           count(*) * 1.0 / (SELECT count(*) FROM d) AS pct
    FROM d GROUP BY digit ORDER BY digit
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen: leading-digit distribution of order totals —
    the classic fraud/synthetic-data smell test (real multiplicative
    amounts lean toward low leading digits; fabricated ones look
    uniform). Digit extraction is a pure integer CASE ladder over
    BIGINT cents, so the checked distribution is bit-identical across
    engines; pct is one int/int double division (IEEE-stable).
    Map-only + one 9-row aggregate — scan speed at any size.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = o.select(
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("c")
    )
    d = cents.select(F.expr(_leading_digit_cases("c")).alias("digit"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n") * 1.0 / F.col("n_total")).alias("pct"),
        )
        .orderBy("digit")
    )


@query(
    "dq_outlier_mad",
    oracle="""
    WITH c AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT event_type,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS med
        FROM c GROUP BY event_type
    ),
    mad AS (
        SELECT c.event_type,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(c.cents - m.med))
                    AS BIGINT) AS mad
        FROM c JOIN med m ON c.event_type = m.event_type
        GROUP BY c.event_type
    )
    SELECT c.event_id, c.event_type, c.cents,
           (CAST(c.cents - m.med AS DOUBLE) * 0.6745)
               / nullif(CAST(d.mad AS DOUBLE), 0) AS modified_z,
           abs((CAST(c.cents - m.med AS DOUBLE) * 0.6745)
               / nullif(CAST(d.mad AS DOUBLE), 0)) > 3.5 AS is_outlier
    FROM c JOIN med m ON c.event_type = m.event_type
           JOIN mad d ON c.event_type = d.event_type
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring via the modified z-score
    (0.6745 * (x - median) / MAD, flag at |mz| > 3.5 — the Iglewicz-
    Hoaglin rule): the median/MAD pair shrugs off the very outliers
    that inflate ``dq_outlier_zscore``'s mean/stddev, so a heavy-tailed
    feed doesn't mask its own anomalies.

    Exactness: both the median and the MAD are PERCENTILE_DISC over
    BIGINT cents — actual data values, no interpolation — so the only
    floats are one multiply and one divide of exact integers, written
    in the same order on both engines. Plan: two grouped percentile
    passes (groupBy event_type; the second over |rows| re-joined
    against the 5-row median table, AQE-broadcast), then a map-side
    score join — all shuffles on event_type.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_id", "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    med = c.groupBy("event_type").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
        .alias("med")
    )
    mad = (
        c.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(percentile_disc(0.5)"
                " WITHIN GROUP (ORDER BY abs(cents - med)) AS BIGINT)"
            ).alias("mad")
        )
    )
    mz = (F.col("cents") - F.col("med")).cast("double") * F.lit(0.6745) / F.expr(
        "nullif(CAST(mad AS DOUBLE), 0)"
    )
    return (
        c.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_id", "event_type", "cents",
            mz.alias("modified_z"),
            (F.abs(mz) > 3.5).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audits (r12 — born from the dup-PK/dangling-FK
# replica axis). The reference trusts its inputs' key integrity (the
# feature-table PK contract is asserted at create_feature_table time,
# /root/reference/notebooks/01_feature_engineering.py); a 100 TB ingest
# needs the AUDIT form first: report violations as a relation instead of
# refusing to publish, so the repair/quarantine step can be driven by
# data.
# ---------------------------------------------------------------------------

_PK_KEYED = (
    ("customer", "c_custkey"),
    ("orders", "o_orderkey"),
    # composite (l_orderkey, l_linenumber) encoded into one BIGINT —
    # linenumber is 1..7, so *8 is collision-free within the table
    ("lineitem", "l_orderkey * 8 + l_linenumber"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


@query(
    "dq_pk_violations",
    oracle="""
    WITH k AS (
        SELECT 'customer' AS tbl, c_custkey AS key FROM customer
        UNION ALL SELECT 'orders', o_orderkey FROM orders
        UNION ALL SELECT 'lineitem', l_orderkey * 8 + l_linenumber
        FROM lineitem
        UNION ALL SELECT 'events', event_id FROM events
        UNION ALL SELECT 'documents', doc_id FROM documents
        UNION ALL SELECT 'embeddings', vec_id FROM embeddings
    ),
    g AS (SELECT tbl, key, CAST(COUNT(*) AS BIGINT) AS m
          FROM k GROUP BY tbl, key)
    SELECT tbl,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_keys,
           CAST(SUM(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT)
               AS n_rows_in_violation,
           CAST(MAX(m) AS BIGINT) AS max_multiplicity
    FROM g GROUP BY tbl
    """,
)
def dq_pk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every keyed table: per table,
    the distinct-key count, how many keys are duplicated, how many rows
    sit inside a violating key group, and the worst multiplicity. This
    is the report the r12 dup replica makes non-trivial — and the
    operator an ingest pipeline runs BEFORE ``create_table`` enforces
    the PK contract (tier-1 S5), so violations become a repair worklist
    instead of a publish failure.

    lineitem's composite (l_orderkey, l_linenumber) PK is folded into
    one BIGINT (*8 + linenumber — linenumber <= 7); NULL keys form
    their own group on both engines (GROUP BY keeps NULL), so a
    NULL-key table shows up as one group with its multiplicity rather
    than disappearing.

    Scale: one union of key projections (column-pruned scans — only the
    key columns are read), one map-side-combined shuffle on (tbl, key)
    whose output is one row per distinct key, then a |tables|-row final
    aggregate. Linear, no joins; the same shape at any corpus size, and
    per-table skew is bounded because the first aggregate's key space
    IS the PK space.
    """
    from functools import reduce

    parts = [
        load_table(spark, sf_dir, tbl).select(
            F.lit(tbl).alias("tbl"), F.expr(key_expr).alias("key")
        )
        for tbl, key_expr in _PK_KEYED
    ]
    k = reduce(lambda a, b: a.unionByName(b), parts)
    g = k.groupBy("tbl", "key").agg(F.count(F.lit(1)).alias("m"))
    return g.groupBy("tbl").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("m") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_keys"),
        F.sum(F.when(F.col("m") > 1, F.col("m")).otherwise(0)).cast("long")
        .alias("n_rows_in_violation"),
        F.max("m").cast("long").alias("max_multiplicity"),
    )


_FK_EDGES = (
    # (fk label, fact view, fk column, dim view, dim key)
    ("orders.o_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


@query(
    "dq_fk_orphans",
    oracle="""
    -- POSITIVE membership in the inner projection, negated OUTSIDE on
    -- the boolean: 'NOT (fk IN (...))' as one expression forces
    -- Spark's null-aware existence join, a BroadcastNestedLoopJoin —
    -- O(fact x dim) comparisons that hung the 10x skew replica. The
    -- dim subquery filters NULL keys so three-valued IN degenerates to
    -- two-valued on both engines and the positive form plans as a hash
    -- ExistenceJoin.
    SELECT 'orders.o_custkey' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_fk,
           CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND NOT member
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           CAST(COUNT(DISTINCT CASE WHEN o_custkey IS NOT NULL
                    AND NOT member THEN o_custkey END) AS BIGINT)
               AS n_orphan_keys
    FROM (SELECT o_custkey,
                 o_custkey IN (SELECT c_custkey FROM customer
                               WHERE c_custkey IS NOT NULL) AS member
          FROM orders)
    UNION ALL
    SELECT 'lineitem.l_orderkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND NOT member
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                    AND NOT member THEN l_orderkey END) AS BIGINT)
    FROM (SELECT l_orderkey,
                 l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderkey IS NOT NULL) AS member
          FROM lineitem)
    UNION ALL
    SELECT 'lineitem.l_suppkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN l_suppkey IS NOT NULL AND NOT member
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN l_suppkey IS NOT NULL
                    AND NOT member THEN l_suppkey END) AS BIGINT)
    FROM (SELECT l_suppkey,
                 l_suppkey IN (SELECT s_suppkey FROM supplier
                               WHERE s_suppkey IS NOT NULL) AS member
          FROM lineitem)
    """,
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit: per FK edge, total rows, NULL FKs
    (allowed — a NULL FK is "no reference", not an orphan, matching
    SQL IN semantics), dangling rows whose referenced key does not
    exist, and the distinct orphan key count (the repair worklist
    size). The r12 dup replica's dangling l_orderkey/o_custkey rows
    are exactly what this reports; on clean data every n_orphans is 0.

    Plan shape: the membership test is a POSITIVE IN-subquery in the
    inner projection, negated on the resulting boolean outside — Spark
    plans the positive form as a broadcast hash ExistenceJoin per edge
    (one marker boolean per fact row, NO fan-out even when the dim has
    duplicate keys — same construction as [pipeline_gdpr_delete]),
    while `NOT (fk IN ...)` as ONE expression demands null-aware
    semantics and degenerates to a BroadcastNestedLoopJoin —
    O(fact x dim) comparisons, which HUNG the 10x dup x zipf replica
    (the first draft shipped that way; the combined-axis gate caught
    it). The dim subquery filters NULL keys (a NULL PK is not a
    referenceable key), which is also what collapses three-valued IN
    to two-valued so both engines agree exactly. Each audit collapses
    in one conditional aggregate over one fact scan. At 100 TB: dim
    key sets broadcast (or AQE falls back to a shuffled existence join
    past the threshold); the fact side is never shuffled at fact
    width, never fanned out; COUNT(DISTINCT) costs one exchange whose
    rows are the partial-deduped FK VALUES (bounded by the dim's key
    space, not the fact's row count).
    """
    for t in ("customer", "supplier", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__ri_{t}")

    def edge_sql(label, fact, fk, dim, dk) -> str:
        orphan = f"{fk} IS NOT NULL AND NOT member"
        return f"""
        SELECT '{label}' AS fk,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_fk,
               CAST(SUM(CASE WHEN {orphan} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_orphans,
               CAST(COUNT(DISTINCT CASE WHEN {orphan} THEN {fk} END)
                    AS BIGINT) AS n_orphan_keys
        FROM (SELECT {fk},
                     {fk} IN (SELECT {dk} FROM __ri_{dim}
                              WHERE {dk} IS NOT NULL) AS member
              FROM __ri_{fact})
        """

    from functools import reduce

    branches = [
        spark.sql(edge_sql(label, fact, fk, dim, dk))
        for label, fact, fk, dim, dk in _FK_EDGES
    ]
    return reduce(lambda a, b: a.unionByName(b), branches)


# ANALYZE-style per-column profile of orders: the statistics a
# cost-based optimizer actually consumes (row count, null count, exact
# NDV per column). All counts -> all BIGINT -> hash-adjudicable with no
# value-formatting risk (min/max of mixed types would need lossy
# VARCHAR casts; the approximate/HLL variant for >>column-count scans
# already exists as agg_approx_distinct / agg_hll_sketch).
_ANALYZE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
)


@query(
    "analyze_table_stats",
    oracle=f"""
    {" UNION ALL ".join(
        "SELECT '" + c + "' AS col, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(" + c + ") AS BIGINT) AS n_nonnull, "
        "CAST(count(DISTINCT " + c + ") AS BIGINT) AS n_distinct "
        "FROM orders"
        for c in _ANALYZE_COLS
    )}
    """,
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS, as a query: one
    row per column of orders with (n_rows, n_nonnull, exact n_distinct)
    — the statistics triple a cost-based optimizer feeds on (join
    reordering, broadcast decisions, NDV-based agg strategies). The
    reference platform runs this implicitly inside its managed Delta
    layer; here it is a first-class, oracle-checked operator.

    Exactness: counts only — BIGINT end to end, no min/max VARCHAR
    casts whose engine-specific float formatting could hash-mismatch.

    Scale shape: ONE SELECT with len(_ANALYZE_COLS) (= 6)
    count(distinct) aggregates — Spark
    plans multi-distinct via a single Expand (rows x (n_cols+1)) into
    one partial-aggregated shuffle, i.e. one scan of the table and
    map-side combine on every path; column pruning keeps the scan to
    exactly the profiled columns. At extreme widths (hundreds of
    columns) the HLL twin (agg_approx_distinct) bounds the expand
    blow-up; the exact pass is the adjudicable contract."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.count(c).cast("long").alias(f"nn_{c}")
            for c in _ANALYZE_COLS
        ],
        *[
            F.countDistinct(c).cast("long").alias(f"nd_{c}")
            for c in _ANALYZE_COLS
        ],
    )
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _ANALYZE_COLS
    )
    return row.selectExpr(
        f"stack({len(_ANALYZE_COLS)}, {stack}) AS (col, n_nonnull, n_distinct)",
        "n_rows",
    ).select("col", "n_rows", "n_nonnull", "n_distinct")
