"""Composed analytics queries (TPC-H shapes) over the test warehouse.

The operator suite (operators/relational.py) proves each relational piece
in isolation; these four queries prove the pieces COMPOSE into the
classic multi-operator analytics shapes — pricing summary (Q1),
shipping-priority top-k (Q3), local-supplier volume star join (Q5), and
forecast-revenue filter-aggregate (Q6) — adapted to the columns the test
schema actually has.

Cross-engine determinism: every money aggregate follows the repo's
DECIMAL convention — factors are cast to exact decimals sized so product
chains stay within DECIMAL(38) on both engines (ext DECIMAL(12,2),
discount/tax DECIMAL(4,2); ext*(1-disc) is DECIMAL(18,4), *(1+tax)
DECIMAL(24,6)), accumulated exactly, and cast to DOUBLE only at the end,
so partial-aggregation order can never flip a bit. Averages divide the
exact decimal sum by the count in DOUBLE.

Scale notes: Q1/Q6 are scan + partial-agg (map-side combine, one
shuffle); Q3/Q5 shuffle the fact tables only on their join keys while
every dimension side (customer/supplier/nation/region) carries an
explicit broadcast hint; Q3's top-10 is a TakeOrderedAndProject over a
deterministic (revenue, orderkey) order, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

# Exact-decimal money factors (see module docstring for the widths).
_EXT = "CAST(l_extendedprice AS DECIMAL(12,2))"
_ONE_MINUS_DISC = "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
_ONE_PLUS_TAX = "(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"
_DISC_PRICE = f"{_EXT} * {_ONE_MINUS_DISC}"
_CHARGE = f"{_DISC_PRICE} * {_ONE_PLUS_TAX}"


def _dd(expr: str) -> str:
    """DuckDB DECIMAL -> DOUBLE with CORRECT rounding, via VARCHAR.

    DuckDB's direct decimal->double cast computes
    double(unscaled)/double(10^scale) — two roundings — so once the
    unscaled aggregate exceeds 2^53 the result can land 1 ulp away
    from the correctly-rounded value the JVM's BigDecimal.doubleValue
    produces (found by the r8 10x-replica oracle run: tpch_q1's
    sum_charge at ~5.1e16 unscaled differed in the last ulp; below
    2^53 the two agree bit-for-bit, which is why every driver SF was
    and stays identical). decimal->VARCHAR is exact and
    VARCHAR->DOUBLE is a correctly-rounded strtod on both engines, so
    this pins the oracle to the same bits as Spark at ANY magnitude."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dd("SUM(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty,
           {_dd(f"SUM({_EXT})")} AS sum_base_price,
           {_dd(f"SUM({_DISC_PRICE})")} AS sum_disc_price,
           {_dd(f"SUM({_CHARGE})")} AS sum_charge,
           {_dd("SUM(CAST(l_quantity AS DECIMAL(18,2)))")} / COUNT(*) AS avg_qty,
           {_dd(f"SUM({_EXT})")} / COUNT(*) AS avg_price,
           {_dd("SUM(CAST(l_discount AS DECIMAL(4,2)))")} / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, map-side partial aggregation, one
    shuffle on the 6-group key. The shipdate predicate reaches the
    parquet scan as a pushed filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).cast("double").alias("sum_qty"),
            F.sum(F.expr(_EXT)).cast("double").alias("sum_base_price"),
            F.sum(F.expr(_DISC_PRICE)).cast("double").alias("sum_disc_price"),
            F.sum(F.expr(_CHARGE)).cast("double").alias("sum_charge"),
            (F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.expr(_EXT)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.expr("CAST(l_discount AS DECIMAL(4,2))")).cast("double")
             / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: the BUILDING-segment customer keys broadcast
    into orders, the surviving orders shuffle-join lineitem on orderkey
    (the only fact-fact shuffle), then top-10 by revenue with orderkey as
    the deterministic tiebreak (revenue itself is bit-identical
    cross-engine because it is an exact-decimal sum)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND c_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: the full star — every dimension side
    (customer, supplier, nation, region) broadcast; the only shuffle
    joins the two fact tables (orders, lineitem) on orderkey; the
    same-nation constraint (c_nationkey = s_nationkey) is applied as a
    post-join filter exactly as written."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(CAST(SUM({_EXT} * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.03 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(25 AS DOUBLE)
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: pure filter + global aggregate — all three
    predicates push to the parquet scan, the sum is an exact-decimal
    partial aggregate, and the single output row needs no shuffle beyond
    the final 1-partition combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.sum(F.expr(f"{_EXT} * CAST(l_discount AS DECIMAL(4,2))"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "feature_sessionize",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts) NULLS FIRST, event_id NULLS FIRST,
                              event_type NULLS FIRST, value NULLS FIRST)
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts) NULLS FIRST,
                                          event_id NULLS FIRST,
                                          event_type NULLS FIRST,
                                          value NULLS FIRST,
                                          new_s DESC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM g
    """,
)
def feature_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: events more than 30 minutes apart start a new
    session; session_id is the running count of session starts per user.
    The batch twin of streaming/windows.py's session_window query — same
    gap semantics, but every event keeps its session label (the shape
    feature pipelines want for per-session aggregation).

    One shuffle: the gap flag (lag) and the running sum share the same
    user_id partitioning, so one Exchange feeds both Window nodes. The
    ordering carries event_id + the payload columns as tiebreaks so
    concurrent events sessionize identically on both engines — and the
    running sum's order ends with the MATERIALIZED flag itself,
    new_s DESC: the flag+sum are two window passes, and for rows that
    are FULLY identical (dup-PK triplicates, r12 dup x zipf) the second
    pass's re-sort may otherwise pair the session-start flag with a
    different copy per engine, assigning the tied copies sessions
    {s, s+1} on one engine and {s+1, s+1} on the other. Flag-first is
    total over (row, new_s), so both tied copies land in the started
    session deterministically.
    """
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        us, F.col("event_id"), F.col("event_type"), F.col("value")
    )
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    g = e.select(
        "event_id", "user_id", "ts", "event_type", "value",
        new_s.alias("new_s"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy(
            F.unix_micros(F.col("ts")), F.col("event_id"),
            F.col("event_type"), F.col("value"), F.desc("new_s"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "event_id", "user_id", "ts",
        F.sum("new_s").over(run).cast("long").alias("session_id"),
    )


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH s AS (
        SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS first_purchase_us
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.signup_us
        GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_us,
           p.first_purchase_us IS NOT NULL AS converted,
           CAST((p.first_purchase_us - s.signup_us) // 1000000 AS BIGINT)
               AS secs_to_convert
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: per user, the first signup and the first purchase
    strictly after it — conversion flag plus seconds-to-convert
    (NULL for non-converters on both engines).

    Shape: two filtered aggregates on the same scan key (user_id) and a
    per-user left join — every shuffle is on user_id, so at scale the
    three stages co-partition and AQE coalesces them; integer microsecond
    arithmetic end-to-end, so no float crosses engines.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("signup_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(us > F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min(us).alias("first_purchase_us"))
    )
    return (
        s.join(p, "user_id", "left")
        .select(
            "user_id", "signup_us",
            F.col("first_purchase_us").isNotNull().alias("converted"),
            F.expr("(first_purchase_us - signup_us) div 1000000")
            .cast("long").alias("secs_to_convert"),
        )
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > (SELECT n FROM t) // 500
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (frequency > n/500) over (user_id, event_type) via
    sketch-then-verify — the two-pass shape that finds hot keys at 100 TB
    without shuffling the full distinct-key set:

    1. Each Arrow batch runs a Misra-Gries summary of capacity 500. The
       MG bound (residual >= batch_count - batch_n/500, summed over
       batches) guarantees every true heavy hitter survives in at least
       one summary, so the union of summary keys is a SUPERSET of the
       answer, with size <= 500 x batches regardless of key cardinality.
    2. Candidates (tiny) broadcast back over the raw scan for EXACT
       counts; the final filter keeps count > n/500.

    Because step 2 is exact and step 1 is a guaranteed superset, the
    output equals the plain GROUP BY ... HAVING oracle bit-for-bit —
    sketching costs no correctness here, only the false-positive
    verification work, which is bounded by the summary size.

    NULL-key contract (r11): SQL GROUP BY keeps NULL as a group, so the
    sketch must too — the MG kernel carries NULL user_id/event_type as a
    real key (a NULL-heavy corpus makes the NULL group a true heavy
    hitter) and the verify join is NULL-SAFE (<=>); plain equality would
    silently drop the NULL-key candidates the oracle counts.
    """
    import pyspark.sql.types as T

    CAP = 500
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")

    def mg_batches(batches):
        import pandas as pd

        for pdf in batches:
            counts: dict = {}
            for u, t in zip(pdf["user_id"], pdf["event_type"]):
                k = (
                    None if pd.isna(u) else int(u),
                    None if t is None else t,
                )
                if k in counts:
                    counts[k] += 1
                elif len(counts) < CAP:
                    counts[k] = 1
                else:  # decrement-all step of Misra-Gries
                    dead = []
                    for kk in counts:
                        counts[kk] -= 1
                        if counts[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counts[kk]
            yield pd.DataFrame(
                {
                    "user_id": pd.array(
                        [k[0] for k in counts], dtype="Int64"
                    ),
                    "event_type": [k[1] for k in counts],
                }
            )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    candidates = e.mapInPandas(mg_batches, schema).distinct()
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        e.alias("e")
        .join(
            F.broadcast(candidates.alias("c")),
            F.expr(
                "e.user_id <=> c.user_id AND e.event_type <=> c.event_type"
            ),
        )
        .groupBy(F.col("e.user_id"), F.col("e.event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.expr("n div 500"))
        .select("user_id", "event_type", "cnt")
    )


@query(
    "agg_latency_bands",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def agg_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile bands per (event_type, day) — the SLO/observability
    rollup shape (p50/p95/p99 of a measure per entity per time bucket).
    Spark's exact `percentile` uses the same linear-interpolation
    definition as DuckDB's quantile_cont, so the bands hash-match with no
    rounding. One shuffle on the composite group key; at unbounded
    per-group cardinality the approx_percentile twin (agg_approx_percentile)
    is the scale path — this is the exact rollup for bounded groups."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.expr("percentile(value, 0.50)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
           c_acctbal
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by revenue lost to
    returns in a half-year window. Dimension sides (customer+nation)
    broadcast; the one fact-fact shuffle joins date-filtered orders to
    return-flagged lineitem on orderkey; the top-20 is a fused
    TakeOrderedAndProject over (revenue desc, custkey) — revenue is an
    exact-decimal sum, so the cut is engine-independent."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cn), o["o_custkey"] == cn["c_custkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose summed line quantity
    exceeds 150, with their customers, largest orders first. The
    qualifying-orderkey set is computed ONCE (grouped aggregate with a
    HAVING filter) and semi-joined back into lineitem — at scale that
    aggregate's output is tiny relative to lineitem, so Catalyst
    broadcasts it and the main pass stays a single orderkey shuffle.
    The customer join is deliberately NOT broadcast-hinted: customer is
    fact-scale (15M rows at sf100, far larger at 100 TB) and a forced
    broadcast there OOMs executors — AQE/statistics pick broadcast at
    small SF and shuffle-hash at scale on their own. Quantity sums
    accumulate in DECIMAL; ordering ties break on o_orderkey."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("qual_orderkey"))
    )
    return (
        li.join(F.broadcast(qualifying), li["l_orderkey"] == F.col("qual_orderkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))"))
            .cast("double").alias("total_qty")
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "agg_corr_covar",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(9,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(9,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(9,2))
                   * CAST(l_quantity AS DECIMAL(9,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covar_pop,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0)
               AS corr_qty_price
    FROM m
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance between quantity and price per return flag
    — the feature-engineering moment statistics (drift detection, feature
    redundancy pruning) computed the way they must be at 100 TB.

    Built-in corr()/covar_pop() accumulate DOUBLE partial sums whose value
    depends on partition merge order — fine statistically, but not
    reproducible bit-for-bit across runs or engines. Instead the five
    moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in EXACT decimals
    (inputs are 2-decimal data; widths keep every product ≤ DECIMAL(38)),
    and the closed-form combination happens once per group in a fixed
    scalar expression — deterministic on any partitioning, identical in
    DuckDB, and still one map-side-combined shuffle. The same moment-sum
    shape is what a streaming/distributed variance sketch maintains.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = "CAST(l_quantity AS DECIMAL(9,2))"
    y = "CAST(l_extendedprice AS DECIMAL(12,2))"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(x)).alias("sx"),
        F.sum(F.expr(y)).alias("sy"),
        F.sum(F.expr(f"{x} * {y}")).alias("sxy"),
        F.sum(F.expr(f"{x} * {x}")).alias("sxx"),
        F.sum(F.expr(f"{y} * {y}")).alias("syy"),
    )
    nd = "CAST(n AS DOUBLE)"
    sxd, syd = "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    sxyd, sxxd, syyd = (
        "CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)"
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr(f"({sxyd} - {sxd} * {syd} / {nd}) / {nd}").alias("covar_pop"),
        # nullif: a constant-x or constant-y group has zero variance —
        # Spark's non-ANSI divide yields NULL, DuckDB's IEEE divide
        # yields NaN/Inf; guarding both engines pins corr to NULL there.
        F.expr(
            f"({nd} * {sxyd} - {sxd} * {syd})"
            f" / nullif(sqrt(({nd} * {sxxd} - {sxd} * {sxd})"
            f"        * ({nd} * {syyd} - {syd} * {syd})), 0)"
        ).alias("corr_qty_price"),
    )


@query(
    "win_retention_cohorts",
    oracle="""
    WITH wk AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    firsts AS (
        SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, w.wk) // 7 AS BIGINT)
               AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM wk w JOIN firsts f ON w.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the engagement report every product
    warehouse runs: users grouped by the week of their FIRST event
    (cohort), counted in every subsequent week they were active
    (offset), yielding (cohort_week, week_offset, n_users).

    Shape at 100 TB: the distinct (user, week) activity grid and the
    per-user first-week aggregate BOTH shuffle on user_id, so the
    self-join that tags each active week with its user's cohort is
    co-partitioned (AQE reuses the exchange; no broadcast needed — the
    firsts side is |users|-sized, which at scale is itself huge). The
    final matrix aggregate collapses to |cohorts| x |offsets| rows —
    tiny regardless of corpus. Week arithmetic is pure integer
    (Monday-truncated dates, day-diff div 7), so no float crosses
    engines; both engines truncate weeks to Monday (ISO).
    """
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        wk.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7")
            .cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "win_session_paths",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts) NULLS FIRST, event_id NULLS FIRST,
                              event_type NULLS FIRST)
    ),
    s AS (
        SELECT event_id, user_id, ts, event_type,
               CAST(SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts) NULLS FIRST,
                                              event_id NULLS FIRST,
                                              event_type NULLS FIRST,
                                              new_s DESC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM g
    ),
    tri AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER w2
                          || '>' || lead(event_type, 2) OVER w2 AS path,
               lead(event_type, 2) OVER w2 AS t3
        FROM s
        WINDOW w2 AS (PARTITION BY user_id, session_id
                      ORDER BY epoch_us(ts) NULLS FIRST, event_id NULLS FIRST,
                               event_type NULLS FIRST)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM tri WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 15
    """,
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential path mining: the 15 most common within-session
    event-type trigrams — the "what do users do next" behavioral-pattern
    query (and, on a token stream, the n-gram transition-count shape a
    data-quality language model starts from).

    Composition: gap-sessionization (same 30-min rule as
    ``feature_sessionize``) and the trigram `lead`s share one
    (user_id-partitioned, ts-ordered) sort — Catalyst stacks the lag and
    both leads into window nodes over a single Exchange on user_id; the
    trigram COUNT is a partial+final aggregate on strings of bounded
    cardinality (|event_types|^3), and the top-15 is a
    TakeOrderedAndProject with a path tie-break, never a global sort.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    # event_type extends the (ts, event_id) order so it stays total
    # under duplicate PKs (dup replica r12) — the trigram output reads
    # only event_type, so rows still tied are output-identical
    w = Window.partitionBy("user_id").orderBy(
        us, F.col("event_id"), F.col("event_type")
    )
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    # materialize the flag and order the running sum flag-first: for
    # FULLY identical duplicate rows the two window passes may otherwise
    # pair the flag with different copies per engine (see
    # [feature_sessionize], r12 dup x zipf)
    g = e.select(
        "event_id", "user_id", "ts", "event_type", new_s.alias("new_s")
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"),
                 F.col("event_type"), F.desc("new_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = g.select(
        "event_id", "user_id", "ts", "event_type",
        F.sum("new_s").over(run).cast("long").alias("session_id"),
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id"), F.col("event_type")
    )
    t2 = F.lead("event_type", 1).over(w2)
    t3 = F.lead("event_type", 2).over(w2)
    tri = s.select(
        F.concat(F.col("event_type"), F.lit(">"), t2, F.lit(">"), t3)
        .alias("path"),
        t3.alias("t3"),
    )
    return (
        tri.filter(F.col("t3").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(15)
    )


@query(
    "win_first_touch_attribution",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts) NULLS FIRST, event_id NULLS FIRST,
                              event_type NULLS FIRST, value NULLS FIRST)
    ),
    s AS (
        SELECT event_id, user_id, ts, event_type, value,
               CAST(SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts) NULLS FIRST,
                                              event_id NULLS FIRST,
                                              event_type NULLS FIRST,
                                              value NULLS FIRST,
                                              new_s DESC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM g
    ),
    ft AS (
        SELECT event_type, value,
               first_value(event_type) OVER (
                   PARTITION BY user_id, session_id
                   ORDER BY epoch_us(ts) NULLS FIRST, event_id NULLS FIRST,
                            event_type NULLS FIRST, value NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS first_touch
        FROM s
    )
    SELECT first_touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS attributed_cents
    FROM ft WHERE event_type = 'purchase'
    GROUP BY first_touch
    """,
)
def win_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credits the event type
    that OPENED its session — the marketing-attribution aggregate
    (which entry channel drives revenue) and a second composition proof
    for the gap-sessionization primitive.

    Plan: the sessionizing lag/running-sum and the per-session
    first_value all run over user_id-prefixed windows, so ONE Exchange
    on user_id feeds every window node (the (user_id, session_id)
    window reuses the partitioning with a local re-sort, exactly as in
    ``win_session_paths``); revenue is floor(value*100) BIGINT cents
    and the result is |event_types| rows.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    # payload columns extend the order so it stays total under
    # duplicate PKs (dup replica r12) — see [win_lag_lead]
    w = Window.partitionBy("user_id").orderBy(
        us, F.col("event_id"), F.col("event_type"), F.col("value")
    )
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    # flag-first running sum — see [feature_sessionize] (r12 dup x zipf)
    g = e.select(
        "event_id", "user_id", "ts", "event_type", "value",
        new_s.alias("new_s"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"),
                 F.col("event_type"), F.col("value"), F.desc("new_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = g.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.sum("new_s").over(run).cast("long").alias("session_id"),
    )
    w2 = (
        Window.partitionBy("user_id", "session_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"),
                 F.col("event_type"), F.col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ft = s.select(
        "event_type", "value",
        F.first("event_type").over(w2).alias("first_touch"),
    )
    return (
        ft.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("long").alias("attributed_cents"),
        )
    )
