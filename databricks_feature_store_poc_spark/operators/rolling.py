"""Rolling-window feature computation (SURVEY.md §2 tier 2, M3).

The reference's entire feature content — ``total_purchase_7d`` /
``total_purchase_30d`` (/root/reference/data/customer_features.csv:1) —
arrives pre-computed; the windowing happened upstream of the POC. This
module makes that upstream computation explicit: per-key trailing
time-range sums over the ``events`` stream table.

Scale design: the registered query computes trailing sums by PREFIX
SUBTRACTION — cumulative (unbounded-preceding) sums, which Spark
evaluates incrementally in O(rows), minus the prefix carried forward at
each row's window cutoff — because a bounded sliding RANGE frame is
re-accumulated per row, making the window O(rows-in-frame) PER ROW:
quadratic in per-key density. Measured at a 100x replica (6.7k events
per user inside one 30d frame): the sliding-frame formulation took
360 s where the prefix formulation and the hourly pre-aggregation run
in seconds (scripts/stress_registry_10x_results_100x.json). One shuffle
on the key either way; a single pathologically hot key is further
bounded by pre-aggregating to (user, hour) grain first
(`feature_rolling_hourly`).

Precision: events.ts carries microseconds, so the frame is expressed in
epoch-micros on BOTH engines (a seconds-granularity frame would disagree
with DuckDB's INTERVAL arithmetic on every sub-second boundary). Sums
accumulate in DECIMAL (exact) and cast to DOUBLE at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

_US = 1_000_000
_DAY_US = 86_400 * _US


def rolling_range_sum(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    days: int,
    out_col: str,
) -> DataFrame:
    """Reusable trailing-``days`` sum of ``value_col`` per ``key``.

    This is the engine's generalization of the reference's
    total_purchase_{7,30}d columns: any (key, timestamp, value) relation
    gains a trailing-window feature with one shuffle.

    Density caveat: Spark re-accumulates a bounded sliding RANGE frame
    per row, so this helper costs O(rows-in-frame) PER ROW — fine for
    typical per-key densities, quadratic for hot keys (measured 360 s at
    ~6 700 rows/frame). For dense keys use ``rolling_prefix_sums``
    (O(n), identical values, needs a unique row id) or pre-aggregate to
    (key, hour) grain first (``feature_rolling_hourly``).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-days * _DAY_US, 0)
    )
    return df.withColumn(
        out_col,
        F.sum(F.col(value_col).cast("decimal(18,2)")).over(w).cast("double"),
    )


def rolling_prefix_sums(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    days_list: tuple[int, ...],
) -> DataFrame:
    """Exact trailing-``d``-day sums AND counts per key for every ``d``
    in ``days_list``, in O(n log n) — the dense-key-safe twin of
    ``rolling_range_sum``.

    The identity: with integer-microsecond timestamps,

        sum over [t_i - d, t_i]  ==  prefix(t_i) - prefix(t_i - d - 1µs)

    (closed on BOTH ends — the probe at t_i - d·86400e6 - 1 excludes
    exactly the rows strictly before t_i - d, matching a RANGE frame's
    `d PRECEDING AND CURRENT ROW`). prefix(x) is the tie-inclusive
    cumulative sum at x. Both
    prefixes come from ONE unbounded-preceding RANGE window (Spark
    evaluates those incrementally — no per-row frame re-scan) over the
    union of the anchor rows and one probe row per (row, window) placed
    at t_i - d·86400e6 - 1: the RANGE frame's inclusive upper bound at
    the probe's position is exactly "strictly before the cutoff". The
    regroup to one output row per input row keys on (key, id, anchor_t)
    — already clustered by the window's hash partitioning, so the whole
    operator pays a single shuffle. ``id_col`` is normally unique per
    row, but the regroup no longer ASSUMES it: duplicate (key, id) rows
    at DIFFERENT timestamps split by the anchor-timestamp regroup key,
    and duplicates at the SAME timestamp — whose outputs are identical
    anyway, because RANGE prefixes are tie-inclusive — are counted and
    re-exploded to their input multiplicity (r12 dup replica; a
    row_number disambiguator would cost an extra pre-union window pass
    = one planned sort per union branch, which the plan-scan gate
    rejects). Sums accumulate in DECIMAL, so the subtraction is exact.

    NULL semantics match the sliding RANGE frame's SUM exactly: a
    window whose in-frame values are all NULL yields a NULL sum (not
    0.0 from ``cum - cum``) — a separate non-NULL-value count prefix
    detects that case. ``n_<d>d`` keeps counting ROWS in the frame
    (``COUNT(*)`` semantics), NULL values included.
    """
    ts_type = df.schema[ts_col].dataType.simpleString()
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(value_col).cast("decimal(18,2)").alias("__v"),
        F.col(ts_col).alias("__ts"),
    )
    # __at: the row's ANCHOR timestamp, carried verbatim on probes too —
    # the regroup key that keeps duplicate (key, id) rows at different
    # timestamps apart without a pre-union row_number window
    u = base.select(
        "*", F.col("__t").alias("__at"), F.lit("a").alias("__kind")
    )
    for d in days_list:
        u = u.unionByName(
            base.select(
                "__k",
                "__id",
                (F.col("__t") - d * _DAY_US - 1).alias("__t"),
                F.lit(None).cast("decimal(18,2)").alias("__v"),
                F.lit(None).cast(ts_type).alias("__ts"),
                F.col("__t").alias("__at"),
                F.lit(f"p{d}").alias("__kind"),
            )
        )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchor = F.col("__kind") == "a"
    cum = u.select(
        "__k",
        "__id",
        "__at",
        "__ts",
        "__kind",
        F.sum(F.when(anchor, F.col("__v"))).over(w).alias("__cum_v"),
        F.sum(F.when(anchor, 1).otherwise(0)).over(w).alias("__cum_n"),
        F.sum(
            F.when(anchor & F.col("__v").isNotNull(), 1).otherwise(0)
        ).over(w).alias("__cum_nv"),
    )
    probe_v = [
        F.max(F.when(F.col("__kind") == f"p{d}", F.col("__cum_v"))).alias(
            f"__p{d}_v"
        )
        for d in days_list
    ]
    probe_n = [
        F.max(F.when(F.col("__kind") == f"p{d}", F.col("__cum_n"))).alias(
            f"__p{d}_n"
        )
        for d in days_list
    ]
    probe_nv = [
        F.max(F.when(F.col("__kind") == f"p{d}", F.col("__cum_nv"))).alias(
            f"__p{d}_nv"
        )
        for d in days_list
    ]
    res = cum.groupBy("__k", "__id", "__at").agg(
        F.max(F.when(anchor, F.col("__ts"))).alias("__ats"),
        # same-(id, t) duplicates share one group (their outputs are
        # identical — tie-inclusive RANGE frames); __mult re-expands
        # them to input multiplicity below
        F.sum(F.when(anchor, 1).otherwise(0)).alias("__mult"),
        F.max(F.when(anchor, F.col("__cum_v"))).alias("__a_v"),
        F.max(F.when(anchor, F.col("__cum_n"))).alias("__a_n"),
        F.max(F.when(anchor, F.col("__cum_nv"))).alias("__a_nv"),
        *probe_v,
        *probe_n,
        *probe_nv,
    ).withColumn(
        "__copy", F.explode(F.expr("sequence(1, __mult)"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return res.select(
        F.col("__k").alias(key),
        F.col("__id").alias(id_col),
        F.col("__ats").alias(ts_col),
        *[
            F.when(
                (F.col("__a_nv") - F.coalesce(F.col(f"__p{d}_nv"), F.lit(0)))
                == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                (F.col("__a_v") - F.coalesce(F.col(f"__p{d}_v"), zero))
                .cast("double")
            )
            .alias(f"sum_{d}d")
            for d in days_list
        ],
        *[
            (F.col("__a_n") - F.coalesce(F.col(f"__p{d}_n"), F.lit(0)))
            .cast("long")
            .alias(f"n_{d}d")
            for d in days_list
        ],
    )


@query(
    "feature_rolling_sum",
    oracle="""
    -- NULL-ts rows keep their diagnostic row but have NO trailing
    -- window (empty frame: sums NULL, count 0 — the engine's prefix-
    -- subtraction semantics); DuckDB's RANGE frame would otherwise
    -- group all NULL order keys as mutual peers (allnull catch)
    SELECT event_id, user_id, ts,
           CASE WHEN ts IS NULL THEN NULL ELSE
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w7 AS VARCHAR) AS DOUBLE)
           END AS sum_7d,
           CASE WHEN ts IS NULL THEN NULL ELSE
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w30 AS VARCHAR) AS DOUBLE)
           END AS sum_30d,
           CASE WHEN ts IS NULL THEN 0 ELSE
           CAST(COUNT(*) OVER w7 AS BIGINT) END AS n_7d
    FROM events
    WINDOW
      w7 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW),
      w30 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
    """,
)
def feature_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7d/30d value sums + 7d count per user — the reference's
    customer_features content (total_purchase_7d/30d) computed from raw
    events, via the prefix-subtraction formulation
    (``rolling_prefix_sums``): one shuffle on user_id, O(n) window cost
    regardless of how many events fall inside a frame. The naive
    sliding-RANGE-frame twin produces identical values (it IS the
    oracle's formulation) but re-accumulates each frame per row — 360 s
    vs ~6 s at a 100x-density replica."""
    e = load_table(spark, sf_dir, "events")
    out = rolling_prefix_sums(e, "user_id", "ts", "event_id", "value", (7, 30))
    return out.select(
        "event_id", "user_id", "ts", "sum_7d", "sum_30d",
        F.col("n_7d").alias("n_7d"),
    )


@query(
    "feature_rolling_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
               SUM(CAST(value AS DECIMAL(18,2))) AS hour_sum
        FROM events
        GROUP BY 1, 2
    )
    SELECT user_id, hour_start,
           CAST(CAST(SUM(hour_sum) OVER w AS VARCHAR) AS DOUBLE) AS sum_24h
    FROM hourly
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(hour_start)
                 RANGE BETWEEN 82800000000 PRECEDING AND CURRENT ROW)
    """,
)
def feature_rolling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe variant: pre-aggregate to (user, hour) grain, then a
    trailing 24h window over the *compacted* relation. This is the 100 TB
    answer to a hot key: the window's input is bounded by hours x users,
    not raw event volume, so a billion-event user costs the same as a
    hundred-event one past the first aggregate. Frame is 23h preceding:
    the current hour bucket plus 23 = a 24-hour trailing window."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("hour_sum"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("hour_start")))
        .rangeBetween(-23 * 3600 * _US, 0)
    )
    return hourly.select(
        "user_id", "hour_start",
        F.sum("hour_sum").over(w).cast("double").alias("sum_24h"),
    )


@query(
    "feature_time_decay",
    oracle="""
    WITH anchor AS (SELECT max(epoch_us(ts)) AS a FROM events)
    SELECT user_id,
           CAST(CAST(SUM(
               CAST(value AS DECIMAL(18,2))
               * CAST(power(0.5, least((a - epoch_us(ts)) // 604800000000, 10))
                      AS DECIMAL(12,10))
           ) AS VARCHAR) AS DOUBLE) AS decayed_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, anchor
    GROUP BY user_id
    """,
)
def feature_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted feature: per-user sum of value with a one-week
    half-life — each event contributes value * 2^-age_weeks (age capped
    at 10 half-lives, below which the weight is noise). The standard
    alternative to hard rolling cutoffs: yesterday's purchase counts
    almost fully, last quarter's a little, with no cliff at the window
    edge.

    Cross-engine exactness: exp()-based decay is not a bit-contract, but
    0.5^k for integer k IS exact in IEEE and representable in
    DECIMAL(12,10) up to k=10, so the weighted sum accumulates in exact
    decimal on both engines and is partition-order independent. The decay
    anchor is the table's max timestamp (one tiny aggregate, broadcast
    into the scan — map-side), making the feature deterministic for a
    given snapshot rather than dependent on wall-clock now().

    Scale: anchor broadcast + one shuffle on user_id for the aggregate;
    weights are computed per row map-side. Same shape at 100 TB.
    """
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max(F.unix_micros("ts")).alias("a"))
    k = F.least(
        F.expr("(a - unix_micros(ts)) div 604800000000"), F.lit(10)
    )
    contrib = F.expr("CAST(value AS DECIMAL(18,2))") * F.pow(
        F.lit(0.5), k
    ).cast("decimal(12,10)")
    return (
        e.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(contrib).cast("double").alias("decayed_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# Gap-filling grid clamp (VERDICT r10 item #2): a generated per-key grid
# MUST be bounded by configuration, not by the data's timestamp span — a
# single epoch-or-far-future outlier per key otherwise fans out millions
# of rows per key (feature_resample_1h hung the r10 adversarial gate at
# ~2.016M rows/user on an epoch->2199 span). The clamp anchors each grid
# at the key's MEDIAN bucket (percentile_disc 0.5 — outlier-immune) and
# extends at most RESAMPLE_HALF_SPAN_HOURS / DENSIFY_HALF_SPAN_DAYS each
# way; observed buckets OUTSIDE the clamped span are still emitted
# verbatim (quarantined: no synthetic gap rows are generated around
# them), so no data is lost and grid rows <= keys x (2*half_span + 1).
RESAMPLE_HALF_SPAN_HOURS = 2196   # ±91.5 days; benign 30-day data unclamped
DENSIFY_HALF_SPAN_DAYS = 183      # ±183 days;  benign 30-day data unclamped


@query(
    "feature_resample_1h",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hb,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS hour_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        -- ts IS NOT NULL: an event with no event-time belongs to no
        -- hourly bucket and cannot seed a resample grid (allnull)
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(hb) AS mn, MAX(hb) AS mx,
               quantile_disc(CAST(epoch(hb) AS BIGINT), 0.5) AS med_s
        FROM hourly GROUP BY 1
    ),
    cb AS (
        SELECT user_id,
               greatest(mn, CAST(to_timestamp(med_s) AS TIMESTAMP)
                            - INTERVAL {RESAMPLE_HALF_SPAN_HOURS} HOUR) AS lo,
               least(mx, CAST(to_timestamp(med_s) AS TIMESTAMP)
                         + INTERVAL {RESAMPLE_HALF_SPAN_HOURS} HOUR) AS hi
        FROM bounds
    ),
    spine AS (
        SELECT user_id,
               CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS TIMESTAMP) AS hb
        FROM cb
        UNION ALL
        SELECT h.user_id, h.hb
        FROM hourly h JOIN cb ON h.user_id = cb.user_id
        WHERE h.hb < cb.lo OR h.hb > cb.hi
    )
    SELECT g.user_id, g.hb,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
           last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM spine g
    LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hb = h.hb
    """,
)
def feature_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill / resample to an hourly grid per user: every hour of a
    user's CLAMPED span gets a row — observed hours carry their exact
    aggregate, silent hours carry n_events = 0 and the LAST observed
    hourly value forward. This is the regularization step between raw
    event streams and fixed-step feature vectors (models want dense
    grids; event data is sparse).

    Contract (adversarial-input hardening, r11): rows with NULL user_id
    are excluded (a per-user resample is undefined without a key); the
    generated grid for each user spans at most RESAMPLE_HALF_SPAN_HOURS
    each side of the user's MEDIAN observed hour, so one corrupt
    epoch/far-future timestamp cannot fan the grid into millions of rows
    (the r10 adversarial replica hung here at ~2M rows/user). Observed
    hours outside the clamped span are quarantined: emitted verbatim
    (exact aggregate, forward-fill participates) but no synthetic gap
    rows are generated around them. On in-bounds data (span <= half_span)
    the clamp never binds and output is identical to the unclamped grid.

    Scale shape: the raw stream collapses to (user, hour) grain FIRST
    (one map-side-combined shuffle — the grid math never touches raw
    events), per-user bounds+median ride the same aggregate, and the grid
    is sequence() + explode over each user's own clamped span — output is
    bounded by users x (2*half_span+1) + observed outlier hours, enforced
    not assumed. The carry-forward is the same one-window
    last(ignorenulls) used by point-in-time lookups. Determinism: hourly
    sums accumulate in DECIMAL; (user, hour) rows are unique so the
    window order is total; the median is percentile_disc (an actual
    element, hour-aligned) on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    # NOTE (r17 optimization round): a localCheckpoint on hourly was
    # tried and REVERTED — the bounds aggregate and the grid-fill join
    # reference the rollup verbatim, AQE's runtime stage reuse already
    # shares the exchange, and the eager checkpoint job regressed the
    # query ~13-18% in two A/B windows.
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hb"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double").alias("hour_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    half = RESAMPLE_HALF_SPAN_HOURS
    # Span-probe short-circuit (VERDICT r11 #6): the clamp lo/hi =
    # greatest(mn, med-half)/least(mx, med+half) provably never binds
    # when the user's span fits HALF the window — med lies in [mn, mx],
    # so mx-mn <= half forces med-half <= mn and med+half >= mx. One
    # cheap min/max probe on the RAW stream (map-side-combined agg, one
    # tiny action; raw span bounds the hour-bucket span to within one
    # flooring hour, hence the -1h margin) decides it for ALL users at
    # once; only when some user's span exceeds the margin does the
    # percentile_disc median pass run. Benign data (30-day span vs the
    # 91.5-day half-span) takes the probe path and pays nothing for the
    # r11 hang fix; adversarial epoch/far-future outliers trip the probe
    # and get the full median-anchored clamp, behavior unchanged.
    max_span_us = e.groupBy("user_id").agg(
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("s")
    ).agg(F.max("s")).first()[0]
    if max_span_us is None or max_span_us <= (half - 1) * 3_600_000_000:
        cb = hourly.groupBy("user_id").agg(
            F.min("hb").alias("lo"), F.max("hb").alias("hi")
        )
    else:
        cb = hourly.groupBy("user_id").agg(
            F.min("hb").alias("mn"),
            F.max("hb").alias("mx"),
            F.expr(
                "timestamp_seconds(CAST(percentile_disc(0.5) "
                "WITHIN GROUP (ORDER BY unix_seconds(hb)) AS BIGINT))"
            ).alias("med"),
        ).select(
            "user_id",
            F.expr(f"greatest(mn, med - INTERVAL {half} HOUR)").alias("lo"),
            F.expr(f"least(mx, med + INTERVAL {half} HOUR)").alias("hi"),
        )
    grid = cb.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hb"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # FULL OUTER join, not union-then-left-join: out-of-range observed
    # hours (the quarantined outliers) surface from the hourly side of
    # the SAME join that fills the grid, so the hourly rollup is planned
    # twice (bounds + fill), not three times — one fewer scan and
    # shuffle of the raw events at any scale (r11 plan-scan audit).
    return (
        grid.join(hourly, ["user_id", "hb"], "full")
        .select(
            "user_id",
            "hb",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@query(
    "densify_daily_spine",
    oracle=f"""
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
              AND value IS NOT NULL
    ),
    b AS (
        SELECT greatest(min(day),
                        quantile_disc(day, 0.5) - {DENSIFY_HALF_SPAN_DAYS})
                   AS d0,
               least(max(day),
                     quantile_disc(day, 0.5) + {DENSIFY_HALF_SPAN_DAYS})
                   AS d1
        FROM p
    ),
    days AS (
        SELECT CAST(unnest(generate_series(
            CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
            INTERVAL 1 DAY)) AS DATE) AS day
        FROM b
    ),
    u AS (SELECT DISTINCT user_id FROM p),
    g AS (
        SELECT user_id, day, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM p GROUP BY 1, 2
    ),
    spine AS (
        SELECT u.user_id, d.day FROM u CROSS JOIN days d
        UNION ALL
        SELECT g.user_id, g.day FROM g CROSS JOIN b
        WHERE g.day < b.d0 OR g.day > b.d1
    )
    SELECT s.user_id, s.day,
           CAST(coalesce(g.n, 0) AS BIGINT) AS n_purchases,
           CAST(coalesce(g.cents, 0) AS BIGINT) AS sum_value_cents
    FROM spine s
    LEFT JOIN g ON g.user_id = s.user_id AND g.day = s.day
    """,
)
def densify_daily_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap filling): every (user, day) cell over
    the corpus's CLAMPED purchase date span, zero-filled where the user
    bought nothing — the dense spine that feeds fixed-length model
    inputs, forward fills ([win_forward_fill]), and day-over-day deltas,
    none of which tolerate missing rows.

    Contract (adversarial-input hardening, r11): purchases with NULL
    user_id or NULL value are excluded (a per-user spine is undefined
    without a key; a cents sum is undefined without a value); the global
    date span is clamped to DENSIFY_HALF_SPAN_DAYS each side of the
    MEDIAN purchase day, so one corrupt epoch/far-future timestamp
    cannot fan the spine into |users| x 84k-days cells (the r10
    adversarial replica emitted 12.7M rows from 10k events here).
    Observed (user, day) cells outside the clamped span are quarantined:
    emitted verbatim with their exact counts, no synthetic zero-fill
    around them. On in-bounds data (span <= 2*half_span) the clamp never
    binds and output is identical to the unclamped spine.

    Shape at 100 TB: the spine is GENERATED, not scanned — a 1-row
    global min/median/max aggregate broadcast onto the distinct-user
    dim, then ``explode(sequence(d0, d1))`` fans each user into its days
    map-side (|users| x |days| rows that never existed in the source and
    never shuffle as a unit; the only exchanges are the two user-keyed
    aggs and the left join's, all on the same key), with the row budget
    ENFORCED at users x (2*half_span+1) + observed outlier cells. Values
    carry as floor(value*100) BIGINT cents, so the zero-fill and the
    sums are engine-exact at any accumulation order.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    half = DENSIFY_HALF_SPAN_DAYS
    bounds = p.agg(
        F.min("day").alias("mn"),
        F.max("day").alias("mx"),
        F.expr(
            "date_add(DATE '1970-01-01', CAST(percentile_disc(0.5) "
            "WITHIN GROUP (ORDER BY datediff(day, DATE '1970-01-01')) AS INT))"
        ).alias("med"),
    ).select(
        F.expr(f"greatest(mn, date_add(med, -{half}))").alias("d0"),
        F.expr(f"least(mx, date_add(med, {half}))").alias("d1"),
    )
    g = p.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    dense = (
        p.select("user_id").distinct()
        .join(F.broadcast(bounds))  # 1-row bounds: broadcast, not cartesian
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    quarantined = (
        g.join(F.broadcast(bounds))
        .filter((F.col("day") < F.col("d0")) | (F.col("day") > F.col("d1")))
        .select("user_id", "day")
    )
    spine = dense.unionByName(quarantined)
    return spine.join(g, ["user_id", "day"], "left").select(
        "user_id", "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_purchases"),
        F.coalesce(F.col("cents"), F.lit(0)).cast("long")
        .alias("sum_value_cents"),
    )
