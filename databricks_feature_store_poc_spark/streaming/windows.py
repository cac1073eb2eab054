"""Streaming window semantics on ``events`` (SURVEY.md §2 tier 2, M6).

Four registered queries cover the windowed-aggregation semantics of
Structured Streaming — tumbling, sliding, session (gap-based), and
watermark late-data drop — each in its *batch-equivalent* form so the
DuckDB oracle can check exact values. The genuinely-streaming execution of
the same plans (``readStream`` -> ``withWatermark`` -> windowed agg ->
``availableNow`` trigger) lives in :func:`run_tumbling_stream` /
:func:`run_session_stream` below and is asserted equal to the batch
results in tests/test_streaming.py — the parity Structured Streaming
guarantees by design (same Catalyst plan, incrementalized).

Scale notes: windowed aggregation shuffles on (window, keys) with partial
aggregation map-side; session windows shuffle on user_id then merge
per-key sorted runs; state size in the true streaming run is bounded by
the watermark horizon, which is exactly what `stream_late_data` models.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table, parquet_schema


def _stream_source_dir(sf_dir: str) -> str:
    """FileStreamSource wants a *directory* of files; the testdata ships
    one parquet file per table, while real tables (and the 10x stress
    replicas) are DIRECTORIES of part files — both shapes are staged
    (hard-link when possible, copy otherwise). The staged copy is
    memoized on the source fingerprint (mtime+size), so a source
    regenerated in place invalidates instead of silently streaming
    stale bytes (the scan_binary_files staging rule)."""
    from databricks_feature_store_poc_spark import cacheutil

    src = os.path.join(sf_dir, "events.parquet")
    staged = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if os.path.isdir(src):
        parts = sorted(
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
    else:
        parts = [src]
    fp = cacheutil.source_fingerprint(parts)
    marker = os.path.join(staged, "_STAGED")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fp:
                return staged
    shutil.rmtree(staged, ignore_errors=True)
    os.makedirs(staged, exist_ok=True)
    for i, p in enumerate(parts):
        dst = os.path.join(staged, f"events_{i}.parquet")
        try:
            os.link(p, dst)
        except OSError:
            shutil.copy(p, dst)
    with open(marker, "w") as f:
        f.write(fp)
    return staged


@query(
    "stream_tumbling",
    oracle="""
    -- WHERE ts IS NOT NULL in this family: NULL event-times carry no
    -- window (Spark's F.window/session_window and real watermarked
    -- streaming DROP them; allnull-replica contract)
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS win_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows x event_type. `F.window` assigns each row to
    exactly one epoch-aligned bucket — for 1h widths that bucket equals
    date_trunc('hour'), which is the oracle's formulation."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
    WITH assigned AS (
        SELECT make_timestamp((epoch_us(ts) // 1800000000 - j) * 1800000000)
                   AS win_start,
               value
        FROM events, (VALUES (0), (1)) AS shifts(j)
        WHERE ts IS NOT NULL
    )
    SELECT win_start,
           win_start + INTERVAL 1 HOUR AS win_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min: each event lands in exactly two
    windows, whose starts are the two slide-aligned points at or before
    ts. The oracle materializes that 2-way assignment explicitly
    (floor-to-slide minus j*slide for j in {0,1})."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(win)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n", "sum_value",
        )
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE ts IS NOT NULL
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30min of
    user inactivity; the session closes 30min after its last event
    (exactly `session_window`'s [start, last+gap) contract). The oracle
    derives the same sessions via the classic lag + running-flag-sum
    construction."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n", "sum_value",
        )
    )


@query(
    "stream_late_data",
    oracle="""
    WITH arrivals AS (
        SELECT ts, value,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - INTERVAL 10 MINUTES AS watermark
        FROM events
    )
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM arrivals
    WHERE watermark IS NULL OR ts >= watermark
    GROUP BY 1
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop, modeled exactly: arrival order =
    event_id; the watermark after each arrival is max(event time seen) -
    10min; a row is dropped if its event time is behind the watermark at
    its arrival. Survivors aggregate into tumbling 1h windows.

    The global ORDER BY event_id window is the *semantic spec*, not the
    production plan — it exists so DuckDB can check the drop rule exactly.
    The production path is `readStream.withWatermark("ts", "10 minutes")`
    (see run_tumbling_stream), where the watermark is tracked per
    micro-batch with no global sort.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    wm = F.max("ts").over(w) - F.expr("INTERVAL 10 MINUTES")
    kept = e.withColumn("watermark", wm).filter(
        F.col("watermark").isNull() | (F.col("ts") >= F.col("watermark"))
    )
    return kept.groupBy(F.date_trunc("hour", "ts").alias("win_start")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@query(
    "stream_dedup_exactly_once",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY event_id
                   ORDER BY user_id NULLS FIRST, event_type NULLS FIRST,
                            value NULLS FIRST) AS rn
        FROM (SELECT event_id, user_id, event_type, value FROM events
              UNION ALL
              SELECT event_id, user_id, event_type, value FROM events) twice
    ) WHERE rn = 1
    """,
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of run_stream_dedup: every event arrives twice (an
    at-least-once source), dedup on event_id restores exactly-once. The
    streaming production path is ``dropDuplicatesWithinWatermark`` whose
    state is bounded by the late-data horizon; with a static input the
    result must equal this batch key-dedup of the doubled input
    (run_stream_dedup re-executes the same shape through a real
    readStream in tests/test_streaming.py).

    The kept row per key is the payload-MINIMUM, not dropDuplicates'
    arbitrary first-seen: with genuinely conflicting duplicates (same
    event_id, different payload — the r12 dup replica), first-seen is
    partitioning- and retry-dependent, which breaks both the oracle
    comparison and the fault-injection gate's replay invariance.
    Streaming keeps first-ARRIVAL (wall-order is real there); the batch
    twin's deterministic stand-in is first-in-payload-order.

    Scale: one shuffle on the dedup key; the rank-1 filter plans as
    WindowGroupLimit, so each map task forwards at most one row per key
    it sees before the exchange — same partial-dedup effect as the
    aggregate form of distinct."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    w = Window.partitionBy("event_id").orderBy("user_id", "event_type", "value")
    return (
        e.unionAll(e)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT s.user_id AS s_user,
           s.event_id AS s_event,
           p.event_id AS p_event,
           s.ts AS s_ts,
           p.ts AS p_ts
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts > s.ts
     AND p.ts <= s.ts + INTERVAL 1 HOUR
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of run_stream_stream_join: signups joined to the same
    user's purchases within the following hour. In streaming form both
    sides carry watermarks and the time bound caps the join state
    (O(events/hour) buffered per side); with availableNow over static
    files nothing is late, so the streaming result must equal this
    batch interval join (asserted in tests/test_streaming.py) and the
    batch plan is oracle-checkable here.

    Scale: the join key is (user_id, hour_bucket), not user_id alone.
    A plain equi-join on user_id evaluates the interval bound INSIDE the
    sort-merge key group — quadratic in the hottest user's event count,
    and irreducible by AQE because the skew lives inside ONE key (the
    r9 zipf sweep measured 1.8 s -> 63 s when user 0 owns 9.3% of
    events). Bucketizing is exact, not approximate: with integer
    microseconds, p in (s, s+H] implies p_us div H is s_us div H or
    s_us div H + 1, so exploding the signup side over those two bucket
    values loses no pair and each qualifying pair matches exactly one
    bucket (bucket(p) is a function of p) — no dedup needed. The
    residual range predicate is unchanged, so semantics are byte-equal;
    the hot user now scatters over ~one bucket per hour of history, and
    per-group pair scans are signups-in-2h x purchases-in-1h. Cost on
    uniform data: a 2x explode of the (smaller, filtered) signup side.
    This is the same state-keying a streaming interval join uses —
    watermark horizon = bucket width."""
    hour_us = 3_600_000_000  # the INTERVAL 1 HOUR bound, in microseconds
    e = load_table(spark, sf_dir, "events")
    s_bkt = F.expr(f"unix_micros(ts) div {hour_us}")
    s = (
        e.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_id").alias("s_event"),
            F.col("ts").alias("s_ts"),
            F.explode(F.array(s_bkt, s_bkt + F.lit(1))).alias("bkt"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
        F.expr(f"unix_micros(ts) div {hour_us}").alias("bkt"),
    )
    return (
        s.join(
            p,
            (F.col("s_user") == F.col("p_user"))
            & (s["bkt"] == p["bkt"])
            & (F.col("p_ts") > F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("s_user", "s_event", "p_event", "s_ts", "p_ts")
    )


# ---------------------------------------------------------------------------
# True Structured Streaming execution (used by tests/test_streaming.py)
# ---------------------------------------------------------------------------

class _state_sized_shuffle:
    """Context manager: run a streaming query with an env-derived state
    partition count, restoring the session's shuffle width afterwards
    (r18, VERDICT r17 'do this' #7).

    Structured Streaming fixes its state-store partition count from
    ``spark.sql.shuffle.partitions`` at query start, and AQE does NOT
    coalesce stateful streaming shuffles — so the availableNow parity
    gates paid 32 state-store instances (open + commit per micro-batch)
    for kilobytes of state. Measured on run_session_stream at sf0.1:
    32 partitions -> 3.3-4.2 s, 8 -> ~2.6 s, 4 -> ~2.6 s, sink rows
    IDENTICAL (sorted-collect compared). max(4, cpus // 4) keeps the
    count env-derived (scales with the same knob the driver scales
    cores with), never hardcoded to this rig; a real deployment sizes
    state partitions to state volume x cluster width the same way. The
    batch twins are built AFTER restore, so their plans are untouched.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self) -> None:
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
        cpus = int(cpus_env) if cpus_env.isdigit() else 32
        self.spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(4, cpus // 4))
        )

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stream_tumbling aggregation through a real streaming plan:
    readStream over the events parquet -> withWatermark -> windowed agg ->
    availableNow trigger into a memory sink. Returns the sink contents.

    Structured Streaming incrementalizes the identical Catalyst plan, so
    the result must equal the batch query — asserted in tests. Complete
    output mode + availableNow processes all existing files then stops.
    """
    src = _stream_source_dir(sf_dir)
    # Schema must match the RAW file layout (ts = INT64 nanos under
    # nanosAsLong, asserted once per session inside parquet_schema —
    # the per-run conf.set round-trip was removed in r18) — the
    # batch-side TimestampType is a post-read cast.
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes)["ts"] == "bigint":  # nanosAsLong read path
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )
    with _state_sized_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName("tumbling_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("tumbling_sink")


@query(
    "stream_true_parity",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(0 AS BIGINT) AS n_diff_rows
    FROM (
        SELECT date_trunc('hour', ts) AS h, event_type
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    """,
)
def stream_true_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured-Streaming execution under the driver's oracle gate
    (VERDICT r6 'do this' #6): run the tumbling-window aggregation as a
    real streaming job (readStream -> watermark -> windowed agg ->
    availableNow into a memory sink), diff the sink against the batch
    twin with exceptAll in BOTH directions, and emit (window count,
    diff-row count). The oracle computes the window count from batch
    semantics and pins the diff at literally 0 — so the driver
    adjudicates that Structured Streaming's incrementalized plan
    produced exactly the batch answer, not merely that a batch twin
    exists. Both sides aggregate value through DECIMAL(18,2) before the
    double cast, so the comparison is bit-exact, not tolerance-based.
    """
    streamed = run_tumbling_stream(spark, sf_dir)
    # NOTE (r17 optimization round): a localCheckpoint on the batch twin
    # was tried and REVERTED across all three parity gates — both
    # exceptAll directions reference the twin verbatim, AQE's runtime
    # stage reuse already shares the aggregate, and the eager checkpoint
    # job regressed the three gates 20% in a matched-window A/B.
    batch = stream_tumbling(spark, sf_dir)
    diff = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    n_diff = diff.agg(F.count(F.lit(1)).alias("n_diff_rows"))
    return (
        streamed.agg(F.count(F.lit(1)).alias("n_windows"))
        .crossJoin(F.broadcast(n_diff))
        .select(
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_diff_rows").cast("long").alias("n_diff_rows"),
        )
    )


@query(
    "stream_stateful_parity",
    oracle="""
    -- distinct SUBQUERY, not count(DISTINCT ...): the streaming and
    -- batch group-bys both keep NULL user_id as a real key, which
    -- count(DISTINCT) would silently drop (r11)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(0 AS BIGINT) AS n_diff_rows
    FROM (SELECT DISTINCT user_id FROM events)
    """,
)
def stream_stateful_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-adjudicated CUSTOM stateful streaming: run the
    applyInPandasWithState per-key counter as a real streaming job
    (readStream -> groupBy -> Arrow-batched state update -> availableNow
    into a memory sink), reduce the update-mode sink to its final
    emission per key, and diff against the batch group-by with exceptAll
    in both directions. The oracle pins (distinct-key count, 0 diff
    rows) — extending the ``stream_true_parity`` gate (built-in windowed
    agg) to the escape-hatch operator class the built-ins can't express.

    The final emission per key is the one with the highest running
    n_events (strictly increasing across micro-batches — every emission
    for a key follows at least one new event), selected with a
    max(struct) aggregate rather than a window. Parity is exact, not
    tolerance-based, because the state accumulates BIGINT cents
    (see ``run_stateful_counter_stream``).
    """
    streamed = run_stateful_counter_stream(spark, sf_dir)
    final = (
        streamed.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("m"))
        .select("user_id", F.col("m.n_events").alias("n_events"),
                F.col("m.total_cents").alias("total_cents"))
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # coalesce: a key whose every value is NULL totals 0 cents,
            # matching the stateful kernel's integer state
            F.coalesce(
                F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)")),
                F.lit(0),
            ).cast("long").alias("total_cents"),
        )
    )
    diff = final.exceptAll(batch).unionAll(batch.exceptAll(final))
    n_diff = diff.agg(F.count(F.lit(1)).alias("n_diff_rows"))
    return (
        final.agg(F.count(F.lit(1)).alias("n_keys"))
        .crossJoin(F.broadcast(n_diff))
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_diff_rows").cast("long").alias("n_diff_rows"),
        )
    )


def run_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_session through a real streaming plan (session_window +
    watermark + availableNow). Session windows require watermark +
    append/update mode; with availableNow over a static file set, all
    sessions close once the stream drains."""
    src = _stream_source_dir(sf_dir)
    # Schema must match the RAW file layout (ts = INT64 nanos under
    # nanosAsLong, asserted once per session inside parquet_schema —
    # the per-run conf.set round-trip was removed in r18) — the
    # batch-side TimestampType is a post-read cast.
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes)["ts"] == "bigint":  # nanosAsLong read path
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
        )
    )
    with _state_sized_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName("session_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("session_sink")


def run_stateful_counter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count +
    value total via applyInPandasWithState — the escape hatch when
    built-in windowed aggregation can't express the semantics (custom
    session logic, CEP-ish patterns, per-key models).

    State = one (count, cents) pair per user_id, updated per micro-batch;
    each batch emits the keys it touched with their post-update totals,
    so the final emission per key equals the batch group-by (asserted in
    tests/test_streaming.py and driver-adjudicated by
    ``stream_stateful_parity``). At scale, state lives in the state store
    (RocksDB-backed on a real cluster) partitioned by key — memory per
    executor is bounded by its key range, not the stream length.

    Totals accumulate as floor(value*100) BIGINT cents, not floats: the
    repo-wide fixed-point convention. A float-typed state would make the
    final emission depend on pandas' batch accumulation order vs the
    batch twin's Spark accumulation order — integer state makes the
    stream-vs-batch comparison exact at any batch split.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = _stream_source_dir(sf_dir)
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    def update_counts(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # IEEE double *100 then floor — bit-identical to the Spark/
            # DuckDB expression floor(value * 100) on the same doubles.
            # NULL values arrive as NaN and must be skipped exactly like
            # SQL SUM skips NULL — np.floor(NaN).astype(int64) is
            # undefined garbage, the r11 adversarial-replica crash.
            v = pdf["value"].to_numpy()
            v = v[~np.isnan(v)]
            cents += int(np.floor(v * 100.0).astype(np.int64).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update_counts,
            outputStructType="user_id LONG, n_events LONG, total_cents LONG",
            stateStructType="n LONG, cents LONG",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    with _state_sized_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName("stateful_counter_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stateful_counter_sink")


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_sliding through a real streaming plan (complete mode, like
    the tumbling runner) — completes the batch-vs-stream parity matrix."""
    src = _stream_source_dir(sf_dir)
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n", "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sliding_sink")


def run_foreach_batch_sink(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Exactly-once file sink via foreachBatch: each micro-batch writes to
    a path keyed by its epoch id, so a replayed batch (failure/retry)
    overwrites its own output instead of duplicating it — the idempotent-
    sink pattern for stores without transactional streaming writes.
    Returns the number of epochs written."""
    src = _stream_source_dir(sf_dir)
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    epochs: list[int] = []

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Idempotent: the epoch directory is the transaction boundary.
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        epochs.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(epochs)


def run_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the same events file staged twice
    into the source directory (every event arrives twice), deduplicated
    on event_id with ``dropDuplicatesWithinWatermark`` — the streaming
    primitive behind at-least-once source -> exactly-once pipeline
    semantics.

    WithinWatermark (not plain dropDuplicates) is the 100 TB-correct
    choice: state for an event_id is dropped once the watermark passes
    it, so dedup state is bounded by the late-data horizon instead of
    growing with the stream's lifetime. Parity with batch DISTINCT over
    the duplicated input is asserted in tests/test_streaming.py.
    """
    base = _stream_source_dir(sf_dir)
    # Duplicate EVERY staged part file (the staging writes
    # events_{i}.parquet). The dup dir is keyed by a fingerprint of the
    # base part list (name, size, mtime): the same base staging always
    # resolves to the same IMMUTABLE dup dir, so concurrent harness
    # runs over one sf_dir reuse it instead of racing a delete against
    # another run's readStream listing, and a re-staged base (new
    # fingerprint) gets a fresh dir without touching the old one.
    parts = sorted(
        f for f in os.listdir(base)
        if f.endswith(".parquet")
    )
    fp_src = ";".join(
        f"{name}:{(st := os.stat(os.path.join(base, name))).st_size}"
        f":{st.st_mtime_ns}"
        for name in parts
    )
    fp = hashlib.sha256(fp_src.encode()).hexdigest()[:16]
    staged = f"{base}_dup_{fp}"
    if not os.path.exists(os.path.join(staged, "_STAGED")):
        # Build in a process-private tmp dir, then atomically rename
        # into place; if a concurrent run won the rename, use theirs.
        tmp = f"{staged}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for i, name in enumerate(parts):
            src = os.path.join(base, name)
            for copy_tag in ("a", "b"):
                dst = os.path.join(tmp, f"events_{i}_{copy_tag}.parquet")
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy(src, dst)
        with open(os.path.join(tmp, "_STAGED"), "w") as fh:
            fh.write(fp_src)
        try:
            os.rename(tmp, staged)
        except OSError as exc:
            shutil.rmtree(tmp, ignore_errors=True)
            # "another run won" is only true if the staged dir actually
            # exists; any other rename failure (EXDEV across
            # filesystems, permissions) would otherwise surface later
            # as an opaque readStream listing error (ADVICE r15 #4)
            if not os.path.exists(os.path.join(staged, "_STAGED")):
                raise OSError(
                    f"staging rename {tmp} -> {staged} failed and no "
                    f"concurrent run staged it: {exc}"
                ) from exc
        # Opportunistic GC: fingerprinted dup dirs from re-staged bases
        # accumulate forever otherwise (ADVICE r16 #1 hardening): any
        # sibling containing '.tmp.' is a staging dir — possibly another
        # live process's in-flight copy — and is reaped only past an age
        # threshold that marks it abandoned (a crashed run), never by
        # name alone. Stale fingerprinted dirs get an mtime grace window
        # so an older concurrent readStream that already LISTED the dir
        # can finish reading its parquet files before removal.
        parent, prefix = os.path.dirname(base), os.path.basename(base)
        now = time.time()
        for d in os.listdir(parent or "."):
            if not d.startswith(prefix + "_dup_") or d == os.path.basename(
                staged
            ):
                continue
            victim = os.path.join(parent, d)
            grace = 3600.0 if ".tmp." in d else 600.0
            try:
                if now - os.path.getmtime(victim) > grace:
                    shutil.rmtree(victim, ignore_errors=True)
            except OSError:
                pass  # vanished under us — another run's GC won
    # Schema must match the RAW file layout (ts = INT64 nanos under
    # nanosAsLong, asserted once per session inside parquet_schema —
    # the per-run conf.set round-trip was removed in r18) — the
    # batch-side TimestampType is a post-read cast.
    raw_schema = parquet_schema(spark, staged)
    stream = spark.readStream.schema(raw_schema).parquet(staged)
    if dict(stream.dtypes)["ts"] == "bigint":  # nanosAsLong read path
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("dedup_sink")


def run_streaming_feature_maintenance(spark: SparkSession, sf_dir: str, table_root: str):
    """End-to-end streaming feature maintenance: the events stream,
    processed in micro-batches (maxFilesPerTrigger=1 over a 3-file
    staging of the table), incrementally maintains a per-user feature
    table — each epoch's foreachBatch aggregates its batch, MERGES the
    deltas into the current features (full-outer coalesce-add on
    user_id), and writes the result as a new immutable snapshot of a
    VersionedFeatureTable.

    This is the feature-platform hot loop: stream -> incremental
    aggregate -> versioned upsert, with epoch == version so replays and
    audits can pin any intermediate state. Counts and totals accumulate
    in exact DECIMAL, so the final snapshot equals the one-shot batch
    aggregate bit-for-bit (asserted in tests/test_streaming.py).
    Returns the VersionedFeatureTable.
    """
    from databricks_feature_store_poc_spark.featurestore.versioned import (
        VersionedFeatureTable,
        VersionedTableError,
    )

    # Stage the events table as 3 parquet files so availableNow +
    # maxFilesPerTrigger=1 yields multiple micro-batches. The staged
    # write is a normal Spark write (micros timestamps — no nanos raw
    # schema to work around here).
    staged = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_split_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        from databricks_feature_store_poc_spark.sources.catalog import load_table

        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        ).repartition(3).write.mode("overwrite").parquet(staged)

    vt = VersionedFeatureTable(spark, table_root, "user_features")
    schema = parquet_schema(spark, staged)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )

    def update_features(batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        try:
            current = vt.read()
        except VersionedTableError:
            current = None
        if current is None:
            merged = delta
        else:
            c = current.select(
                F.col("user_id"),
                F.col("n_events").alias("n_old"),
                F.col("total_value").alias("t_old"),
            )
            merged = (
                delta.join(c, "user_id", "full_outer")
                .select(
                    "user_id",
                    (F.coalesce("n_events", F.lit(0)) + F.coalesce("n_old", F.lit(0)))
                    .alias("n_events"),
                    (
                        F.coalesce(F.col("total_value"), F.lit(0).cast("decimal(18,2)"))
                        + F.coalesce(F.col("t_old"), F.lit(0).cast("decimal(18,2)"))
                    ).cast("decimal(18,2)").alias("total_value"),
                )
            )
        vt.write(merged, timestamp=float(epoch_id))

    q = (
        stream.writeStream.foreachBatch(update_features)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(table_root, "_checkpoint"))
        .start()
    )
    q.awaitTermination()
    return vt


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: the signup stream joined to the purchase
    stream per user with a time bound (purchase within 1 hour after the
    signup event), both sides watermarked — the stateful join shape
    Structured Streaming buffers bounded state for: each side keeps only
    rows the watermark + join bound still allow to match, so state is
    O(events per hour), not O(stream).

    Both inputs come from the same staged events directory (filtered by
    event_type), which also makes the batch-parity assertion exact: with
    availableNow over a static file set nothing is late, so the result
    must equal the batch time-bounded join (tests/test_streaming.py).
    """
    src = _stream_source_dir(sf_dir)
    # Schema must match the RAW file layout (ts = INT64 nanos under
    # nanosAsLong, asserted once per session inside parquet_schema —
    # the per-run conf.set round-trip was removed in r18) — the
    # batch-side TimestampType is a post-read cast.
    raw_schema = parquet_schema(spark, src)

    def side(event_type: str, prefix: str) -> DataFrame:
        s = spark.readStream.schema(raw_schema).parquet(src)
        if dict(s.dtypes)["ts"] == "bigint":  # nanosAsLong read path
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return (
            s.filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "30 minutes")
        )

    signups = side("signup", "s")
    purchases = side("purchase", "p")
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("s_user", "s_event", "p_event", "s_ts", "p_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("ss_join_sink")


def run_transform_with_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, total) via transformWithStateInPandas —
    Spark 4's next-generation stateful API (the successor to
    applyInPandasWithState used by run_stateful_counter_stream): typed
    state handles (ValueState here; List/MapState exist), explicit
    timers, and schema'd state the RocksDB provider can evolve. One
    (count, total) record per user in the state store; memory per
    executor scales with its key range, not stream length.

    The final emitted row per user must equal the batch aggregate —
    asserted in tests/test_streaming.py, same contract as the
    applyInPandasWithState twin.

    Environment gate: the TWS state-server protocol needs a working
    ``google.protobuf``; absent that (this container), raises
    ImportError and the parity test skips — same pattern as the
    delta-spark and mlflow gates. applyInPandasWithState
    (run_stateful_counter_stream) remains the ungated stateful path."""
    import google.protobuf.descriptor  # noqa: F401  (gate: TWS needs protobuf)

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("total", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    src = _stream_source_dir(sf_dir)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    raw_schema = parquet_schema(spark, src)
    stream = spark.readStream.schema(raw_schema).parquet(src)
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    result = (
        stream.select("user_id", F.col("value").cast("double").alias("value"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    q = (
        result.writeStream.format("memory")
        .queryName("tws_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("tws_sink")


@query(
    "stream_session_parity",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    ),
    sess AS (
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTES AS session_end
        FROM numbered GROUP BY user_id, session_id
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTES AS w FROM events)
    SELECT CAST(count(*) AS BIGINT) AS n_closed_sessions,
           CAST(0 AS BIGINT) AS n_diff_rows
    FROM sess, wm WHERE sess.session_end <= wm.w
    """,
)
def stream_session_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third leg of the driver-adjudicated streaming-parity gates (after
    ``stream_true_parity``'s built-in windowed agg and
    ``stream_stateful_parity``'s custom stateful operator): a REAL
    session_window streaming run in APPEND mode — the mode whose output
    depends on WATERMARK-driven state eviction, not just aggregation —
    diffed against the batch sessionization restricted to
    watermark-closed sessions (session_end <= max(ts) - 10min, the
    final global watermark of the drained stream).

    The oracle pins (closed-session count, 0 diff rows), so the driver
    adjudicates that append-mode session semantics — gap merging, state
    flush at the final watermark — exactly reproduce the batch gap
    sessionization on the closed prefix. The watermark bound is
    computed in-plan (1-row broadcast), never collected.
    """
    streamed = run_session_stream(spark, sf_dir).select(
        "user_id", "session_start", "session_end", F.col("n").cast("long").alias("n")
    )
    batch = stream_session(spark, sf_dir).select(
        "user_id", "session_start", "session_end", F.col("n").cast("long").alias("n")
    )
    wm = load_table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w")
    )
    closed = (
        batch.crossJoin(F.broadcast(wm))
        .filter(F.col("session_end") <= F.col("w"))
        .drop("w")
    )
    diff = streamed.exceptAll(closed).unionAll(closed.exceptAll(streamed))
    n_diff = diff.agg(F.count(F.lit(1)).alias("n_diff_rows"))
    return (
        closed.agg(F.count(F.lit(1)).alias("n_closed_sessions"))
        .crossJoin(F.broadcast(n_diff))
        .select(
            F.col("n_closed_sessions").cast("long").alias("n_closed_sessions"),
            F.col("n_diff_rows").cast("long").alias("n_diff_rows"),
        )
    )
