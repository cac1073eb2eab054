"""Scalar function suite + the UDF surface (SURVEY.md §2 tier 2).

String / date / math / CASE / JSON / array / map expressions — all
JVM-side built-ins (`pyspark.sql.functions`) that stay inside whole-stage
codegen; plus the three-point UDF surface the engine exposes when built-ins
can't express the semantics: `pandas_udf` (scalar, Arrow-batched),
`applyInPandas` (grouped aggregate), and `mapInPandas` (table function).
Row-at-a-time Python UDFs are deliberately absent — they are never the
right call at 100 TB (SURVEY.md §4).

Oracle conventions: functions whose cross-engine type differs are cast
explicitly (DuckDB year() is BIGINT, Spark's is INT); map lookups are
oracled by their value-equivalent expression (the oracle checks semantics,
not that DuckDB also used a map).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


def _dec(col: str | F.Column, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Built-in scalar functions
# ---------------------------------------------------------------------------

@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           substr(c_name, 10, 9) AS id_digits,
           concat_ws(':', c_mktsegment, c_name) AS seg_name,
           -- concat_ws (both engines) skips NULL parts, unlike || which
           -- NULL-propagates (r11: NULL c_mktsegment diverged)
           CAST(length(c_name) AS INT) AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           CAST(len(string_split(c_name, '#')) AS INT) AS n_parts
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substr/concat/length/regexp_extract/split — all codegen'd
    JVM expressions, no Python in the row path."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 10, 9).alias("id_digits"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
               AS days_to_98,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAYS AS due_ts
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract/trunc/diff/add on the order date. DuckDB's extracts return
    BIGINT and Spark's INT — both sides cast to INT explicitly."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_98"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_ts"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
           abs(l_discount - 0.05) AS disc_dist,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/sqrt/floor/ceil/mod. sqrt is IEEE-correctly-rounded so it
    is bit-identical cross-engine (unlike ln/exp, which are deliberately
    not in an oracle-checked query). round(x, 1) must round the SAME
    representation on both sides: both engines first cast the price to
    DECIMAL(18,2) (exact cents) and round that with HALF_UP — rounding the
    raw double instead lands on the other side of the .x5 tie whenever the
    nearest double is 123.44999…. floor/ceil: Spark emits BIGINT but
    DuckDB emits DOUBLE, and the driver's value hash is type-sensitive
    (63058 != 63058.0), so the oracle casts both to BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(_dec("l_extendedprice"), 1).cast("double").alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "fn_case",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS tier,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering feeding a group-by."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    return (
        o.withColumn("tier", tier)
        .groupBy("tier", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.k') END AS INT)
               AS k_int,
           CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.missing') END AS INT)
               AS k_missing
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON column; missing paths
    yield NULL on both engines.

    Contract (pinned r11): malformed / empty / NULL JSON input yields
    NULL, never an error — Spark's get_json_object does this natively;
    the oracle mirrors it with a json_valid() guard because DuckDB's
    json_extract_string RAISES on malformed input (adversarial replica:
    props in {'', '{broken json', NULL})."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_elem,
           embedding[64] AS last_elem,
           list_max(embedding) AS elem_max,
           list_min(embedding) AS elem_min,
           round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS elem_sum
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the 64-dim embedding column: size, 1-indexed
    element_at, array_min/max, and a higher-order fold for the sum — the
    pattern the similarity operators build on. Both engines fold the 64
    floats sequentially in index order; round(…,4) absorbs any last-ulp
    wobble."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.array_max("embedding").alias("elem_max"),
        F.array_min("embedding").alias("elem_min"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("elem_sum"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.k') END AS INT)
               AS k_from_map,
           2 AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + element_at lookup + map_keys. The oracle
    pins the *values* the map ops must produce (DuckDB's MAP type is not
    hash-comparable cross-engine; the semantics are). Malformed/NULL JSON
    props pin to NULL via the oracle's json_valid guard (see [fn_json])."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return e.withColumn("m", m).select(
        "event_id",
        F.element_at("m", "type").alias("type_from_map"),
        F.element_at("m", "k").cast("int").alias("k_from_map"),
        F.size(F.map_keys("m")).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# UDF surface (Arrow-batched only)
#
# Every Python body below is a *closure*, not a module-level function:
# cloudpickle serializes closures by value, so executor workers never need
# this package importable — the external driver's workers only have
# pyspark on their path.
# ---------------------------------------------------------------------------

@query(
    "udf_scalar",
    oracle="""
    SELECT event_id, value,
           CASE WHEN value IS NULL OR isnan(value) THEN NULL
                ELSE least(greatest(value, 0.0), 50.0) END AS clipped
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf scalar path; the oracle is the equivalent pure-SQL
    expression, proving the UDF computes what it claims. Arrow ships whole
    batches; pandas computes columnar — ~10-100x a row-at-a-time UDF."""

    @F.pandas_udf(T.DoubleType())
    def clip_0_50(v: pd.Series) -> pd.Series:
        # nullable Float64: NULL clips to NULL (r11 contract) — plain
        # float64 would round-trip Arrow NULL as NaN, while the oracle's
        # least/greatest (which IGNORE NULL, unlike SQL comparison)
        # computed 0.0; the CASE pins NULL->NULL on both engines.
        # NaN DATA values also land as NULL: Arrow delivers SQL NULL and
        # NaN identically as float64 NaN, so astype('Float64') folds both
        # to NA — the oracle's isnan() arm pins the same fold in DuckDB
        # (which would otherwise clip NaN to 50.0) (ADVICE r11 #3).
        return v.astype("Float64").clip(0.0, 50.0)

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", "value", clip_0_50("value").alias("clipped"))


@query(
    "udaf_grouped",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           max(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped aggregate: one shuffle on user_id, then each
    group lands in a pandas frame executor-side. At 100 TB the constraint
    is that a single group fits in one task's memory — true for per-user
    groups; for skewed keys pre-aggregate or salt first.

    The grouped shuffle is explicitly coarsened to defaultParallelism/4
    partitions: a Python-worker stage pays a per-task worker handshake +
    Arrow stream setup that a JVM stage doesn't, so tasks need enough
    groups each to amortize it — at 32 thread-local partitions over
    1500 users this fixed cost dominated (3.9s steady vs 0.8s at 8,
    measured r6; the r4->r5 'drift' was this, not noise). The divisor
    keeps partition count proportional to cluster size, so at scale it
    still fans out to thousands of tasks.

    round(sum, 2) in the body is exact because inputs are 2-decimal values
    and per-user groups are small (float error ≪ half a cent); the oracle
    accumulates in DECIMAL and lands on the same cents."""

    def user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL aggregate NULL semantics by hand: pandas sum() returns 0.0
        # and max() returns NaN over an all-NaN series, where SUM/MAX
        # must be NULL (allnull-replica catch) — NaN also hash-diverges
        # from NULL on the oracle side.
        vals = pdf["value"].dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [
                    round(float(vals.sum()), 2) if len(vals) else None
                ],
                "max_value": [float(vals.max()) if len(vals) else None],
            }
        )

    e = load_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    return (
        e.select("user_id", "value")
        .repartition(n_parts, "user_id")
        .groupBy("user_id")
        .applyInPandas(user_stats, schema)
    )


@query(
    "udtf_explode_tokens",
    oracle=r"""
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS token
    FROM documents
    """,
)
def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function surface: 1 document row -> N token rows via
    mapInPandas — an Arrow-batched table function: n input rows -> m
    output rows with no driver involvement and no shuffle; batch size is
    bounded by arrow.maxRecordsPerBatch so memory stays flat regardless of
    table size. The oracle is the engine-native unnest of the same
    whitespace tokenization."""

    def tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, toks = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue  # no tokens from a NULL document (r11)
                for tok in text.split():
                    ids.append(doc_id)
                    toks.append(tok)
            yield pd.DataFrame({"doc_id": ids, "token": toks})

    d = load_table(spark, sf_dir, "documents")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("token", T.StringType())]
    )
    return d.select("doc_id", "text").mapInPandas(tokenize_batches, schema)


@query(
    "fn_string_extended",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  ' || p_brand || '  ') AS trimmed,
           reverse(p_brand) AS rev_brand,
           repeat('-', 3) || p_type AS dashed,
           CAST(instr(p_name, 'a') AS INT) AS first_a,
           replace(p_brand, 'Brand#', 'B') AS short_brand
    FROM part
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: regexp_replace / lpad / trim / reverse /
    repeat / instr / replace — still all codegen'd JVM expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.reverse("p_brand").alias("rev_brand"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("p_type")).alias("dashed"),
        F.instr("p_name", "a").alias("first_a"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("short_brand"),
    )


@query(
    "fn_date_extended",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(o_orderdate + INTERVAL 3 MONTHS AS DATE) AS plus_3mo,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
    FROM orders
    """,
)
def fn_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch: quarter / add_months / last_day / date_format."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus_3mo"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "fn_null_semantics",
    oracle="""
    WITH enriched AS (
        SELECT o.o_orderkey, o.o_totalprice, c.c_acctbal
        FROM orders o
        LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
          ON o.o_custkey = c.c_custkey
    )
    SELECT o_orderkey,
           COALESCE(c_acctbal, 0.0) AS bal_or_zero,
           NULLIF(o_totalprice, 0.0) AS price_nullif,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS is_unmatched,
           CASE WHEN c_acctbal IS NULL THEN 'missing' ELSE 'present' END AS presence
    FROM enriched
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling functions over real join-produced NULLs: coalesce,
    nullif, null-safe equality (<=> / IS NOT DISTINCT FROM), CASE-on-null.
    Three-valued logic is where engines silently disagree — pinning it
    against an oracle is the point."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    enriched = o.join(
        F.broadcast(c.select("c_custkey", "c_acctbal")),
        o["o_custkey"] == c["c_custkey"],
        "left",
    )
    return enriched.select(
        "o_orderkey",
        F.coalesce("c_acctbal", F.lit(0.0)).alias("bal_or_zero"),
        F.nullif(F.col("o_totalprice"), F.lit(0.0)).alias("price_nullif"),
        F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")).alias("is_unmatched"),
        F.when(F.col("c_acctbal").isNull(), "missing").otherwise("present").alias("presence"),
    )


@query(
    "agg_collect_set",
    oracle="""
    -- FILTER (WHERE .. IS NOT NULL): Spark's collect_set EXCLUDES NULLs
    -- (an all-NULL group is the empty set: '' / 0), DuckDB's bare
    -- list(DISTINCT ..) would keep a NULL element (allnull-replica catch)
    SELECT o_orderpriority,
           coalesce(array_to_string(list_sort(
               coalesce(list(DISTINCT o_orderstatus)
                            FILTER (WHERE o_orderstatus IS NOT NULL),
                        CAST([] AS VARCHAR[]))), ','), '') AS statuses,
           CAST(len(coalesce(list(DISTINCT o_orderstatus)
                                 FILTER (WHERE o_orderstatus IS NOT NULL),
                             CAST([] AS VARCHAR[]))) AS INT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set into a SORTED, comma-joined string (collect order is
    nondeterministic across partitions — sort_array makes the value a
    contract, and array_join makes it a hashable scalar the correctness
    harness can canonicalize; an array column breaks pandas sort_values).
    Multi-valued feature shape for the feature store."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.size(F.collect_set("o_orderstatus")).alias("n_statuses"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_distance
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 1
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string similarity: nation-name pairs within
    Levenshtein distance 1 (single-character typos). The DP algorithm is exact integer arithmetic,
    so Spark and DuckDB agree bit-for-bit — unlike phonetic/jaro scores,
    which are implementation-defined. The quadratic self-join is guarded
    by the tiny dimension side (nation); for corpus-scale fuzzy matching
    the n-gram/LSH dedup operators (llm/dedup.py) generate candidates
    first and an edit-distance verify runs only on those."""
    n = load_table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("ka") < F.col("kb"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= 1)
        .select("name_a", "name_b", "edit_distance")
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & user_id AS b_and,
           event_id | user_id AS b_or,
           xor(event_id, user_id) AS b_xor,
           event_id << 3 AS shl,
           event_id >> 2 AS shr,
           CAST(bit_count(event_id) AS INT) AS pop
    FROM events
    WHERE event_id < 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function surface: AND/OR/XOR, shifts, popcount — exact
    integer ops with identical semantics on any engine (they underpin the
    SimHash fingerprint pipeline, where bit_count(xor) IS the Hamming
    distance). Filter keeps the oracle comparison small."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.col("user_id")).alias("b_and"),
        F.col("event_id").bitwiseOR(F.col("user_id")).alias("b_or"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("b_xor"),
        F.shiftleft("event_id", 3).alias("shl"),
        F.shiftright("event_id", 2).alias("shr"),
        F.bit_count("event_id").cast("int").alias("pop"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 100 = 0 THEN NULL
                ELSE CAST(floor(o_totalprice / (o_orderkey % 100) * 1000000)
                          AS BIGINT) END
               AS ratio_micros,
           TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS INT)
               AS parsed_key,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(o_orderkey * 2 AS BIGINT) END AS safe_double_key
    FROM orders
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide (NULL on zero denominator
    instead of an exception under ANSI mode or an Inf that poisons
    downstream aggregates), try_cast (NULL on malformed input — one bad
    row must not kill a 100 TB job), and try_multiply modeling guarded
    overflow (exercised via a predicate here since the test keys can't
    overflow BIGINT). The oracle spells each guard as the equivalent
    CASE expression — DuckDB's plain division/casts differ in failure
    behavior, which is exactly what the try_* family abstracts away
    (the to-number format carries 18 digits so keys parse at any scale
    factor; INT-range overflow then nulls identically on both engines).
    The quotient is floor-quantized to integer micros rather than
    round()-ed: both engines compute the identical IEEE quotient, but
    their round() tie rules differ (HALF_UP vs half-even) and divisions
    by small integers produce exact ties; floor of an identical double
    is identical."""
    o = load_table(spark, sf_dir, "orders")
    denom = F.col("o_orderkey") % 100
    return o.select(
        "o_orderkey",
        F.floor(F.try_divide(F.col("o_totalprice"), denom) * F.lit(1000000.0))
        .cast("long").alias("ratio_micros"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 7 == 0, "not-a-number")
            .otherwise(F.col("o_orderkey").cast("string")),
            F.lit("999999999999999999"),
        ).cast("int").alias("parsed_key"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.try_multiply(F.col("o_orderkey"), F.lit(2)).cast("long"))
        .alias("safe_double_key"),
    )


@query(
    "udtf_native_split",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         UNNEST(range(1, len(w) + 1)) t(i)
    """,
)
def udtf_native_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Python UDTF surface (Spark 4 `@udtf`, used via SQL
    LATERAL): a table function class whose eval() yields (pos, word)
    rows per input document — the fourth point of the UDF surface next
    to pandas_udf / applyInPandas / mapInPandas (udtf_explode_tokens is
    the mapInPandas formulation of the same semantics; this is the
    first-class UDTF API). The oracle regenerates the rows via UNNEST
    with ordinality, hash-verifying row fan-out, ordering metadata and
    values.

    Scale note: eval() runs row-at-a-time in Python — fine for genuine
    table-function semantics, but when the logic is expressible as
    explode()/higher-order functions those stay JVM-side and win
    (SURVEY §4); this entry pins the API surface, not a hot path."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return  # NULL document -> no rows (r11), like the
                        # oracle's UNNEST over a NULL-length range
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_words_udtf", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_native_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.word
        FROM udtf_native_docs d, LATERAL split_words_udtf(d.text) s
        """
    )


@query(
    "fn_regexp",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
               AS n_capitalized,
           regexp_extract(text, '[0-9]+') AS first_number,
           CAST(regexp_matches(text, '[0-9]') AS BOOLEAN) AS has_digits,
           substr(regexp_replace(text, '[aeiou]', '*', 'g'), 1, 40)
               AS masked40
    FROM documents
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: extract-all (vectorized token harvest),
    first-match extract, containment test, and global replace — the
    PII-scrub / pattern-mining workhorses. Patterns stay inside the
    character-class subset where Java regex (Spark) and RE2 (DuckDB)
    agree, which is also the subset that stays fast at 100 TB (no
    backtracking). All JVM-side; map-only.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("CAST(size(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)")
            .alias("n_capitalized"),
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.expr("text RLIKE '[0-9]'").alias("has_digits"),
        F.expr("substr(regexp_replace(text, '[aeiou]', '*'), 1, 40)").alias(
            "masked40"
        ),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           CAST(length(md5(text)) AS BIGINT) AS md5_len
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest functions (md5 / sha2-256) — the
    content-addressing primitives behind exact dedup, cache keys, and
    data-integrity manifests. Both engines emit lowercase hex, so the
    digests are value-checked verbatim (unlike xxhash64, whose seeds are
    engine-specific). JVM-side, map-only."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.length(F.md5("text")).cast("bigint").alias("md5_len"),
    )


@query(
    "fn_url",
    oracle=r"""
    WITH u AS (
        SELECT c_custkey,
               'https://' || lower(c_mktsegment) || '.example.com/c/'
                   || CAST(c_custkey AS VARCHAR) || '?seg='
                   || lower(c_mktsegment) || '&v=1' AS url
        FROM customer
    )
    SELECT c_custkey,
           -- Spark's parse_url returns NULL HOST for a malformed
           -- authority (leading dot from an empty segment, r11); the
           -- regex alone would happily extract '.example.com'
           CASE WHEN regexp_matches(url, '^[a-z]+://\.') THEN NULL
                ELSE regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)
           END AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]seg=([^&#]*)', 1) AS seg_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via parse_url — host/path/query-parameter/protocol
    extraction, the per-domain bucketing primitive behind web-corpus
    quality weighting and URL-level dedup (C4/RefinedWeb keep per-domain
    stats). URLs are constructed from customer columns so the oracle can
    verify the extraction with equivalent regexes (DuckDB has no
    parse_url); Spark-side uses the real parse_url builtin — JVM-side,
    map-only."""
    c = load_table(spark, sf_dir, "customer")
    u = c.select(
        "c_custkey",
        F.concat(
            F.lit("https://"), F.lower("c_mktsegment"), F.lit(".example.com/c/"),
            F.col("c_custkey").cast("string"), F.lit("?seg="),
            F.lower("c_mktsegment"), F.lit("&v=1"),
        ).alias("url"),
    )
    return u.select(
        "c_custkey",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'seg')").alias("seg_param"),
        F.expr("parse_url(url, 'PROTOCOL')").alias("protocol"),
    )
