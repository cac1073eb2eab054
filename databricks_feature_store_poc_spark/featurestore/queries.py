"""Flagship feature-store queries over the driver testdata.

The flagship transposes the reference's E2 training-set assembly
(SURVEY.md §3: ``labels LEFT JOIN customer_features USING(customer_id)
LEFT JOIN product_features USING(product_id)``, notebooks/
02_model_training.py:242-247) onto the TPC-H-ish testdata: spine =
``orders``, feature tables = ``customer`` (features ``c_acctbal``,
``c_mktsegment``, key ``o_custkey``) and ``nation`` reached through the
customer (categorical ``n_name``) — the mapping documented in
FIXTURES.md §B.

Physical shape at scale: the spine (orders — the 100 TB fact side) never
shuffles; both feature tables are dimension-sized and broadcast, so the
whole training-set assembly is a map-only pipeline over the spine scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)
from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


@query(
    "training_set_flagship",
    oracle="""
    SELECT o.o_orderkey,
           o.o_totalprice,
           o.o_orderstatus,
           c.c_acctbal,
           c.c_mktsegment,
           n.n_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def training_set_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference J1 (create_training_set) on the testdata star schema.

    Two chained FeatureLookups: orders -> customer features, then
    customer.c_nationkey -> nation categorical. ``exclude_columns`` drops
    the intermediate join keys, exactly like the reference drops
    customer_id/product_id (02:69,246). ``o_totalprice`` plays the
    passthrough role of ``on_sales``; ``o_orderstatus`` the label.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    spine = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    lookups = [
        FeatureLookup(
            table_name="customer",
            feature_names=("c_acctbal", "c_mktsegment", "c_nationkey"),
            lookup_key=("c_custkey",),
            spine_keys=("o_custkey",),
        ),
        FeatureLookup(
            table_name="nation",
            feature_names=("n_name",),
            lookup_key=("n_nationkey",),
            spine_keys=("c_nationkey",),
        ),
    ]
    tables = {"customer": customer, "nation": nation}
    ts = create_training_set(
        spark,
        spine,
        lookups,
        label="o_orderstatus",
        exclude_columns=["o_custkey", "c_nationkey"],
        resolve_table=tables.__getitem__,
    )
    return ts.load_df().select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        "c_acctbal",
        "c_mktsegment",
        "n_name",
    )


@query(
    "training_set_on_demand",
    oracle="""
    SELECT o.o_orderkey,
           o.o_totalprice,
           c.c_acctbal,
           c.c_mktsegment,
           round(o.o_totalprice / nullif(c.c_acctbal, 0), 6) + 0.0
               AS price_to_balance,
           o.o_totalprice > 200000 AS is_high_value,
           substr(c.c_mktsegment, 1, 2) AS segment_code
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def training_set_on_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-demand features at lookup time: expressions over spine +
    looked-up columns appended inside the SAME Catalyst plan as the
    lookups (the feature-store concept for features derivable only from
    request context — ratios, flags, encodings — that no precomputed
    table can hold). Train and serve evaluate the identical expression
    string, which is the on-demand consistency guarantee; the oracle
    replays lookup + expressions in SQL, value-checking all three
    computed features (guarded ratio, boolean flag, derived code).

    Scale: identical to the flagship — broadcast lookups, map-only over
    the spine; the on-demand projection adds zero passes."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spine = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    lookups = [
        FeatureLookup(
            table_name="customer",
            feature_names=("c_acctbal", "c_mktsegment"),
            lookup_key=("c_custkey",),
            spine_keys=("o_custkey",),
        ),
    ]
    ts = create_training_set(
        spark,
        spine,
        lookups,
        exclude_columns=["o_custkey"],
        resolve_table={"customer": customer}.__getitem__,
        on_demand_features={
            "price_to_balance": "round(o_totalprice / nullif(c_acctbal, 0), 6) + 0.0",  # + 0.0 folds IEEE -0.0 (0/negative) to 0.0 on both engines
            "is_high_value": "o_totalprice > 200000",
            "segment_code": "substr(c_mktsegment, 1, 2)",
        },
    )
    return ts.load_df().select(
        "o_orderkey",
        "o_totalprice",
        "c_acctbal",
        "c_mktsegment",
        "price_to_balance",
        "is_high_value",
        "segment_code",
    )


@query(
    "training_set_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT DISTINCT user_id, ts AS fts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS balance
        FROM events
    ),
    spine AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT s.event_id, s.user_id, s.ts, v.balance
    FROM spine s
    ASOF LEFT JOIN versions v
      ON s.user_id = v.user_id AND s.ts >= v.fts
    """,
)
def training_set_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training set: each purchase event is enriched with the
    user's running balance AS OF that moment — the latest feature version
    with version_ts <= spine_ts, never a future one (label-leakage
    safety, the capability Databricks exposes as FeatureLookup
    `timestamp_lookup_key`).

    The feature table is itself versioned data: one (user, ts, balance)
    row per balance change, built with a RANGE-frame running sum (peers at
    equal ts share a value, so DISTINCT makes versions unique and the
    as-of pick unambiguous). The oracle is DuckDB's native ASOF LEFT JOIN;
    the Spark side compiles to the union + running-carry-forward plan in
    lookup._apply_point_in_time_lookup — one shuffle, linear, no per-row
    range probe.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    versions = (
        events.select(
            "user_id",
            F.col("ts").alias("fts"),
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            .alias("balance"),
        )
        .distinct()
    )
    spine = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    lookups = [
        FeatureLookup(
            table_name="user_balance_versions",
            feature_names=("balance",),
            lookup_key=("user_id",),
            spine_keys=("user_id",),
            timestamp_lookup_key=("ts", "fts"),
        )
    ]
    ts = create_training_set(
        spark, spine, lookups,
        resolve_table={"user_balance_versions": versions}.__getitem__,
    )
    return ts.load_df().select("event_id", "user_id", "ts", "balance")


@query(
    "training_set_pit_on_demand",
    oracle="""
    WITH versions AS (
        SELECT DISTINCT user_id, ts AS fts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS balance
        FROM events
    ),
    spine AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    pit AS (
        SELECT s.event_id, s.user_id, s.ts, s.value, v.balance
        FROM spine s
        ASOF LEFT JOIN versions v
          ON s.user_id = v.user_id AND s.ts >= v.fts
    )
    SELECT event_id, user_id, ts, value, balance,
           round(value / nullif(balance, 0), 6) AS value_to_balance,
           balance >= value AS is_funded
    FROM pit
    """,
)
def training_set_pit_on_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition no single query exercised jointly (VERDICT r5 #8):
    on-demand features computed OVER a point-in-time lookup in one
    training set — the serve-time shape of a real feature platform,
    where request-context expressions reference leak-safe as-of feature
    values. Each purchase event gets the user's balance as of that
    moment via timestamp_lookup_key, then two on-demand expressions
    derive from spine + PIT columns inside the same Catalyst plan
    (spend-to-balance ratio, funded flag). The oracle replays ASOF LEFT
    JOIN + the expressions in SQL, value-checking the whole composition.

    Scale: identical to the PIT query — union + running-carry-forward,
    one shuffle on (user_id); the on-demand projection adds zero passes
    over the fact side."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    versions = (
        events.select(
            "user_id",
            F.col("ts").alias("fts"),
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            .alias("balance"),
        )
        .distinct()
    )
    spine = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    lookups = [
        FeatureLookup(
            table_name="user_balance_versions",
            feature_names=("balance",),
            lookup_key=("user_id",),
            spine_keys=("user_id",),
            timestamp_lookup_key=("ts", "fts"),
        )
    ]
    ts = create_training_set(
        spark, spine, lookups,
        resolve_table={"user_balance_versions": versions}.__getitem__,
        on_demand_features={
            "value_to_balance": "round(value / nullif(balance, 0), 6)",
            "is_funded": "balance >= value",
        },
    )
    return ts.load_df().select(
        "event_id", "user_id", "ts", "value", "balance",
        "value_to_balance", "is_funded",
    )


def _bpe_features_oracle() -> str:
    from databricks_feature_store_poc_spark.llm.text import (
        BPE_MERGES,
        _bpe_oracle,
        _DUCK_WORDS,
    )

    return (
        _bpe_oracle(BPE_MERGES)
        + f"""
    , tok AS (
        SELECT word,
               CAST(len(list_filter(string_split(trim(sym), ' '),
                                    x -> x != '')) AS BIGINT) AS n_tokens
        FROM s{BPE_MERGES}
    ),
    occ AS (
        SELECT doc_id, word
        FROM (SELECT doc_id, unnest({_DUCK_WORDS}) AS word FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$')
    ),
    per_doc AS (
        SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_alpha_words,
               CAST(SUM(t.n_tokens) AS BIGINT) AS n_bpe_tokens
        FROM occ o JOIN tok t USING (word)
        GROUP BY o.doc_id
    )
    SELECT d.doc_id, d.n_chars,
           CAST(coalesce(p.n_alpha_words, 0) AS BIGINT) AS n_alpha_words,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           round(coalesce(p.n_bpe_tokens, 0) * 1.0
                 / nullif(coalesce(p.n_alpha_words, 0), 0), 6) + 0.0
               AS bpe_tokens_per_word,
           coalesce(p.n_bpe_tokens, 0) > coalesce(p.n_alpha_words, 0) * 2
               AS is_token_heavy
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """
    )


@query("training_set_bpe_features", oracle=_bpe_features_oracle())
def training_set_bpe_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store <-> tokenizer composition end-to-end (VERDICT r16
    #7): the r16 BPE tokenizer's per-doc token counts consumed as a
    FEATURE TABLE by create_training_set, with on-demand features
    derived from them at lookup time — documents spine, bpe_doc_features
    lookup (itself fed by the FeatureStore-persisted merge table, S5/S8),
    two on-demand expressions (the fertility ratio tokens-per-word and a
    token-heavy flag) evaluated inside the same Catalyst plan.

    ``use_broadcast=False``: unlike the flagship's dimension lookups,
    this feature table is CORPUS-sized (one row per distinct doc), so
    the honest 100 TB plan is a co-partitioned hash join on doc_id (AQE
    picks the strategy; bucket both sides on doc_id to make repeated
    builds shuffle-free), not a broadcast of the corpus.

    The oracle replays the full unrolled BPE learn + tokenize + lookup +
    on-demand expressions in SQL — token counts AND derived features are
    hash-adjudicated."""
    from databricks_feature_store_poc_spark.llm.text import bpe_doc_features

    d = load_table(spark, sf_dir, "documents")
    spine = d.select("doc_id", "n_chars")
    feats = bpe_doc_features(spark, sf_dir)
    lookups = [
        FeatureLookup(
            table_name="bpe_doc_features",
            feature_names=("n_alpha_words", "n_bpe_tokens"),
            lookup_key=("doc_id",),
        )
    ]
    ts = create_training_set(
        spark,
        spine,
        lookups,
        resolve_table={"bpe_doc_features": feats}.__getitem__,
        use_broadcast=False,
        on_demand_features={
            # 1.0D / 0.0D: double literals — a bare 1.0 parses as
            # DECIMAL(2,1) in Spark SQL and long*decimal stays DECIMAL,
            # tripping the no-DECIMAL-output driver contract
            "bpe_tokens_per_word": (
                "round(coalesce(n_bpe_tokens, 0) * 1.0D"
                " / nullif(coalesce(n_alpha_words, 0), 0), 6) + 0.0D"
            ),
            "is_token_heavy": (
                "coalesce(n_bpe_tokens, 0) > coalesce(n_alpha_words, 0) * 2"
            ),
        },
    )
    return ts.load_df().select(
        "doc_id",
        "n_chars",
        F.coalesce("n_alpha_words", F.lit(0)).cast("long").alias(
            "n_alpha_words"
        ),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
            "n_bpe_tokens"
        ),
        "bpe_tokens_per_word",
        "is_token_heavy",
    )
