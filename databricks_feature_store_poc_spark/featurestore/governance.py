"""Right-to-be-forgotten deletion propagation across a keyed star schema.

A feature store that ingests user-keyed facts owes a governance
primitive the reference's managed platform provides operationally
(workspace-level user deletion): given a set of subject keys, purge
every row derived from those subjects across every table — including
tables that reference the subject only transitively (lineitem carries
no custkey; its membership flows through the deleted orders).

The scale-honest shape: the deletion set is tiny relative to the data
(a compliance batch, not a table), so every purge is ONE scan of each
fact with a broadcast hash anti-join — no fact-side shuffle, no second
pass. The transitive set (deleted order keys) is itself derived by a
broadcast semi-join before being broadcast in turn. At 100 TB each
table's purge is a map-only rewrite; when a deletion batch outgrows the
broadcast threshold AQE falls back to a shuffle anti-join without a
code change.

``propagate_deletions`` returns the retained view per table (what a
compliance rewrite would persist); ``pipeline_gdpr_delete`` registers
the audit summary — per-table before/purged/after counts plus an exact
BIGINT checksum over the retained primary keys, so the oracle verifies
not just HOW MANY rows survived but WHICH rows (a wrong anti-join that
kept the right count would still fail the checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


def propagate_deletions(
    tables: dict[str, tuple[DataFrame, str]],
    subject_keys: DataFrame,
    *,
    transitive: dict[str, tuple[DataFrame, str, str, str]] | None = None,
) -> dict[str, DataFrame]:
    """Anti-join ``subject_keys`` out of every table.

    ``tables`` maps name -> (df, subject_key_column) for tables that
    carry the subject key directly; ``transitive`` maps
    name -> (df, parent_table, parent_pk, child_fk) for tables whose
    membership is inherited from a parent's purge set instead — they
    get NO direct subject-key join (their key space is unrelated to the
    subject's; conflating the two would purge innocent rows on key
    collisions).

    Returns name -> retained DataFrame. The deletion set is broadcast;
    each retained view is a single map-side-filtered scan of its table.
    """
    keys = F.broadcast(subject_keys.toDF("__subject_key").distinct())
    retained: dict[str, DataFrame] = {}
    purged_parent_keys: dict[str, DataFrame] = {}
    for name, (df, key_col) in tables.items():
        retained[name] = df.join(
            keys, df[key_col] == keys["__subject_key"], "left_anti"
        )
        purged_parent_keys[name] = df.join(
            keys, df[key_col] == keys["__subject_key"], "left_semi"
        )
    for name, (df, parent, parent_pk, child_fk) in (transitive or {}).items():
        if parent not in purged_parent_keys:
            raise KeyError(f"transitive parent {parent!r} not in tables")
        parent_purged = F.broadcast(
            purged_parent_keys[parent].select(parent_pk).distinct()
        )
        retained[name] = df.join(
            parent_purged,
            df[child_fk] == parent_purged[parent_pk],
            "left_anti",
        )
    return retained


@query(
    "pipeline_gdpr_delete",
    oracle="""
    WITH del AS (
        SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM del)
    )
    SELECT 'customer' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM del)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM del)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM del)
                         THEN 0 ELSE c_custkey END) AS BIGINT)
               AS retained_pk_sum
    FROM customer
    UNION ALL
    SELECT 'orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM del)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM del)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM del)
                         THEN 0 ELSE o_orderkey END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
                         THEN 0 ELSE l_orderkey * 8 + l_linenumber END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IN (SELECT k FROM del)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IN (SELECT k FROM del)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IN (SELECT k FROM del)
                         THEN 0 ELSE event_id END) AS BIGINT)
    FROM events
    """,
)
def pipeline_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-propagation audit: purge a compliance batch of customers
    (every 97th key — deterministic, non-empty at all SFs) from the four
    subject-bearing tables and report, per table, rows before / purged /
    after plus an exact BIGINT sum over retained primary keys.

    lineitem is the transitive case: it carries no customer key, so its
    purge set is "lines of deleted orders" — the deleted-order keys are
    derived by one conditional pass over orders, then broadcast against
    lineitem. events joins on user_id (the testdata's user_id range is a
    subset of c_custkey, TESTDATA.md).

    Each table is scanned ONCE: the membership test is an IN-subquery
    in the projection — Spark plans it as a broadcast ExistenceJoin,
    which emits exactly one marker boolean per probe row REGARDLESS of
    duplicate keys in the deletion set (the r12 dup replica duplicated
    deletion-batch customers; the earlier LEFT-join-with-marker fanned
    every audited table out and inflated n_before — and deduping the
    probe first would cost a shuffle the existence join doesn't need).
    All four audit numbers fall out of one conditional aggregation —
    the same plan a real purge-rewrite would run, minus the write. The
    retained view itself (what you'd persist) is
    ``propagate_deletions``; the checksum pins that the membership test
    kept exactly the right rows, since a bug that preserved counts
    would still shift the pk sum. NULL subject keys are never members
    (SQL IN returns NULL -> retained), the same rule the oracle's IN
    applies.
    """
    for t in ("customer", "orders", "lineitem", "events"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__gdpr_{t}")

    del_sub = "SELECT c_custkey FROM __gdpr_customer WHERE c_custkey % 97 = 0"
    del_orders_sub = (
        f"SELECT o_orderkey FROM __gdpr_orders WHERE o_custkey IN ({del_sub})"
    )

    def audit_sql(tbl: str, key: str, pk_expr: str, probe_sub: str) -> str:
        return f"""
        SELECT '{tbl}' AS tbl,
               COUNT(*) AS n_before,
               CAST(SUM(CASE WHEN gone THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_purged,
               CAST(SUM(CASE WHEN gone THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_after,
               CAST(SUM(CASE WHEN gone THEN 0 ELSE {pk_expr} END) AS BIGINT)
                   AS retained_pk_sum
        FROM (SELECT *, {key} IN ({probe_sub}) AS gone FROM __gdpr_{tbl})
        """

    return (
        spark.sql(audit_sql("customer", "c_custkey", "c_custkey", del_sub))
        .unionByName(
            spark.sql(audit_sql("orders", "o_custkey", "o_orderkey", del_sub)))
        .unionByName(
            spark.sql(audit_sql(
                "lineitem", "l_orderkey",
                "l_orderkey * 8 + l_linenumber", del_orders_sub)))
        .unionByName(
            spark.sql(audit_sql("events", "user_id", "event_id", del_sub)))
    )
