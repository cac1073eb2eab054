"""Entity resolution: blocked fuzzy matching without the all-pairs join.

The reference's feature pipeline assumes clean keys (customer_id joins,
notebooks/01 & 02); real 100 TB corpora arrive with dirty denormalized
attributes where "the same" entity appears under near-identical strings.
Record linkage at scale is always the same two moves:

1. **Blocking** — a cheap deterministic key (here: brand) so candidate
   pairs are generated per-block instead of corpus x corpus. The join is
   an equi-join Catalyst can hash-partition; the quadratic blowup is
   bounded by the largest block, never the whole table.
2. **Dictionary (distinct-value) canonicalization** — fuzzy-compare
   DISTINCT attribute values, not rows. Attribute domains are orders of
   magnitude smaller than row counts (64 distinct names across 2 000
   parts at sf0.01, same 64 at sf0.1's 20 000), so the expensive
   edit-distance predicate runs on the tiny name dimension and the
   row-level match count is recovered SYMBOLICALLY as the product of the
   two names' multiplicities — the quadratic entity-pair set is never
   materialized.

At 100 TB with a high-cardinality attribute, the block key widens
(brand + name-length band + first token, or multi-pass blocking unioning
several keys) — the plan shape is unchanged: distinct-dim self-join per
block, multiplicity product, no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table


@query(
    "join_entity_resolution",
    oracle="""
    WITH names AS (
        SELECT p_brand, p_name, CAST(count(*) AS BIGINT) AS n_entities
        FROM part GROUP BY p_brand, p_name
    )
    SELECT a.p_brand,
           a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance,
           CAST(a.n_entities * b.n_entities AS BIGINT) AS entity_pairs
    FROM names a JOIN names b
      ON a.p_brand = b.p_brand AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def join_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching over part names: within each brand
    block, every DISTINCT name pair at Levenshtein distance <= 2 is a
    match, and the number of row-level entity pairs it represents is the
    exact product of the two names' multiplicities.

    Matching is defined as (same block) AND (edit distance <= 2) in BOTH
    engines, so the oracle is exact — blocking recall loss (true matches
    split across blocks) is a property of the block key, not of this
    operator, and is recovered in production by unioning passes over
    independent keys.

    Plan: one groupBy builds the name dictionary (the only fact-table
    shuffle); the self-join runs on that dictionary — 64 rows here,
    bounded by the attribute domain at any corpus size — and levenshtein
    evaluates JVM-side inside the join filter. No row-level pair is ever
    produced; `entity_pairs` is arithmetic on the two counts.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand", "p_name")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("edit_distance"),
            (F.col("a.n_entities") * F.col("b.n_entities"))
            .cast("long")
            .alias("entity_pairs"),
        )
    )
