"""Zipf-SKEWED replica builder (VERDICT r8 'do this' #2).

Every prior distribution the registry was adjudicated on — sf0.001/0.01/
0.1 and the 10x/100x clone replicas — preserves the generator's UNIFORM
key distribution (clones offset keys; they don't concentrate them). Real
100 TB corpora are zipfian: a handful of customers own a double-digit
share of orders, one supplier ships a tenth of all lineitems, one user
emits a tenth of the event stream, and the same few documents recur
thousands of times. This script builds that distribution from the
driver testdata so the FULL oracle gate (tests/harness.py) and the AQE
skew-join measurements can run against non-uniform keys — the one axis
the four green distributions never tested.

Shape:
- Dimension tables (region/nation/customer/supplier/part) are copied
  verbatim — fixed dims, growing skewed facts, the TPC-H scaling rule.
- Fact PRIMARY keys stay unique: with SKEW_CLONES>1 the facts are
  cloned with per-clone PK offsets first (the stress-replica recipe).
- Fact FOREIGN keys are then remapped through a deterministic in-plan
  zipf(1) sampler: u = (pmod(xxhash64(pk, seed), 1e6)+0.5)/1e6 is a
  per-row uniform, and floor(N**u)-1 maps it to a key in [0, N-1] with
  P(key = k) = log((k+2)/(k+1))/log(N) ~ 1/(k+1) — the classic zipf
  rank-frequency law. Crucially the remap runs AFTER cloning, so the
  hot keys stay hot as facts grow (cloning an already-skewed table
  with FK offsets would dilute the very skew under test).
    * orders.o_custkey   -> zipf over the customer span (hot customers;
      P(custkey=0) = log(2)/log(15000) ~ 7% of ALL orders at sf0.1)
    * lineitem.l_suppkey -> zipf over the supplier span (hot supplier
      takes ~10% of all lineitems at sf0.1's 1000-supplier dim)
    * lineitem.l_partkey -> zipf over the part span (hot parts)
    * events.user_id     -> zipf over the user span (one user owns
      ~9.5% of the stream -> one giant window/session partition)
- documents/embeddings get DUPLICATE-HEAVY tails: source row with key
  k < DUP_HEAD gains floor(DUP_HEAD/(k+1)) extra copies (zipf
  multiplicity: ~DUP_HEAD copies of the hottest doc, 1 extra for the
  DUP_HEAD-th). Odd-numbered document copies are PERTURBED (a short
  revision suffix, n_chars recomputed) so the near-dup routes
  (minhash/simhash/ngram-jaccard) see true near-matches, not only
  exact-dedup's identical copies; embedding copies are bit-identical
  vectors (exact vector dup). New PKs are offset past the cloned span
  and stay unique.

Determinism: every sampled value derives from xxhash64 of the row's
primary key and a fixed literal seed — no RNG, so the replica is
byte-stable across rebuilds and the oracle gate's Spark-vs-DuckDB
comparison runs on identical files.

Usage:
    python scripts/make_skewed_replica.py              # sf0.1 -> /tmp/spark_graft_zipf
    SKEW_CLONES=10 python scripts/make_skewed_replica.py   # 10x-zipf
    SKEW_SRC=/root/testdata/sf0.01 SKEW_DST=/tmp/z python ...

Then: python tests/harness.py --sf /tmp/spark_graft_zipf
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SRC = os.environ.get("SKEW_SRC", "/root/testdata/sf0.1")
CLONES = int(os.environ.get("SKEW_CLONES", "1"))
DST = os.environ.get(
    "SKEW_DST",
    "/tmp/spark_graft_zipf" + (f"_{CLONES}x" if CLONES > 1 else ""),
)
# Source rows with key < DUP_HEAD gain floor(DUP_HEAD/(key+1)) copies.
DOC_DUP_HEAD = int(os.environ.get("SKEW_DOC_DUP_HEAD", "50"))
VEC_DUP_HEAD = int(os.environ.get("SKEW_VEC_DUP_HEAD", "20"))

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def _unif(*cols, seed: int) -> Column:
    """Deterministic per-row uniform in (0, 1) from the row's PK."""
    return (
        (F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(1_000_000)) + 0.5)
        / 1_000_000.0
    )


def _zipf(u: Column, n: int) -> Column:
    """Map a uniform to a key in [0, n-1] with P(k) ~ 1/(k+1) (zipf s=1).

    floor(n**u) is log-uniform on [1, n]: P(floor = r) =
    log((r+1)/r)/log(n), the zipf(1) rank-frequency law up to the
    normalizing constant. least() guards the u -> 1 edge (n**1 = n).
    """
    return (
        F.least(F.lit(n - 1), (F.floor(F.pow(F.lit(float(n)), u)) - 1))
        .cast("long")
    )


def _span(spark, table: str, col: str) -> int:
    return load_table(spark, SRC, table).agg(F.max(col)).first()[0] + 1


def _clone(df: DataFrame, pk_offsets: dict[str, int]) -> DataFrame:
    """CLONES copies with disjoint PRIMARY-key spans (FKs untouched —
    they are remapped afterwards so skew concentrates, not dilutes)."""
    if CLONES <= 1:
        return df
    df = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(CLONES - 1)))
    )
    for col, span in pk_offsets.items():
        df = df.withColumn(col, F.col(col) + F.col("__r") * F.lit(int(span)))
    return df.drop("__r")


def _write(df: DataFrame, table: str) -> None:
    out = os.path.join(DST, f"{table}.parquet")
    df.write.mode("overwrite").parquet(out)
    print(f"  {table}: written", flush=True)


def copy_dim(table: str) -> None:
    out = os.path.join(DST, f"{table}.parquet")
    if os.path.exists(out):
        return
    src = os.path.join(SRC, f"{table}.parquet")
    try:
        os.link(src, out)
    except OSError:
        shutil.copy(src, out)


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark()
    for t in DIM_TABLES:
        copy_dim(t)

    n_cust = _span(spark, "customer", "c_custkey")
    n_supp = _span(spark, "supplier", "s_suppkey")
    n_part = _span(spark, "part", "p_partkey")
    o_span = _span(spark, "orders", "o_orderkey")
    n_user = _span(spark, "events", "user_id")

    orders = _clone(
        load_table(spark, SRC, "orders"), {"o_orderkey": o_span}
    ).withColumn(
        "o_custkey", _zipf(_unif(F.col("o_orderkey"), seed=101), n_cust)
    )
    _write(orders, "orders")

    li = _clone(
        load_table(spark, SRC, "lineitem"), {"l_orderkey": o_span}
    )
    li = li.withColumn(
        "l_suppkey",
        _zipf(_unif(F.col("l_orderkey"), F.col("l_linenumber"), seed=202), n_supp),
    ).withColumn(
        "l_partkey",
        _zipf(_unif(F.col("l_orderkey"), F.col("l_linenumber"), seed=303), n_part),
    )
    _write(li, "lineitem")

    ev = _clone(
        load_table(spark, SRC, "events"),
        {"event_id": _span(spark, "events", "event_id")},
    )
    if CLONES > 1:
        # keep clones inside the same hour buckets, off-by-seconds (the
        # stress-replica convention) so time windows stay populated
        ev = ev.withColumn(
            "ts",
            F.col("ts")
            + F.make_interval(
                secs=F.pmod(F.col("event_id"), F.lit(CLONES)).cast("double")
            ),
        )
    ev = ev.withColumn(
        "user_id", _zipf(_unif(F.col("event_id"), seed=404), n_user)
    )
    _write(ev, "events")

    d_span = _span(spark, "documents", "doc_id")
    docs = load_table(spark, SRC, "documents")
    base_docs = _clone(docs, {"doc_id": d_span})
    # zipf-multiplicity duplicates of the head of the ORIGINAL corpus;
    # copy ids packed per-source-doc (DUP_HEAD copies max < the 2x id
    # stride) past the cloned span so PKs stay unique.
    dup_src = docs.filter(F.col("doc_id") < DOC_DUP_HEAD).withColumn(
        "__c",
        F.explode(
            F.sequence(
                F.lit(1),
                F.floor(F.lit(DOC_DUP_HEAD) / (F.col("doc_id") + 1)).cast("int"),
            )
        ),
    )
    dup_docs = (
        dup_src.withColumn(
            "text",
            # odd copies are NEAR-dups (tiny revision suffix — shingles
            # overwhelmingly shared); even copies are exact dups
            F.when(
                F.pmod(F.col("__c"), F.lit(2)) == 1,
                F.concat(F.col("text"), F.lit(" rev"), F.col("__c")),
            ).otherwise(F.col("text")),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn(
            "doc_id",
            F.lit(d_span * CLONES)
            + F.col("doc_id") * (2 * DOC_DUP_HEAD)
            + F.col("__c"),
        )
        .drop("__c")
    )
    _write(base_docs.unionByName(dup_docs), "documents")

    v_span = _span(spark, "embeddings", "vec_id")
    emb = load_table(spark, SRC, "embeddings")
    base_emb = _clone(emb, {"vec_id": v_span})
    dup_emb = (
        emb.filter(F.col("vec_id") < VEC_DUP_HEAD)
        .withColumn(
            "__c",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.floor(
                        F.lit(VEC_DUP_HEAD) / (F.col("vec_id") + 1)
                    ).cast("int"),
                )
            ),
        )
        .withColumn(
            "vec_id",
            F.lit(v_span * CLONES)
            + F.col("vec_id") * (2 * VEC_DUP_HEAD)
            + F.col("__c"),
        )
        .drop("__c")
    )
    _write(base_emb.unionByName(dup_emb), "embeddings")

    # distribution summary — the evidence the replica is actually skewed
    for tbl, key in (
        ("orders", "o_custkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
    ):
        top = (
            spark.read.parquet(os.path.join(DST, f"{tbl}.parquet"))
            .groupBy(key)
            .count()
            .orderBy(F.desc("count"))
            .limit(3)
            .collect()
        )
        total = spark.read.parquet(os.path.join(DST, f"{tbl}.parquet")).count()
        shares = [f"{r[key]}:{r['count']}({r['count'] / total:.1%})" for r in top]
        print(f"  skew {tbl}.{key}: top3 {' '.join(shares)} of {total}")


if __name__ == "__main__":
    build()
    print(f"replica at {DST} (clones={CLONES}, src={SRC})")
