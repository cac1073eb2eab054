"""Adversarial edge-case replica builder (VERDICT r9 'do this' #1).

All six green distributions (sf0.001/0.01/0.1, uniform-10x, zipf-sf0.1,
zipf-10x) share the generator's BENIGN value domain: non-NULL join keys,
ASCII text, positive amounts, mid-range timestamps, well-formed JSON.
The classic cross-engine divergences live outside that domain:

- NULL join/group keys (join NULL-drop vs NULL-group semantics,
  window-frame null ordering — Spark NULLS FIRST asc vs DuckDB NULLS
  LAST default),
- dangling foreign keys (left-join NULL enrich vs inner-join drop),
- empty strings vs NULLs as distinct group keys,
- multi-byte unicode + CRLF (length/substr/regex code-unit vs
  codepoint semantics),
- negative/zero amounts (sign-sensitive math, div-by-zero guards),
- epoch-boundary and far-future timestamps (window bucketing,
  date_trunc, casts),
- malformed JSON (get_json_object NULL-on-bad vs json_extract
  raise-on-bad),
- zero-norm and NULL embedding vectors (0/0 -> NaN vs NULL).

This script injects ALL of those into deterministic xxhash-gated row
slices of the sf0.01 driver testdata, so the full oracle gate
(tests/harness.py) runs Spark and DuckDB on the SAME corrupted files —
any mismatch is a real cross-engine bug, not a data artifact.

Primary keys stay intact and unique (PK contracts are a feature, not a
target); region/nation stay verbatim (name-keyed joins like
tpch_q7's FRANCE/GERMANY need their domain).

Modes (ADV_MODE):
- content (default): the value-domain replica described above ->
  /tmp/spark_graft_adversarial
- empty:  every table written with 0 rows, schema preserved ->
  /tmp/spark_graft_empty
- single: every table truncated to its first row (PK order) ->
  /tmp/spark_graft_single
- hotdup: skew OF duplicates (VERDICT r12 'do this' #2) ->
  /tmp/spark_graft_hotdup. The dup mode spreads ~2% duplicates across
  MANY keys; this mode concentrates them: ONE key per table re-emitted
  ~1000x — a tie group larger than a window partition's comfort zone.
  Half the copies are FULL-ROW IDENTICAL (the r12 sessionize
  flag-pairing class: a second window pass over identical rows may
  pair state with a different copy per engine), half carry a
  copy-index-dependent payload (a 1000-way tie broken only by the
  payload: stresses window-order totality, WindowGroupLimit dedup,
  and every lexicographically-least representative rule). The hot
  lineitem key shares its l_orderkey with the hot orders key, so the
  orders-lineitem join fans ~1000x1000 — the hot-x-hot blow-up a
  skewed cluster would actually see. No dangling FKs and the benign
  value domain otherwise: the axis isolates duplicate SKEW (dup mode
  owns referential corruption; stack axes via ADV_SRC).
- dup:    referential/duplicate corruption (VERDICT r11 'do this' #3) ->
  /tmp/spark_graft_dup. The content mode deliberately KEEPS primary
  keys unique; this mode attacks exactly that invariant — the next
  untested input class after NULLs/unicode/degenerate-cardinality:
    * duplicate PKs in every keyed table (~2% of rows re-emitted with
      DIFFERENT non-key attributes, ~0.5% a second time -> triplicates),
      so any operator that assumes "PK unique -> 1:1 fan-out" (the
      flagship's feature join inherits this from the reference,
      SURVEY §1.3) or silently picks an arbitrary row per key
      (dropDuplicates vs DISTINCT-on-all-columns) diverges visibly;
    * dangling FKs: ~2% of lineitem.l_orderkey remapped past
      max(o_orderkey) (lineitem rows whose order does not exist) and
      ~2% of orders.o_custkey remapped past max(c_custkey). Values
      stay in the benign domain otherwise (no NULLs/unicode here —
      the axis isolates referential corruption; the content replica
      already covers value-domain corruption, and zipf x content
      covers the combination).

Determinism: every gated slice derives from xxhash64(PK, literal seed)
— no RNG; rebuilds are byte-stable. Every build stamps
``_recipe_fingerprint.json`` (sha256 of this file + mode + src) in the
replica dir so downstream gates rebuild on recipe change instead of
silently reusing a stale replica (ADVICE r11 #2).

Usage:
    python scripts/make_adversarial_replica.py
    ADV_MODE=empty python scripts/make_adversarial_replica.py
    ADV_MODE=single python scripts/make_adversarial_replica.py
    ADV_MODE=dup python scripts/make_adversarial_replica.py
    ADV_MODE=allnull python scripts/make_adversarial_replica.py
Then:
    python tests/harness.py --sf /tmp/spark_graft_adversarial
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import (  # noqa: E402
    TABLES,
    load_table,
)

SRC = os.environ.get("ADV_SRC", "/root/testdata/sf0.01")
MODE = os.environ.get("ADV_MODE", "content")
DST = os.environ.get(
    "ADV_DST",
    {
        "content": "/tmp/spark_graft_adversarial",
        "empty": "/tmp/spark_graft_empty",
        "single": "/tmp/spark_graft_single",
        "dup": "/tmp/spark_graft_dup",
        "hotdup": "/tmp/spark_graft_hotdup",
        "allnull": "/tmp/spark_graft_allnull",
    }[MODE],
)


def recipe_fingerprint(mode: str, src: str) -> str:
    """sha256 over this script's bytes + mode + src — the rebuild key."""
    import hashlib

    h = hashlib.sha256()
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(f.read())
    h.update(f"|mode={mode}|src={src}".encode())
    return h.hexdigest()


def _stamp_fingerprint() -> None:
    import json

    with open(os.path.join(DST, "_recipe_fingerprint.json"), "w") as f:
        json.dump(
            {"fingerprint": recipe_fingerprint(MODE, SRC),
             "mode": MODE, "src": SRC},
            f,
        )

EPOCH = "1970-01-01 00:00:00"
FAR_FUTURE = "2199-12-31 23:59:59.999999"
UNI_TEXT = " naïve café 日本語テキスト données ¡señor! 🚀🎉"
CRLF_PREFIX = "línea uno\r\nlínea dos\r\n"


def _hit(pk: Column, seed: int, permille: int) -> Column:
    """Deterministic boolean gate selecting ~permille/1000 of rows."""
    return F.pmod(F.xxhash64(pk, F.lit(seed)), F.lit(1000)) < permille


def _corrupt(df: DataFrame, pk: Column, col: str, edits) -> DataFrame:
    """Apply (seed, permille, value_expr) edits to `col`, first hit wins."""
    expr = F.col(col)
    # build from the last edit outward so the FIRST listed edit wins
    for seed, permille, value in reversed(edits):
        expr = F.when(_hit(pk, seed, permille), value).otherwise(expr)
    return df.withColumn(col, expr.cast(df.schema[col].dataType))


def _write(df: DataFrame, table: str) -> None:
    out = os.path.join(DST, f"{table}.parquet")
    df.write.mode("overwrite").parquet(out)
    print(f"  {table}: written ({MODE})", flush=True)


def _pk_col(table: str) -> str:
    return {
        "region": "r_regionkey",
        "nation": "n_nationkey",
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }[table]


def build_degenerate() -> None:
    """empty / single modes: schema-preserving 0-row / 1-row tables."""
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, SRC, t)
        if MODE == "empty":
            df = df.limit(0)
        else:
            df = df.orderBy(_pk_col(t)).limit(1)
        _write(df.coalesce(1), t)


def _dup_rows(df: DataFrame, pk: Column, seed: int, edits) -> DataFrame:
    """Append near-duplicates: ~2% of rows re-emitted with the listed
    (col, value_expr) attribute edits (PK VERBATIM — that's the attack),
    and ~0.5% of those re-emitted once more -> triplicates. The edits
    make the duplicates VISIBLY different, so an operator that picks an
    arbitrary row per key can no longer hide behind identical copies."""
    once = df.filter(_hit(pk, seed, 20))
    for col, value in edits:
        once = once.withColumn(col, value.cast(df.schema[col].dataType))
    twice = once.filter(_hit(pk, seed + 1, 250))  # 0.25 of the 2% slice
    return df.unionAll(once).unionAll(twice)


def build_dup() -> None:
    """dup mode: duplicate PKs + dangling FKs, benign value domain."""
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)

    # region/nation verbatim (name-keyed join domains, 5/25 rows)
    for t in ("region", "nation"):
        _write(load_table(spark, SRC, t), t)

    n_cust = (
        load_table(spark, SRC, "customer").agg(F.max("c_custkey")).first()[0]
        + 1
    )
    n_ord = (
        load_table(spark, SRC, "orders").agg(F.max("o_orderkey")).first()[0]
        + 1
    )

    cust = load_table(spark, SRC, "customer")
    pk = F.col("c_custkey")
    cust = _dup_rows(cust, pk, 101, [
        ("c_name", F.concat(F.col("c_name"), F.lit("~dup"))),
        ("c_acctbal", F.col("c_acctbal") + F.lit(1000.0)),
        ("c_mktsegment", F.lit("DUPLICATE")),
    ])
    _write(cust, "customer")

    supp = load_table(spark, SRC, "supplier")
    pk = F.col("s_suppkey")
    supp = _dup_rows(supp, pk, 111, [
        ("s_name", F.concat(F.col("s_name"), F.lit("~dup"))),
        ("s_acctbal", -F.col("s_acctbal")),
    ])
    _write(supp, "supplier")

    part = load_table(spark, SRC, "part")
    pk = F.col("p_partkey")
    part = _dup_rows(part, pk, 121, [
        ("p_name", F.concat(F.col("p_name"), F.lit("~dup"))),
        ("p_retailprice", F.col("p_retailprice") * F.lit(2.0)),
        ("p_size", F.col("p_size") + F.lit(100)),
    ])
    _write(part, "part")

    orders = load_table(spark, SRC, "orders")
    pk = F.col("o_orderkey")
    # dangling FK first (applies to base AND its duplicates uniformly —
    # the gate is keyed on the PK, so a duplicated order keeps the same
    # corrupted o_custkey in every copy)
    orders = _corrupt(orders, pk, "o_custkey", [
        (131, 20, F.lit(n_cust) + F.pmod(pk, F.lit(1000))),
    ])
    orders = _dup_rows(orders, pk, 132, [
        ("o_totalprice", F.col("o_totalprice") + F.lit(5000.0)),
        ("o_orderpriority", F.lit("6-DUPLICATE")),
    ])
    _write(orders, "orders")

    li = load_table(spark, SRC, "lineitem")
    pk = F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"))
    # dangling l_orderkey: the order this line belongs to does not exist
    li = _corrupt(li, pk, "l_orderkey", [
        (141, 20, F.lit(n_ord) + F.pmod(pk, F.lit(1000))),
    ])
    # duplicate composite PKs: same (l_orderkey, l_linenumber), altered
    # measures
    li = _dup_rows(li, pk, 142, [
        ("l_quantity", F.col("l_quantity") + F.lit(1.0)),
        ("l_extendedprice", F.col("l_extendedprice") * F.lit(2.0)),
    ])
    _write(li, "lineitem")

    ev = load_table(spark, SRC, "events")
    pk = F.col("event_id")
    ev = _dup_rows(ev, pk, 151, [
        ("value", F.col("value") + F.lit(10.0)),
        ("event_type", F.lit("duplicate")),
    ])
    _write(ev, "events")

    docs = load_table(spark, SRC, "documents")
    pk = F.col("doc_id")
    docs = _dup_rows(docs, pk, 161, [
        ("text", F.concat(F.col("text"), F.lit(" duplicated tail."))),
        ("source", F.lit("dup_source")),
    ])
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    _write(docs, "documents")

    emb = load_table(spark, SRC, "embeddings")
    pk = F.col("vec_id")
    emb = _dup_rows(emb, pk, 171, [
        ("embedding", F.transform(
            F.col("embedding"), lambda x: (-x).cast("float"))),
        ("label", F.lit(99)),
    ])
    _write(emb, "embeddings")

    # summary — evidence the corruption landed
    for t, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        df = spark.read.parquet(os.path.join(DST, f"{t}.parquet"))
        n = df.count()
        nk = df.select(key).distinct().count()
        print(f"  {t}: {n} rows, {nk} distinct {key} ({n - nk} extra)")


N_HOT = 1000  # total copies of each table's hot row (1 base + 999)


def _hot_dup(spark, df: DataFrame, pk_cols: list[str], edits) -> DataFrame:
    """Re-emit the row with the smallest PK N_HOT-1 more times: even
    copy indices VERBATIM (full-row identical duplicates — the pairing
    class), odd indices with (col, fn(i)) payload edits (a 1000-way PK
    tie broken only by the payload — the totality/representative
    class). Deterministic: hot row = min PK, edits are functions of the
    copy index, no RNG."""
    base = df.orderBy(*pk_cols).limit(1)
    i = F.col("__i")
    copies = base.crossJoin(spark.range(1, N_HOT).withColumnRenamed("id", "__i"))
    for col, fn in edits:
        copies = copies.withColumn(
            col,
            F.when(F.pmod(i, F.lit(2)) == 1, fn(i))
            .otherwise(F.col(col))
            .cast(df.schema[col].dataType),
        )
    return df.unionAll(copies.drop("__i"))


def _ihex(i: Column) -> Column:
    """Zero-padded copy-index tag — lexicographic order == numeric."""
    return F.lpad(i.cast("string"), 4, "0")


def build_hotdup() -> None:
    """hotdup mode: ONE key per table duplicated ~N_HOT x (skew OF
    duplicates, VERDICT r12 #2). Benign value domain, no dangling FKs —
    the axis isolates duplicate skew. The hot lineitem row keeps its
    l_orderkey == the hot orders PK (both are the table minimum), so
    orders x lineitem fans ~1000x1000 on that key: the hot-x-hot join
    blow-up plus window tie groups of 1000."""
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)

    for t in ("region", "nation"):
        _write(load_table(spark, SRC, t), t)

    cust = load_table(spark, SRC, "customer")
    cust = _hot_dup(spark, cust, ["c_custkey"], [
        ("c_name", lambda i: F.concat(F.col("c_name"), F.lit("~hot"), _ihex(i))),
        ("c_acctbal", lambda i: F.col("c_acctbal") + i),
    ])
    _write(cust, "customer")

    supp = load_table(spark, SRC, "supplier")
    supp = _hot_dup(spark, supp, ["s_suppkey"], [
        ("s_name", lambda i: F.concat(F.col("s_name"), F.lit("~hot"), _ihex(i))),
        ("s_acctbal", lambda i: F.col("s_acctbal") + i),
    ])
    _write(supp, "supplier")

    part = load_table(spark, SRC, "part")
    part = _hot_dup(spark, part, ["p_partkey"], [
        ("p_name", lambda i: F.concat(F.col("p_name"), F.lit("~hot"), _ihex(i))),
        ("p_retailprice", lambda i: F.col("p_retailprice") + i),
    ])
    _write(part, "part")

    orders = load_table(spark, SRC, "orders")
    orders = _hot_dup(spark, orders, ["o_orderkey"], [
        ("o_totalprice", lambda i: F.col("o_totalprice") + i),
        ("o_orderpriority", lambda i: F.concat(F.lit("7-HOT"), _ihex(i))),
    ])
    _write(orders, "orders")

    li = load_table(spark, SRC, "lineitem")
    li = _hot_dup(spark, li, ["l_orderkey", "l_linenumber"], [
        ("l_quantity", lambda i: F.col("l_quantity") + F.pmod(i, F.lit(40))),
        ("l_extendedprice", lambda i: F.col("l_extendedprice") + i),
    ])
    _write(li, "lineitem")

    ev = load_table(spark, SRC, "events")
    ev = _hot_dup(spark, ev, ["event_id"], [
        ("value", lambda i: F.col("value") + i),
        ("props", lambda i: F.concat(F.lit('{"hot":'), i.cast("string"),
                                     F.lit("}"))),
    ])
    _write(ev, "events")

    docs = load_table(spark, SRC, "documents")
    docs = _hot_dup(spark, docs, ["doc_id"], [
        ("text", lambda i: F.concat(F.col("text"), F.lit(" hot"), _ihex(i))),
        ("source", lambda i: F.lit("hot_source")),
    ])
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    _write(docs, "documents")

    emb = load_table(spark, SRC, "embeddings")
    emb = _hot_dup(spark, emb, ["vec_id"], [
        # scale preserves direction: 1000 cosine-identical vectors with
        # byte-distinct payloads (representative rules can't hide)
        ("embedding", lambda i: F.transform(
            F.col("embedding"),
            lambda x: (x * (F.lit(1.0) + i.cast("double") / F.lit(4000.0)))
            .cast("float"))),
        ("label", lambda i: F.pmod(i, F.lit(7))),
    ])
    _write(emb, "embeddings")

    for t, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        df = spark.read.parquet(os.path.join(DST, f"{t}.parquet"))
        n = df.count()
        nk = df.select(key).distinct().count()
        print(f"  {t}: {n} rows, {nk} distinct {key} ({n - nk} extra)")


# join/identity columns preserved by allnull mode: PKs + FKs, so every
# join still fans out at full cardinality while every PAYLOAD value is
# NULL. (empty/single cover degenerate CARDINALITY; this covers
# degenerate VALUES at full row counts — aggregates over nothing but
# NULL, windows ordered by NULL, text/embedding pipelines where every
# document/vector is NULL.)
_ALLNULL_KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def build_allnull() -> None:
    """allnull mode: keys intact, every payload column NULL — the
    degenerate-VALUE axis at full cardinality (fifteenth distribution,
    r14). Any operator whose oracle contract assumes >= 1 non-NULL
    payload value (a total computed as sum over an all-NULL column, a
    window ordered solely by a NULL timestamp, a division by a non-null
    count) diverges here."""
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, SRC, t)
        keep = _ALLNULL_KEEP[t]
        cols = [
            F.col(c) if c in keep
            else F.lit(None).cast(df.schema[c].dataType).alias(c)
            for c in df.columns
        ]
        _write(df.select(*cols), t)


def build_content() -> None:
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)

    # region/nation verbatim (name-keyed join domains)
    for t in ("region", "nation"):
        _write(load_table(spark, SRC, t), t)

    n_cust = (
        load_table(spark, SRC, "customer").agg(F.max("c_custkey")).first()[0]
        + 1
    )

    cust = load_table(spark, SRC, "customer")
    pk = F.col("c_custkey")
    cust = _corrupt(cust, pk, "c_name", [
        (41, 30, F.concat(F.col("c_name"), F.lit(UNI_TEXT))),
        (42, 10, F.lit("")),
    ])
    cust = _corrupt(cust, pk, "c_acctbal", [(43, 10, F.lit(0.0))])
    cust = _corrupt(cust, pk, "c_mktsegment", [
        (44, 20, F.lit(None)),
        (45, 20, F.lit("")),
    ])
    cust = _corrupt(cust, pk, "c_nationkey", [(46, 20, F.lit(None))])
    _write(cust, "customer")

    supp = load_table(spark, SRC, "supplier")
    pk = F.col("s_suppkey")
    supp = _corrupt(supp, pk, "s_name", [
        (51, 20, F.concat(F.lit(CRLF_PREFIX), F.col("s_name"))),
    ])
    supp = _corrupt(supp, pk, "s_nationkey", [(52, 20, F.lit(None))])
    _write(supp, "supplier")

    part = load_table(spark, SRC, "part")
    pk = F.col("p_partkey")
    part = _corrupt(part, pk, "p_name", [
        (61, 20, F.concat(F.col("p_name"), F.lit(UNI_TEXT))),
    ])
    part = _corrupt(part, pk, "p_type", [(62, 10, F.lit(""))])
    part = _corrupt(part, pk, "p_brand", [
        (63, 10, F.concat(F.lit("Brand%_#"), pk.cast("string"))),
    ])
    part = _corrupt(part, pk, "p_retailprice", [(64, 10, F.lit(0.0))])
    _write(part, "part")

    orders = load_table(spark, SRC, "orders")
    pk = F.col("o_orderkey")
    orders = _corrupt(orders, pk, "o_custkey", [
        (11, 100, F.lit(None)),                      # 10% NULL FK
        (12, 30, F.lit(n_cust) + F.pmod(pk, F.lit(1000))),  # 3% dangling
    ])
    orders = _corrupt(orders, pk, "o_totalprice", [
        (13, 20, F.lit(0.0)),
        (14, 20, -F.col("o_totalprice")),
    ])
    orders = _corrupt(orders, pk, "o_orderdate", [
        (15, 10, F.lit(EPOCH).cast("timestamp")),
        (16, 10, F.lit(FAR_FUTURE).cast("timestamp")),
    ])
    orders = _corrupt(orders, pk, "o_orderpriority", [
        (17, 20, F.lit("")),
        (18, 20, F.lit("0-ÜRGENT→🚀")),
    ])
    _write(orders, "orders")

    li = load_table(spark, SRC, "lineitem")
    pk = F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"))
    # Only true FKs are nulled; l_orderkey (half of the composite PK)
    # stays intact per the PK invariant above (ADVICE r10 item #4 — the
    # original seed-23 edit nulled it and made lineitem-keyed
    # mismatches ambiguous between data artifact and engine bug).
    li = _corrupt(li, pk, "l_suppkey", [(21, 70, F.lit(None))])
    li = _corrupt(li, pk, "l_partkey", [(22, 70, F.lit(None))])
    li = _corrupt(li, pk, "l_quantity", [(24, 20, F.lit(None))])
    li = _corrupt(li, pk, "l_extendedprice", [
        (25, 10, -F.col("l_extendedprice")),
    ])
    li = _corrupt(li, pk, "l_shipdate", [
        (26, 10, F.lit(EPOCH).cast("timestamp")),
        (27, 10, F.lit(FAR_FUTURE).cast("timestamp")),
    ])
    li = _corrupt(li, pk, "l_returnflag", [(28, 10, F.lit(""))])
    _write(li, "lineitem")

    ev = load_table(spark, SRC, "events")
    pk = F.col("event_id")
    ev = _corrupt(ev, pk, "user_id", [(31, 100, F.lit(None))])
    ev = _corrupt(ev, pk, "value", [(32, 50, F.lit(None))])
    ev = _corrupt(ev, pk, "ts", [
        (33, 5, F.lit(EPOCH).cast("timestamp")),
        (34, 5, F.lit(FAR_FUTURE).cast("timestamp")),
    ])
    ev = _corrupt(ev, pk, "event_type", [
        (35, 20, F.lit("")),
        (36, 20, F.lit("клик🚀")),
        (37, 20, F.lit(None)),
    ])
    ev = _corrupt(ev, pk, "props", [
        (38, 20, F.lit("")),
        (39, 10, F.lit("{broken json")),
        (40, 10, F.lit(None)),
    ])
    _write(ev, "events")

    docs = load_table(spark, SRC, "documents")
    pk = F.col("doc_id")
    docs = _corrupt(docs, pk, "text", [
        (71, 30, F.concat(F.col("text"), F.lit(UNI_TEXT))),
        (72, 20, F.concat(F.lit(CRLF_PREFIX), F.col("text"))),
        (73, 10, F.lit("")),
        (74, 10, F.lit(None)),
    ])
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    docs = _corrupt(docs, pk, "lang", [
        (75, 10, F.lit("")),
        (76, 10, F.lit("zz")),
    ])
    _write(docs, "documents")

    emb = load_table(spark, SRC, "embeddings")
    pk = F.col("vec_id")
    dim = F.size(F.col("embedding"))
    zero_vec = F.transform(
        F.sequence(F.lit(1), dim), lambda _: F.lit(0.0).cast("float")
    )
    emb = _corrupt(emb, pk, "embedding", [
        (81, 10, F.lit(None)),
        (82, 10, zero_vec),
    ])
    emb = _corrupt(emb, pk, "label", [(83, 10, F.lit(None))])
    _write(emb, "embeddings")

    # summary — evidence the corruption landed
    for t, col in (
        ("orders", "o_custkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
        ("documents", "text"),
        ("embeddings", "embedding"),
    ):
        df = spark.read.parquet(os.path.join(DST, f"{t}.parquet"))
        n = df.count()
        nulls = df.filter(F.col(col).isNull()).count()
        print(f"  {t}.{col}: {nulls}/{n} NULL ({nulls / n:.1%})")


if __name__ == "__main__":
    if MODE == "content":
        build_content()
    elif MODE == "dup":
        build_dup()
    elif MODE == "hotdup":
        build_hotdup()
    elif MODE == "allnull":
        build_allnull()
    else:
        build_degenerate()
    _stamp_fingerprint()
    print(f"replica at {DST} (mode={MODE}, src={SRC})")
