"""Invariant tests for the curation operators (llm/curation.py).

The oracle-checked queries (decontaminate / quota / stratified) get
semantic spot-checks; pack_sequences was promoted to a FULL oracle in
r16 (md5 shard hash + recursive-CTE FFD replay), but the invariant
tests stay: partition of the corpus, capacity respected, determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.llm.curation import PACK_CONTEXT, PACK_SHARDS
from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from databricks_feature_store_poc_spark.sources.catalog import load_table
from tests.conftest import SF_TEST

load_all_queries()


def test_decontaminate_excludes_eval_and_flags_dups(spark):
    out = QUERIES["text_decontaminate"](spark, SF_TEST)
    rows = out.collect()
    # eval docs never appear in the output
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    # flag is consistent with the hit count
    assert all((r["n_hits"] > 0) == r["contaminated"] for r in rows)
    # an exact duplicate of an eval doc must be flagged: find one via
    # dedup_exact (keep groups with >1 member containing an eval doc)
    d = load_table(spark, SF_TEST, "documents")
    groups = (
        d.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    flagged = {r["doc_id"] for r in rows if r["contaminated"]}
    for g in groups:
        ids = g["ids"]
        if any(i % 97 == 0 for i in ids):
            for i in ids:
                if i % 97 != 0:
                    assert i in flagged, f"exact dup {i} of eval doc not flagged"


def test_quota_is_top_20pct_per_lang(spark):
    d = load_table(spark, SF_TEST, "documents")
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = QUERIES["sample_quota_per_lang"](spark, SF_TEST).collect()
    import math

    by_lang: dict[str, int] = {}
    for r in kept:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    for lang, total in totals.items():
        assert by_lang.get(lang, 0) == math.ceil(0.2 * total)


def test_stratified_rates_and_determinism(spark):
    out = QUERIES["sample_stratified_hash"](spark, SF_TEST)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and a
    # en kept at a visibly higher rate than other strata combined
    d = load_table(spark, SF_TEST, "documents")
    n_en = d.filter(F.col("lang") == "en").count()
    kept_en = out.filter(F.col("lang") == "en").count()
    n_other = d.filter(F.col("lang") != "en").count()
    kept_other = out.filter(F.col("lang") != "en").count()
    assert kept_en / n_en > kept_other / max(n_other, 1)


def test_pack_sequences_partition_capacity_determinism(spark):
    out = QUERIES["pack_sequences"](spark, SF_TEST)
    rows = out.collect()
    d = load_table(spark, SF_TEST, "documents")
    # every document exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in d.select("doc_id").collect()
    )
    # capacity: a bin either fits the context or holds a single oversized doc
    bins: dict[tuple, list[int]] = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r["n_tokens"])
    for (shard, bin_id), toks in bins.items():
        assert sum(toks) <= PACK_CONTEXT or len(toks) == 1
    # shards within range; bin ids dense from 0 per shard
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(PACK_SHARDS))
    per_shard: dict[int, set] = {}
    for (shard, bin_id) in bins:
        per_shard.setdefault(shard, set()).add(bin_id)
    for shard, ids in per_shard.items():
        assert ids == set(range(len(ids)))
    # determinism across executions
    again = {(r["doc_id"], r["shard"], r["bin_id"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["shard"], r["bin_id"]) for r in rows}


def _write_docs(spark, tmp_path, rows):
    """Stage a synthetic documents table (doc_id, text, lang, source,
    n_chars) so queries can run against inputs the fixtures lack."""
    df = spark.createDataFrame(
        [(i, t, lang, "srcX", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_survives_short_documents(spark, tmp_path):
    """Docs with fewer words than the n-gram width must yield zero
    shingles, not a slice() crash (doc 0 is the eval doc)."""
    sf = _write_docs(
        spark, tmp_path,
        [("one two three", "en"), ("a b", "en"),
         ("eight words are just enough for one shingle", "en"), ("", "de")],
    )
    rows = {r["doc_id"]: r["n_hits"] for r in
            QUERIES["text_decontaminate"](spark, sf).collect()}
    assert set(rows) == {1, 2, 3}  # eval doc 0 excluded; no crash
    assert all(v == 0 for v in rows.values())


def test_pack_sequences_oversized_bin_stays_closed(spark, tmp_path):
    """A zero-token doc must not join an oversized doc's bin — negative
    remaining capacity keeps that bin closed."""
    from databricks_feature_store_poc_spark.llm.curation import PACK_CONTEXT

    huge = " ".join(f"w{i}" for i in range(PACK_CONTEXT + 10))
    sf = _write_docs(
        spark, tmp_path,
        [(huge, "en"), ("", "en"), ("   ", "en"), ("small doc here", "en")],
    )
    rows = QUERIES["pack_sequences"](spark, sf).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3]
    bins: dict = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r["n_tokens"])
    for toks in bins.values():
        assert sum(toks) <= PACK_CONTEXT or len(toks) == 1


def test_check_referential_same_key_name(spark):
    """FKs whose fact and dim columns share a name must not be ambiguous."""
    from databricks_feature_store_poc_spark.featurestore.quality import (
        check_referential,
    )

    fact = spark.createDataFrame([(1,), (2,), (9,)], "user_id long")
    dim = spark.createDataFrame([(1,), (2,)], "user_id long")
    row = check_referential(fact, "user_id", dim, "user_id", "fk").collect()[0]
    assert row["metric"] == 1.0 and not row["passed"]


def test_weighted_bernoulli_parity_at_multibillion_ids(spark, tmp_path):
    """doc_ids beyond 2^31 must neither wrap Spark's non-ANSI multiply
    (which would silently disable sampling) nor overflow DuckDB (which
    raises): the mod-prime pre-reduction keeps both engines exact and
    identical — regression for the Knuth-multiply overflow."""
    import duckdb

    from databricks_feature_store_poc_spark.registry import ORACLES, QUERIES

    rows = [(3_500_000_000 + i * 977_777_777, "word " * (5 + 40 * (i % 7)))
            for i in range(40)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    srows = sorted(
        map(tuple, QUERIES["sample_weighted_bernoulli"](
            spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    drows = sorted(
        map(tuple, con.sql(ORACLES["sample_weighted_bernoulli"]).fetchall())
    )
    con.close()
    assert srows == drows
    assert 0 < len(srows) < len(rows)  # sampling actually sampled
