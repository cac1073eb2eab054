"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``databricks_feature_store_poc_spark.registry`` — every
operator from SURVEY.md §2 registers itself there with its DuckDB oracle
adjacent to the Spark implementation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import (  # noqa: E402
    ensure_session_confs,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's training-set assembly (J1: spine LEFT JOIN broadcast
    feature tables; SURVEY.md §3 E2) transposed onto the testdata star
    schema.
    """
    ensure_session_confs(spark)
    load_all_queries()
    return QUERIES["training_set_flagship"](spark, "/root/testdata/sf0.001")


# The driver adjudicates ~50 queries per round in dict order, so the dict
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-9
# policy (VERDICT r8 'do this' #1 — rotate the 50-slot budget onto the
# r4+r5 cohorts so no verdict is older than r5):
#   0. new-in-r9 or changed-in-r9: every query whose plan, oracle, or
#      shared helper changed this round (the RFM branch-gate pin +
#      footer-metadata probe, plus anything the zipf-replica gate
#      surfaced) — changed queries must carry a FRESH verdict;
#   1. pack_sequences — the single r3-latest key (rows-only by design;
#      re-adjudicating re-prints no_oracle, but the ledger stops being
#      the one pre-r4 row) with its audit twin IMMEDIATELY adjacent so
#      the rows-only primary never carries a staler audit;
#   2. the full r4 cohort (29);
#   3. the r5 cohort (40) — audit twins and streaming first, the
#      remaining slots of the ~50 budget land here; the tail rolls to
#      r10's rotation.
_NEW_IN_R9 = (
    # rfm_segments changed: the registered ntile query now PINS its
    # branch with an explicit constant (immune to the
    # SPARK_GRAFT_RFM_NTILE_MAX env override, whose purpose is tuning
    # the library path), and the branch gate reads the customer row
    # count from parquet footers (a real metadata-only probe) instead
    # of a columnless count() scan. Both registered RFM queries share
    # that body, so both re-earn verdicts.
    "feature_rfm_segments",
    "feature_rfm_segments_hist",
    # the zipf-skew gate's one find: text_tfidf_audit's top-k witness
    # hard-coded a 3x tf bound that the smoothed-idf scoring does not
    # imply — the perturbed near-dup copies (rare revision tokens with
    # df=1 and maximal idf) broke it on 56 docs. The witness now uses
    # the theorem bound ln((N+1)/2)+1; changed audit re-earns its
    # verdict.
    "text_tfidf_audit",
    # the zipf PERF sweep's one find: stream_interval_join equi-joined
    # on user_id alone, so the hot user's pairs were scanned inside ONE
    # sort-merge key group — quadratic and AQE-irreducible (1.8 s ->
    # 63 s at 10x-zipf). Now joins on (user_id, hour_bucket) with the
    # signup side exploded over the two candidate buckets — exact, same
    # oracle, 63 s -> 6.3 s with output-proportional residual.
    "stream_interval_join",
    # the count form of the interval-overlap join no longer enumerates
    # pairs: rank decomposition over a broadcast daily cumulative table
    # (overlaps = #{l_start < o_end} - #{l_end <= o_start}) — the 10x
    # wall drops 148 s -> ~1 s and the 100x quadratic-output timeout
    # becomes 4.7 s; the enumeration core (interval_overlap_pairs)
    # stays, pinned against a naive crossJoin in tests/test_round9.py.
    "join_interval_overlap",
)
_R3_ROWSONLY = (
    "pack_sequences",
    "pack_sequences_audit",
)
# Newest verdict r4 — this round's main rotation cohort.
_R4_COHORT = (
    "sink_feature_table",
    "dedup_embedding_cosine",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_collect_set",
    "agg_corr_covar",
    "agg_cube",
    "fn_math",
    "mm_decode_stub",
    "sort_multi",
    "subquery_exists",
    "text_decontaminate",
    "text_fingerprint",
    "text_lang_dist",
    "text_langid",
    "text_ngrams",
    "text_pii_scrub",
    "text_quality_score",
    "text_stats",
    "text_tfidf_topterms",
    "text_token_count",
    "udf_scalar",
    "udtf_explode_tokens",
    "unpivot_melt",
    "win_distribution",
    "win_lag_lead",
    "win_rank",
    "win_running",
    "win_topk_per_group",
)
# Newest verdict r5 — remaining budget lands on this cohort's head;
# ordered: audit twins (rows-only primaries must never carry a staler
# audit than their family), streaming/stateful (the least
# SQL-redundant family), then feature/window/join shapes, then the
# TPC-H re-verifications (the most formulaic, safest to age one more
# round if the budget runs out).
_R5_COHORT = (
    "dedup_minhash_audit",
    "stream_dedup_exactly_once",
    "stream_interval_join",
    "stream_session",
    "stream_tumbling",
    "feature_resample_1h",
    "feature_rolling_hourly",
    "feature_sessionize",
    "feature_time_decay",
    "fn_try_arithmetic",
    "funnel_signup_purchase",
    "join_bucketed_colocated",
    "join_interval_overlap",
    "join_salted_skew",
    "rollup_incremental",
    "split_temporal",
    "text_span_dedup",
    "training_set_on_demand",
    "training_set_point_in_time",
    "udtf_native_split",
    "win_ntile_deciles",
    "agg_hll_sketch",
    "agg_mode_deterministic",
    "tpch_q2",
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
)
_HEADLINE = (
    "training_set_flagship",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _NEW_IN_R9:
            return (0, _NEW_IN_R9.index(name), "")
        if name in _R3_ROWSONLY:
            return (1, _R3_ROWSONLY.index(name), "")
        if name in _R4_COHORT:
            return (2, _R4_COHORT.index(name), "")
        if name in _R5_COHORT:
            return (3, _R5_COHORT.index(name), "")
        if name in _HEADLINE:
            return (4, _HEADLINE.index(name), "")
        return (5, 0, name)

    return sorted(names, key=tier)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "query_name", fn.__name__)
        return run

    return {name: _wrap(QUERIES[name]) for name in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    load_all_queries()
    return dict(ORACLES)
