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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-14
# policy (VERDICT r13 'do this' #3 — the changed-keys rule applied to
# LATE commits):
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r13-but-missed: every key whose oracle changed in the
#      late-r13 fleet-wide VARCHAR sum-cast commit (5c48018, after the
#      r13 tier-1 list was drawn) and was NOT in CORRECTNESS_r13 —
#      computed by diffing ORACLES at 5c48018^ vs HEAD against the r13
#      slot list (28 keys), plus any key changed in r14 itself;
#   2. the r8-age tail (20 keys — the merged ledger's oldest verdicts
#      after r13 retired r7; scalar_subquery is already in tier 1);
#   3. the r9-age cohort head (the ~50-slot budget reaches the first
#      few; the tail rolls to r15).
_HEADLINE = (
    "training_set_flagship",
)
_CHANGED_TIER = (
    # NEW in r14: second real codec round-trip (BMP — little-endian
    # struct headers, padded bottom-up rows, weighted checksum); the
    # hashing-trick featurizer; the integer-exact unigram surprisal
    # quality score
    "mm_decode_bmp",
    "mm_decode_wav",
    "feature_hash_vectorize",
    "text_surprisal_proxy",
    "text_zipf_fit",
    "text_bigram_pmi",
    "embed_pca_power",
    "analyze_table_stats",
    "join_asof_nearest",
    "graph_bfs_reach",
    # oracles/engines changed by the r14 allnull-replica adjudication
    # (15 fixes: NULL-contract alignments + 3 real engine bugs) — the
    # changed-keys rule says these MUST re-adjudicate this round
    "project_exprs",
    "agg_approx_percentile",
    "agg_collect_set",
    "feature_quantile_bin",
    "udaf_grouped",
    "eval_metrics",
    "stream_true_parity",
    "agg_incremental_state",
    "feature_rfm_segments_hist",
    "feature_rfm_segments",
    # oracles changed in 5c48018 (43 VARCHAR sum casts) not covered by
    # the r13 rotation (ADVICE r12 #1 class, applied to late commits)
    "agg_cube",
    "agg_hash",
    "agg_having",
    "feature_resample_1h",
    "feature_rolling_hourly",
    "feature_rolling_sum",
    "feature_time_decay",
    "join_bucketed_colocated",
    "join_dynamic_partition_pruning",
    "join_salted_skew",
    "rollup_incremental",
    "scalar_subquery",
    "stream_late_data",
    "stream_session",
    "stream_sliding",
    "stream_tumbling",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "win_running",
)
# r8-age tail (the merged ledger's oldest after the r13 pass; 21 keys
# minus scalar_subquery which tier 1 already covers)
_R8_COHORT = (
    "dedup_clusters",
    "dedup_distinct",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "fn_null_semantics",
    "fn_string_extended",
    "limit_topk",
    "missing_value_scan",
    "mm_binary_meta",
    "pipeline_curate_corpus",
    "project_exprs",
    "sample_quota_per_lang",
    "sample_stratified_hash",
    "sample_weighted_bernoulli",
    "scan_json",
    "scan_orc",
    "score_batch_replay",
    "set_intersect",
    "set_union_all",
    "sink_compact_smallfiles",
)
# r9-age cohort head, minus the 8 keys tier 1 already covers (the
# ~50-slot budget reaches the first; the tail rolls to r15)
_R9_COHORT = (
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_collect_set",
    "agg_corr_covar",
    "dedup_minhash_audit",
    "fn_math",
    "fn_try_arithmetic",
    "funnel_signup_purchase",
    "join_interval_overlap",
    "sink_feature_table",
    "sort_multi",
    "split_temporal",
    "stream_interval_join",
    "subquery_exists",
    "text_decontaminate",
    "text_lang_dist",
    "text_langid",
    "text_ngrams",
    "text_pii_scrub",
    "text_token_count",
    "unpivot_melt",
    "win_distribution",
    "win_rank",
    "win_topk_per_group",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _CHANGED_TIER:
            return (1, _CHANGED_TIER.index(name), "")
        if name in _R8_COHORT:
            return (2, _R8_COHORT.index(name), "")
        if name in _R9_COHORT:
            return (3, _R9_COHORT.index(name), "")
        return (4, 0, name)

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
