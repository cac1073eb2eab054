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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-13
# policy (VERDICT r12 'do this' #1 — finish the verdict rotation: retire
# the 27 r7-age keys, the merged ledger's oldest):
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r13: every query whose plan, oracle, or shared kernel
#      changed in the hot-dup (skew-of-duplicates) replica adjudication
#      or this round's fixes, PLUS the two r12-changed keys the r12 pass
#      missed (ADVICE r12 #1: feature_sessionize's oracle and tpch_q11's
#      semi->inner join changed in r12 but were absent from the r12
#      tier-1 list) — see ROUND13_NOTES.md;
#   2. ALL 27 r7-age keys (the merged ledger's oldest verdicts; after
#      this pass nothing in the ledger is older than r8);
#   3. the r8-age cohort head (35 keys; the remainder rolls to r14).
_HEADLINE = (
    "training_set_flagship",
)
_NEW_IN_R13 = (
    # r12-changed keys missed by the r12 rotation (ADVICE r12 #1)
    "feature_sessionize",
    "tpch_q11",
    # hot-dup (skew-of-duplicates) axis adjudications: set-metric recall
    # audit + computed-k oracles + MMR representative dedup + the
    # hard-negatives window-totality engine bug (ROUND13_NOTES.md)
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_ivf_quantized",
    "sim_mmr_diversify",
    "sample_hard_negatives",
    # NEW operator: real byte-level PPM encode/decode round-trip
    "mm_decode_ppm",
)
# ALL 27 r7-age keys (VERDICT r12 #1 names them; retire-priority)
_R7_COHORT = (
    "agg_incremental_state",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "cdf_snapshot_diff",
    "class_distribution",
    "dedup_simhash_audit",
    "dq_outlier_mad",
    "dtype_classification",
    "eval_metrics",
    "feature_quantile_bin",
    "feature_target_encoding_oof",
    "filter_in",
    "filter_like",
    "filter_pred",
    "fn_array",
    "fn_bitwise",
    "fn_case",
    "fn_levenshtein",
    "join_entity_resolution",
    "scan_json_nested",
    "scan_schema_evolution",
    "stream_session_parity",
    "stream_true_parity",
    "win_cumulative_distinct",
    "win_retention_cohorts",
)
# r8-age cohort in retire-priority order (the ~50-slot budget reaches
# the head; the tail rolls to r14's rotation)
_R8_COHORT = (
    "tpch_q1",
    "tpch_q17",
    "join_inner_hash",
    "join_broadcast",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_null_safe",
    "join_theta_range",
    "join_multiway_star",
    "join_lateral_topn",
    "join_left_lookup",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_distinct",
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
    "scalar_subquery",
    "scan_json",
    "scan_orc",
    "score_batch_replay",
    "set_intersect",
    "set_union_all",
    "sink_compact_smallfiles",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _NEW_IN_R13:
            return (1, _NEW_IN_R13.index(name), "")
        if name in _R7_COHORT:
            return (2, _R7_COHORT.index(name), "")
        if name in _R8_COHORT:
            return (3, _R8_COHORT.index(name), "")
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
