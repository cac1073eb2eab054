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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. After r6
# the merged r1-r6 verdicts are 0-red, but 33 queries' newest verdict is
# from r2 and 28 from r3 — before several testdata/session-conf changes
# (VERDICT r6 'do this' #1). Round-7 tiers:
#   0. new-in-r7, never driver-adjudicated: the simhash audit twin, the
#      true-streaming parity gate, the quantized-IVF ANN, blocked entity
#      resolution, incremental aggregate-state merge, small-file
#      compaction;
#      plus the second/third-wave r7 construction (entity resolution,
#      incremental agg state, compaction, CDF diff, OOF target
#      encoding, forward fill, schema evolution, incremental curation);
#   1. the r2 cohort — every query whose newest verdict is r2 — with
#      the shingle-pipeline dedup family contiguous at the tail so the
#      persisted index builds once inside the tier;
#   2. the r3 cohort, core relational shapes first;
#   3. everything else green and unchanged (r4-r6 verdicts), headline
#      shapes first. With a ~50-slot budget: the 26 never-adjudicated
#      r7 queries + the first ~24 of the r2 cohort land this round; the
#      r2 remainder (~9) and the r3 cohort (~28) rotate into r8
#      (never-adjudicated queries outrank stale-but-green by policy).
_NEW_IN_R7 = (
    "dedup_simhash_audit",
    "stream_true_parity",
    "sim_ivf_quantized",
    "join_entity_resolution",
    "agg_incremental_state",
    "sink_compact_smallfiles",
    "cdf_snapshot_diff",
    "feature_target_encoding_oof",
    "win_forward_fill",
    "scan_schema_evolution",
    "pipeline_incremental_curate",
    "pipeline_gdpr_delete",
    "feature_quantile_bin",
    "win_cumulative_distinct",
    "win_retention_cohorts",
    "densify_daily_spine",
    "stream_stateful_parity",
    "sim_mmr_diversify",
    "pipeline_dataset_mixture",
    "eval_auc_roc",
    "win_session_paths",
    "graph_jaccard_neighbors",
    "scan_csv_malformed_quarantine",
    "feature_rfm_segments",
    "win_first_touch_attribution",
    "agg_histogram_equiwidth",
    "stream_session_parity",
    "dq_outlier_mad",
    "scan_json_nested",
)
_R2_COHORT = (
    "agg_hash",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_heavy_hitters",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "class_distribution",
    "dtype_classification",
    "eval_metrics",
    "feature_importance",
    "filter_pred",
    "filter_in",
    "filter_like",
    "fn_array",
    "fn_bitwise",
    "fn_case",
    "fn_json",
    "fn_levenshtein",
    "fn_map",
    "fn_null_semantics",
    "fn_string",
    "fn_string_extended",
    "join_anti",
    "join_broadcast",
    "dedup_exact",
    "dedup_distinct",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_clusters",
)
_R3_COHORT = (
    "join_inner_hash",
    "join_left_lookup",
    "join_semi",
    "join_full_outer",
    "join_null_safe",
    "join_theta_range",
    "join_multiway_star",
    "join_lateral_topn",
    "project_exprs",
    "limit_topk",
    "scalar_subquery",
    "scan_csv_infer",
    "scan_json",
    "scan_orc",
    "set_union_all",
    "set_intersect",
    "set_except",
    "missing_value_scan",
    "mm_embedding_norm",
    "mm_binary_meta",
    "mm_frame_sample",
    "sim_cosine_topk",
    "sample_stratified_hash",
    "sample_weighted_bernoulli",
    "sample_quota_per_lang",
    "pipeline_clean_corpus",
    "pipeline_curate_corpus",
    "pack_sequences",
)
_HEADLINE = (
    "training_set_flagship",
    "training_set_point_in_time",
    "training_set_on_demand",
    "sink_feature_table",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _NEW_IN_R7:
            return (0, _NEW_IN_R7.index(name), "")
        if name in _R2_COHORT:
            return (1, _R2_COHORT.index(name), "")
        if name in _R3_COHORT:
            return (2, _R3_COHORT.index(name), "")
        if name in _HEADLINE:
            return (3, _HEADLINE.index(name), "")
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
