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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-12
# policy (VERDICT r11 'do this' #1 — verdict rotation: retire the r6
# tail, then the r7 cohort head):
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r12: every query whose plan, oracle, or shared kernel
#      changed in the dup-PK/dangling-FK replica adjudication or the
#      resample short-circuit, plus the two NEW referential-integrity
#      audits the axis motivated (23 keys — see ROUND12_NOTES.md);
#   2. ALL 21 r6-age keys (the merged ledger's oldest verdicts);
#   3. the r7-age cohort head (the remainder rolls to r13).
_HEADLINE = (
    "training_set_flagship",
)
_NEW_IN_R12 = (
    # NEW operators this round (featurestore/quality.py): referential-
    # integrity audits born from the dup-PK/dangling-FK axis
    "dq_pk_violations",
    "dq_fk_orphans",
    # span-probe short-circuit (operators/rolling.py)
    "feature_resample_1h",
    # NaN-input pin (functions/scalar.py, ADVICE r11 #3)
    "udf_scalar",
    # window-order totality under duplicate PKs
    "win_running",
    "win_lag_lead",
    "win_forward_fill",
    "win_session_paths",
    "win_first_touch_attribution",
    # prefix-sum multiplicity (operators/rolling.py)
    "feature_rolling_sum",
    # set/join/membership semantics under duplicate keys
    "set_except",
    "tpch_q8",
    "pipeline_gdpr_delete",
    # ANSI-cast robustness (llm/curation.py)
    "pipeline_dataset_mixture",
    # deterministic key-dedup representatives
    "stream_dedup_exactly_once",
    "cluster_kmeans",
    "dedup_semantic_cluster",
    "embed_gram_matrix",
    "mm_embedding_norm",
    "scan_binary_files",
    # doc-identity merge pins (llm/text.py, llm/curation.py)
    "text_span_dedup",
    "text_tfidf_audit",
    "pack_sequences_audit",
)
# ALL 21 r6-age keys (VERDICT r11 #1 names them; retire-priority)
_R6_COHORT = (
    "dq_expectations",
    "feature_drift_chi2",
    "dq_outlier_zscore",
    "dq_benford_digits",
    "fn_date",
    "fn_date_extended",
    "fn_regexp",
    "fn_hash",
    "udaf_grouped",
    "text_bloom_decontaminate",
    "text_repetition_score",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "scan_parquet",
    "scan_python_datasource",
    "split_hash_8020",
    "split_kfold",
    "win_streaks",
)
# r7-age cohort in retire-priority order (the ~50-slot budget reaches
# the head; the tail rolls to r13's rotation)
_R7_COHORT = (
    "agg_hash",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram_equiwidth",
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
    "pipeline_dataset_mixture",
    "pipeline_gdpr_delete",
    "scan_json_nested",
    "scan_schema_evolution",
    "stream_session_parity",
    "stream_true_parity",
    "win_cumulative_distinct",
    "win_first_touch_attribution",
    "win_forward_fill",
    "win_retention_cohorts",
    "win_session_paths",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _NEW_IN_R12:
            return (1, _NEW_IN_R12.index(name), "")
        if name in _R6_COHORT:
            return (2, _R6_COHORT.index(name), "")
        if name in _R7_COHORT:
            return (3, _R7_COHORT.index(name), "")
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
