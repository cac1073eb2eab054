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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-8
# policy (VERDICT r7 'do this' #1 — finish the stale-verdict rotation;
# few new queries on purpose so the FULL 40-query r2/r3 stale cohort fits
# in one 50-slot round):
#   0. new-in-r8 or changed-in-r8: the two new queries (vacuum/retention,
#      the forced histogram-branch RFM twin) plus every query whose plan,
#      oracle, or shared helper changed this round (jaccard hub cap,
#      compaction contract, AUC nullif, RFM refactor, rolling NULL
#      semantics, quarantine cache release, run-scoped model path) —
#      changed queries must carry a FRESH verdict, not coast on r7's;
#   1. the r2 remainder — the 12 queries whose newest verdict is still
#      r2 — with the shingle-pipeline dedup family contiguous at the
#      tail so the persisted index builds once inside the tier;
#   2. the full r3 cohort (28), core relational shapes first;
#   3. the oldest r4 verdicts next (any budget beyond 49 starts
#      refreshing these), then headline shapes, then the rest.
#   => slots 1-49 retire every pre-r4 verdict; slot 50 begins the r4
#      rotation for r9.
_NEW_IN_R8 = (
    "sink_vacuum_retention",
    "feature_rfm_segments_hist",
    "graph_jaccard_neighbors",
    "sink_compact_smallfiles",
    "eval_auc_roc",
    "feature_rfm_segments",
    "feature_rolling_sum",
    "scan_csv_malformed_quarantine",
    "score_batch_replay",
    # late-r8 oracle-robustness fixes found by running the WHOLE oracle
    # gate on the 10x stress replica (a 4th data distribution): q1's
    # DuckDB decimal->double cast routed through VARCHAR (correct
    # rounding above 2^53 unscaled; bit-identical at every driver SF),
    # q17's oracle re-expressed as a window (planner-robust vs a
    # nested-loop re-plan on stats-less views). Changed oracles re-earn
    # their verdicts, so they join tier 0; the r3 cohort's tail may
    # slide past slot 50 into r9's rotation as a result.
    "tpch_q1",
    "tpch_q17",
)
_R2_STALE = (
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
# Newest verdict r4 — the next rotation cohort (r9); any round-8 budget
# past slot 49 starts here.
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
_HEADLINE = (
    "training_set_flagship",
    "training_set_point_in_time",
    "training_set_on_demand",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _NEW_IN_R8:
            return (0, _NEW_IN_R8.index(name), "")
        if name in _R2_STALE:
            return (1, _R2_STALE.index(name), "")
        if name in _R3_COHORT:
            return (2, _R3_COHORT.index(name), "")
        if name in _R4_COHORT:
            return (3, _R4_COHORT.index(name), "")
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
