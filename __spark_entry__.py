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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-10
# policy (VERDICT r9 'do this' #2 — rotate the 50-slot budget onto the
# r5+r6 cohorts so CORRECTNESS_r10 leaves zero verdicts older than r6):
#   0. new-in-r10 or changed-in-r10: every query whose plan, oracle, or
#      shared helper changed this round — changed queries must carry a
#      FRESH verdict;
#   1. the full r5-latest cohort (22 keys — merged-ledger oldest after
#      the r9 rotation; mostly TPC-H);
#   2. the head of the r6-latest cohort (48 keys total) — the remaining
#      slots of the ~50 budget land here, ordered audit-adjacent /
#      streaming / complex-plan first; the TPC-H tail rolls to r11.
_NEW_IN_R10 = (
    # parquet_row_count (sources/catalog.py) gained the None-on-empty
    # contract fix (ADVICE r9 medium): a partitioned/nested dataset dir
    # with no top-level .parquet parts now returns None (-> columnless
    # count() fallback) instead of a false 0. Both RFM queries and the
    # tfidf audit route their cardinality gates through it, so all
    # three re-earn verdicts.
    "feature_rfm_segments",
    "feature_rfm_segments_hist",
    "text_tfidf_audit",
    "text_tfidf_topterms",
    # versioned.py read() now closes the last concurrent-prune window
    # (ADVICE r9 low): the final eager parquet read is wrapped in a
    # re-resolve-once-then-clean-error retry. sink_vacuum_retention is
    # the registered query over that path.
    "sink_vacuum_retention",
    # NEW in r10: statistic variants of the two remaining 100x
    # quadratic-OUTPUT queries (VERDICT r9 'do this' #4) — cluster-size
    # histogram for embedding near-dup (no pair enumeration) and gram
    # row-norm summary (no cell enumeration).
    "dedup_embedding_stats",
    "embed_gram_norms",
)
# r5-latest cohort — this round's main rotation target (22 keys,
# enumerated from the merged r1-r9 ledger; zero keys older than r5
# remain after the r9 rotation).
_R5_COHORT = (
    "training_set_on_demand",
    "training_set_point_in_time",
    "agg_hll_sketch",
    "agg_mode_deterministic",
    "text_span_dedup",
    "udtf_native_split",
    "win_ntile_deciles",
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
# r6-latest cohort (48 keys) — remaining budget lands on the head;
# ordered: streaming/stateful and sketch/cluster plans first (least
# SQL-redundant), then joins/sinks/features, then scalar fns, with the
# TPC-H re-verifications last (most formulaic, safest to age a round).
_R6_COHORT = (
    "stream_late_data",
    "stream_sliding",
    "dedup_semantic_cluster",
    "cluster_kmeans",
    "embed_gram_matrix",
    "embed_quantize_int8",
    "graph_pagerank",
    "agg_bloom_filter",
    "agg_countmin_sketch",
    "agg_latency_bands",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_range_search",
    "sample_hard_negatives",
    "join_asof",
    "join_dynamic_partition_pruning",
    "merge_scd1_upsert",
    "merge_scd2_history",
    "sink_partitioned_pruned",
    "sink_sorted_parquet",
    "sink_zorder",
    "split_hash_8020",
    "split_kfold",
    "win_streaks",
    "dq_benford_digits",
    "dq_expectations",
    "dq_outlier_zscore",
    "feature_drift_chi2",
    "text_bloom_decontaminate",
    "text_chunk_sliding",
    "text_repetition_score",
    "scan_binary_files",
    "scan_parquet",
    "scan_python_datasource",
    "scan_text_lines",
    "training_set_flagship",
    "training_set_pit_on_demand",
    "udaf_grouped",
    "fn_date",
    "fn_date_extended",
    "fn_hash",
    "fn_regexp",
    "fn_url",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
)
_HEADLINE = (
    "training_set_flagship",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _NEW_IN_R10:
            return (0, _NEW_IN_R10.index(name), "")
        if name in _R5_COHORT:
            return (1, _R5_COHORT.index(name), "")
        if name in _R6_COHORT:
            return (2, _R6_COHORT.index(name), "")
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
