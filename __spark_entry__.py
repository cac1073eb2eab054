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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-11
# policy (VERDICT r10 'do this' #1/#8 — every query the adversarial-
# replica hardening changed must re-earn a fresh verdict; the flagship
# gets a guaranteed slot per ADVICE r10 #2):
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r11: every query whose plan, oracle, or shared kernel
#      changed in the 43-red adversarial adjudication (45 keys — this
#      round's budget is mostly fresh-verdict work by design);
#   2. the r6-latest cohort head (retire-priority — the merged ledger's
#      oldest verdicts after the r10 rotation); the tail rolls to r12.
_HEADLINE = (
    "training_set_flagship",
)
_NEW_IN_R11 = (
    # gap-filling grid clamps (operators/rolling.py — the r10 hang)
    "feature_resample_1h",
    "densify_daily_spine",
    # oracle json_valid guards (functions/scalar.py)
    "fn_json",
    "fn_map",
    # vector-validity contract (llm/similarity.py, llm/dedup.py)
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_ivf_quantized",
    "sim_range_search",
    "sim_mmr_diversify",
    "sample_hard_negatives",
    "dedup_embedding_cosine",
    # multimodal NULL/zero-norm/unicode hardening (llm/multimodal.py)
    "mm_embedding_norm",
    "mm_decode_stub",
    "mm_frame_sample",
    # text family NULL/empty hardening (llm/text.py)
    "text_stats",
    "text_quality_score",
    "text_fingerprint",
    "text_chunk_sliding",
    "text_tfidf_audit",
    # curation NULL hardening (llm/curation.py)
    "pack_sequences",
    "pack_sequences_audit",
    "pipeline_clean_corpus",
    "pipeline_incremental_curate",
    # NULL-key semantics (analytics/bloom/merge/lookup/graph/mlpath)
    "agg_heavy_hitters",
    "agg_countmin_sketch",
    "eval_auc_roc",
    "feature_importance",
    "graph_jaccard_neighbors",
    "merge_scd2_history",
    "training_set_point_in_time",
    "training_set_pit_on_demand",
    "training_set_on_demand",
    # stateful streaming NaN/NULL-key (streaming/windows.py)
    "stream_stateful_parity",
    # scan/string/UDF surfaces (operators/zorder.py, relational.py,
    # functions/scalar.py, sources/csv.py)
    "scan_csv_infer",
    "scan_text_lines",
    "scan_binary_files",
    "scan_csv_malformed_quarantine",
    "sink_zorder",
    "fn_string",
    "fn_url",
    "udf_scalar",
    "udtf_explode_tokens",
    "udtf_native_split",
    # versioned read narrow-catch (featurestore/versioned.py)
    "sink_vacuum_retention",
    # ragged-vector guard mirrored into the oracle (ADVICE r10 #5)
    "embed_gram_norms",
    # NULL-suppkey NOT-IN pin, caught by the zipf+adversarial combined
    # gate (skew x NULLs makes all-keyless groups materialize)
    "tpch_q16",
)
# r6-latest cohort remainder (retire-priority head; keys already in
# _NEW_IN_R11 are claimed by tier 1 first). training_set_flagship moved
# to _HEADLINE (ADVICE r10 #2).
_R6_COHORT = (
    "stream_late_data",
    "stream_sliding",
    "dedup_semantic_cluster",
    "cluster_kmeans",
    "embed_gram_matrix",
    "embed_quantize_int8",
    "graph_pagerank",
    "agg_bloom_filter",
    "agg_latency_bands",
    "join_asof",
    "join_dynamic_partition_pruning",
    "merge_scd1_upsert",
    "sink_partitioned_pruned",
    "sink_sorted_parquet",
    "split_hash_8020",
    "split_kfold",
    "win_streaks",
    "dq_benford_digits",
    "dq_expectations",
    "dq_outlier_zscore",
    "feature_drift_chi2",
    "text_bloom_decontaminate",
    "text_repetition_score",
    "scan_parquet",
    "scan_python_datasource",
    "udaf_grouped",
    "fn_date",
    "fn_date_extended",
    "fn_hash",
    "fn_regexp",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _NEW_IN_R11:
            return (1, _NEW_IN_R11.index(name), "")
        if name in _R6_COHORT:
            return (2, _R6_COHORT.index(name), "")
        return (3, 0, name)

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
