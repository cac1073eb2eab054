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
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-17
# policy (VERDICT r16 'do this' #1: retire the r11 cohort COMPLETELY +
# the r12 head; tier arithmetic COUNTED before writing this comment):
# 1 headline + 7 changed + 20 r11-age + 22 r12-age head = 50 slots
# exactly; the 14 remaining r12-age keys ride at positions 51+ in case
# the driver's budget stretches. Done-criterion (VERDICT r16 #1): after
# CORRECTNESS_r17 the merged ledger has NO verdict older than r12.
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r17, 7 keys: mm_image_dhash and dedup_image_dhash
#      (NEW: perceptual image fingerprints over real BMP decode +
#      Hamming-banded LSH star/CC clustering — VERDICT r16 #3),
#      mm_decode_jpeg_progressive (NEW: eighth codec, six-scan SOF2
#      successive approximation + spectral selection — VERDICT r16 #6),
#      text_bpe_learn_batched (NEW: window-conflict parallel-BPE
#      rounds — VERDICT r16 #2a), training_set_bpe_features (NEW:
#      tokenizer counts as a lookup feature table with on-demand
#      expressions — VERDICT r16 #7), sim_image_hamming_topk (NEW:
#      exact image kNN by dHash Hamming over the shared fingerprint
#      table), text_bpe_apply (CHANGED: reads
#      the FeatureStore-persisted merge table instead of re-running
#      learn inline — VERDICT r16 #2);
#   2. the COMPLETE r11-age cohort (20 keys, alphabetical — the exact
#      list VERDICT r16 #1 enumerates);
#   3. the r12-age head (22 of 36, alphabetical; the 14-key tail rides
#      at positions 51-64 and is the r18 tier-2 head otherwise).

_HEADLINE = (
    "training_set_flagship",
)
_CHANGED_TIER = (
    "mm_image_dhash",
    "dedup_image_dhash",
    "mm_decode_jpeg_progressive",
    "text_bpe_learn_batched",
    "training_set_bpe_features",
    "sim_image_hamming_topk",
    "text_bpe_apply",
)
# r11-age cohort, complete (merged-ledger verdicts last adjudicated r11)
_R11_COHORT = (
    "pipeline_clean_corpus",
    "pipeline_incremental_curate",
    "scan_csv_infer",
    "scan_csv_malformed_quarantine",
    "scan_text_lines",
    "sim_cosine_topk",
    "sim_range_search",
    "sink_vacuum_retention",
    "sink_zorder",
    "stream_stateful_parity",
    "text_chunk_sliding",
    "text_fingerprint",
    "text_quality_score",
    "text_stats",
    "tpch_q16",
    "training_set_on_demand",
    "training_set_pit_on_demand",
    "training_set_point_in_time",
    "udtf_explode_tokens",
    "udtf_native_split",
)
# r12-age head (alphabetical)
_R12_HEAD = (
    "agg_distinct",
    "agg_grouping_sets",
    "agg_histogram_equiwidth",
    "cluster_kmeans",
    "dedup_semantic_cluster",
    "dq_benford_digits",
    "dq_expectations",
    "dq_fk_orphans",
    "dq_outlier_zscore",
    "dq_pk_violations",
    "embed_gram_matrix",
    "feature_drift_chi2",
    "fn_date",
    "fn_date_extended",
    "fn_hash",
    "fn_regexp",
    "mm_embedding_norm",
    "pack_sequences_audit",
    "pipeline_dataset_mixture",
    "pipeline_gdpr_delete",
    "scan_binary_files",
    "scan_parquet",
)
# r12-age tail at positions 51-64: adjudicated only if the driver's
# budget stretches past 50; else the r18 tier-2 head
_R12_TAIL = (
    "scan_python_datasource",
    "set_except",
    "split_hash_8020",
    "split_kfold",
    "stream_dedup_exactly_once",
    "text_bloom_decontaminate",
    "text_repetition_score",
    "text_span_dedup",
    "udf_scalar",
    "win_first_touch_attribution",
    "win_forward_fill",
    "win_lag_lead",
    "win_session_paths",
    "win_streaks",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _CHANGED_TIER:
            return (1, _CHANGED_TIER.index(name), "")
        if name in _R11_COHORT:
            return (2, _R11_COHORT.index(name), "")
        if name in _R12_HEAD:
            return (3, _R12_HEAD.index(name), "")
        if name in _R12_TAIL:
            return (4, _R12_TAIL.index(name), "")
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
